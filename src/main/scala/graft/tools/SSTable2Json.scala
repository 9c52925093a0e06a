package graft.tools

import org.apache.spark.sql.SparkSession
import graft.GraftSSTable

/** CLI analog of the reference's `scripts/sstable2json` wrapper
  * (`/root/reference/scripts/sstable2json:1-3`) plus the main job's
  * `-produceSSTable` mode: compacts a directory of Cassandra SSTables
  * into aeg-JSON files, or into a new compacted SSTable.
  *
  * Usage: SSTable2Json <inputDir> <outputDir> [blocksize] [maxCorrupt]
  *          [sstable:<ver>] [cqlfile:<path>] [schemafile:<path>]
  *          [columntype:<marshal>] [keytype:<marshal>] [compress] [avro]
  *
  * `schemafile:`/`columntype:`/`keytype:` configure the marshal types
  * (the reference's `-cql`/`aegisthus.columntype`/`keytype` options):
  * the comparator drives the distributed sort+merge and the rendered
  * aeg-JSON names. `compress` writes chunked-LZ4 sstables. */
object SSTable2Json {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: SSTable2Json <inputDir> <outputDir> [blocksize] [maxCorrupt] [sstable:<ver>] " +
        "[cqlfile:<path>] [schemafile:<path>] [columntype:<marshal>] [keytype:<marshal>] [compress]")
    val input = args(0)
    val output = args(1)
    // digit-gated like maxCorrupt: a colon-free flag word (`compress`)
    // in position 2 must not be parsed as a blocksize
    val blocksize = if (args.length > 2 && args(2).nonEmpty && args(2).forall(_.isDigit)) args(2)
      else (64L * 1024 * 1024).toString
    val maxCorrupt = if (args.length > 3 && args(3).forall(_.isDigit)) args(3).toLong else 0L
    def opt(prefix: String): Option[String] =
      args.find(_.startsWith(prefix + ":")).map(_.stripPrefix(prefix + ":"))
    val produceSSTable = opt("sstable")
    // CQL pivot export (reference org.coursera.SSTableExport analog,
    // but columnar parquet instead of Avro): cqlfile:<path to CREATE TABLE>
    val cqlFile = opt("cqlfile")
    // `compress` = chunked LZ4; `compress:snappy` / `compress:deflate`
    // select the other Cassandra codecs
    val compressArg = args.find(a => a == "compress" || a.startsWith("compress:"))
    val compress = compressArg.isDefined
    val codec = compressArg.filter(_.contains(":")).map(_.split(":")(1).toLowerCase match {
      case "snappy" => "SnappyCompressor"
      case "deflate" => "DeflateCompressor"
      case _ => "LZ4Compressor"
    }).getOrElse("LZ4Compressor")

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
      .appName("sstable2json")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val typeOpts = Seq(
        opt("schemafile").map(p => "cql" ->
          new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)))),
        opt("columntype").map("columnType" -> _),
        opt("keytype").map("keyType" -> _)).flatten.toMap
      val atoms = GraftSSTable.readAtoms(spark, input,
        Map("blocksize" -> blocksize, "skipCorrupt" -> (maxCorrupt > 0).toString) ++ typeOpts)
      val compacted = GraftSSTable.compact(atoms) // comparator from scan config
      val keyType = GraftSSTable.configuredKeyType(atoms).map(_.typeName).getOrElse("BytesType")
      val nameType = GraftSSTable.configuredColumnType(atoms).map(_.typeName).getOrElse("BytesType")
      (produceSSTable, cqlFile) match {
        case (_, Some(cf)) =>
          val cql = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(cf)))
          val df = GraftSSTable.pivotToRelational(compacted, cql)
          if (args.contains("avro")) {
            GraftSSTable.writeAvro(df, output)
            println(s"sstable2json: wrote relational avro to $output (${df.columns.mkString(",")})")
          } else {
            df.write.mode("overwrite").parquet(output)
            println(s"sstable2json: wrote relational parquet to $output (${df.columns.mkString(",")})")
          }
        case (Some(ver), _) =>
          GraftSSTable.writeSSTable(compacted, output, ver, compress = compress, codec = codec)
          println(s"sstable2json: wrote $output/keyspace-dataset-$ver-0000000000-Data.db")
        case (None, None) =>
          GraftSSTable.writeAegJson(compacted, output, numFiles = 1,
            keyType = keyType, nameType = nameType)
          println(s"sstable2json: wrote $output/aeg-00000")
      }
      GraftSSTable.assertCorruptFilesBelow(maxCorrupt)
    } finally spark.stop()
  }
}
