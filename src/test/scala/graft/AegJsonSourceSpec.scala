package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.scalatest.funsuite.AnyFunSuite
import graft.sstable.{AegCell, AegJsonCodec, AegRow}

/** The pruning aeg-JSON DSv2 source: parity with the hand codec on
  * the reference's own golden output, newline-aligned splits,
  * projection pushed into the parse, and F5 clean semantics. */
class AegJsonSourceSpec extends AnyFunSuite {
  private val goldenDir =
    "/root/reference/aegisthus-hadoop/src/test/resources/testdata/2.0.10/randomtable/aeg_json_output"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("reads the reference golden output; byte-range splits agree with whole-file read") {
    import spark.implicits._
    val df = GraftSSTable.readAegJson(spark, goldenDir, clean = false)
    val viaCodec = scala.io.Source.fromFile(s"$goldenDir/aeg-00000").getLines()
      .map(AegJsonCodec.parse).toList
    val viaSource = df.as[AegRow].collect().sortBy(_.key)
    assert(viaSource.toList == viaCodec.sortBy(_.key), "DSv2 rows must equal the codec parse")

    val split = spark.read.format("aegjson")
      .option("clean", "false").option("blocksize", "1024").load(goldenDir)
    assert(split.rdd.getNumPartitions > 1, "small blocksize must produce multiple splits")
    assert(split.as[AegRow].collect().sortBy(_.key).toList == viaCodec.sortBy(_.key),
      "split reads must lose/duplicate nothing at the boundaries")
  }

  test("projection is pushed into the parse (keys-only scan schema)") {
    val keysOnly = GraftSSTable.readAegJson(spark, goldenDir, clean = false).select("key")
    val scan = keysOnly.queryExecution.executedPlan.collect { case b: BatchScanExec => b }.head
    assert(scan.output.map(_.name) == Seq("key"), "scan must read only the key")
    assert(keysOnly.distinct().count() == 100)

    val header = GraftSSTable.readAegJson(spark, goldenDir, clean = false)
      .select("key", "deletedAt")
    val scan2 = header.queryExecution.executedPlan.collect { case b: BatchScanExec => b }.head
    assert(scan2.output.map(_.name).toSet == Set("key", "deletedAt"))
  }

  test("glob paths expand (parity with the old textFile-based reader)") {
    val viaGlob = GraftSSTable.readAegJson(spark, s"$goldenDir/aeg-*", clean = false)
    assert(viaGlob.count() == 100)
  }

  test("clean=true drops tombstoned/shadowed cells and empty rows (F5)") {
    val tmp = java.nio.file.Files.createTempDirectory("aegjson").toFile
    val rows = Seq(
      AegRow("aa", 100L, Seq(
        AegCell("c1", "v1", 200L, None, None, None, None), // live
        AegCell("c2", "v2", 50L, None, None, None, None), // shadowed by deletedAt
        AegCell("c3", "v3", 300L, Some("d"), None, None, None))), // tombstone
      AegRow("bb", 10L, Seq(
        AegCell("c1", "v1", 5L, None, None, None, None)))) // row left empty
    val w = new java.io.PrintWriter(new java.io.File(tmp, "aeg-00000"))
    rows.foreach(r => w.println(AegJsonCodec.serialize(r)))
    w.close()

    import spark.implicits._
    val cleaned = GraftSSTable.readAegJson(spark, tmp.toString).as[AegRow].collect()
    assert(cleaned.length == 1)
    assert(cleaned.head.key == "aa")
    assert(cleaned.head.columns.map(_.name) == Seq("c1"))

    val raw = GraftSSTable.readAegJson(spark, tmp.toString, clean = false).as[AegRow].collect()
    assert(raw.map(_.columns.size).sum == 4)
  }
}
