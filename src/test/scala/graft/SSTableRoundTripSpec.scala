package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.sstable.CassType

/** Write-path correctness proven via the read path (reference
  * round-trip test, AegisthusIntegrationTest.groovy:198-227): compact
  * fixtures → write a NEW sstable in an older target version → feed it
  * back through the pipeline → aeg-JSON must still byte-match the
  * golden file. */
class SSTableRoundTripSpec extends AnyFunSuite {
  private val testRoot = "/root/reference/aegisthus-hadoop/src/test/resources/testdata"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def goldenLines(caseDir: String): Seq[String] = {
    val src = scala.io.Source.fromFile(s"$testRoot/$caseDir/aeg_json_output/aeg-00000")
    try src.getLines().toList finally src.close()
  }

  private val cases = Seq(
    ("1.2.18/randomtable", "ic"),
    ("1.2.18/rangetombstone", "ic"),
    ("2.0.10/randomtable", "jb"),
    ("2.0.10/rangetombstone", "jb"),
    ("2.2.4/randomtable", "jb"),
    ("2.2.4/rangetombstone", "jb"))

  cases.foreach { case (caseDir, outVersion) =>
    test(s"round-trip $caseDir via $outVersion sstable") {
      val tmp = java.nio.file.Files.createTempDirectory("rt").toString
      val atoms = GraftSSTable.readAtoms(spark, s"$testRoot/$caseDir/input",
        Map("skipCorrupt" -> "true"))
      val compacted = GraftSSTable.compact(atoms, numPartitions = 4)
      GraftSSTable.writeSSTable(compacted, tmp, outVersion)

      val atoms2 = GraftSSTable.readAtoms(spark, tmp)
      val compacted2 = GraftSSTable.compact(atoms2, numPartitions = 4)
      val actual = GraftSSTable.aegJsonLines(compacted2).collect()
        .sortWith((a, b) => CassType.unsignedCompare(a._1, b._1) < 0).map(_._2).toSeq
      val expected = goldenLines(caseDir)
      assert(actual.size == expected.size)
      actual.zip(expected).foreach { case (a, e) => assert(a == e) }
    }
  }

  test("round-trip via chunked-LZ4 COMPRESSED sstable (write surface, tiny chunks force splits)") {
    val caseDir = "2.0.10/randomtable"
    val tmp = java.nio.file.Files.createTempDirectory("rtc").toString
    val atoms = GraftSSTable.readAtoms(spark, s"$testRoot/$caseDir/input",
      Map("skipCorrupt" -> "true"))
    val compacted = GraftSSTable.compact(atoms, numPartitions = 4)
    // 1 KiB chunks: many chunks per file, exercises chunk boundaries
    GraftSSTable.writeSSTable(compacted, tmp, "jb", compress = true, chunkLength = 1024)

    assert(new java.io.File(tmp).listFiles().map(_.getName).exists(_.endsWith("-CompressionInfo.db")),
      "must write the CompressionInfo sidecar")
    val atoms2 = GraftSSTable.readAtoms(spark, tmp)
    val compacted2 = GraftSSTable.compact(atoms2, numPartitions = 4)
    val actual = GraftSSTable.aegJsonLines(compacted2).collect()
      .sortWith((a, b) => CassType.unsignedCompare(a._1, b._1) < 0).map(_._2).toSeq
    val expected = goldenLines(caseDir)
    assert(actual.size == expected.size)
    actual.zip(expected).foreach { case (a, e) => assert(a == e) }
  }
}
