package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.sstable._

/** S6 split combining (reference `AegisthusCombinedInputFormat`):
  * many small sstables must bin-pack into few scan tasks (100 MB /
  * <= 200 members by default) without changing results, and a corrupt
  * member of a combined partition must lose only its own split. */
class SplitCombineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def writeFixture(dir: java.io.File, n: Int): Unit = {
    (1 to n).foreach { i =>
      val f = new java.io.DataOutputStream(new java.io.FileOutputStream(
        new java.io.File(dir, f"ks-cf-jb-$i-Data.db")))
      SSTableWriter.writeRow(f, CompactedRow(f"key$i%03d".getBytes, Long.MinValue,
        Seq(CellOut(SSTableFormat.KindColumn, "c".getBytes, s"v$i".getBytes, i.toLong,
          None, None, None))), SSTableVersion("jb"))
      f.close()
    }
  }

  test("small files pack into combined partitions; results identical") {
    val tmp = java.nio.file.Files.createTempDirectory("combine").toFile
    writeFixture(tmp, 20)

    val packed = GraftSSTable.readAtoms(spark, tmp.toString)
    assert(packed.rdd.getNumPartitions == 1, "20 tiny files must become one task")

    val capped = GraftSSTable.readAtoms(spark, tmp.toString, Map("combinemembers" -> "5"))
    assert(capped.rdd.getNumPartitions == 4, "member cap must split the bin")

    val unpacked = GraftSSTable.readAtoms(spark, tmp.toString, Map("combine" -> "false"))
    assert(unpacked.rdd.getNumPartitions == 20)

    // byte-size cap: each file is ~30 bytes, so a tiny combinesize
    // forces one member per bin
    val bySize = GraftSSTable.readAtoms(spark, tmp.toString, Map("combinesize" -> "1"))
    assert(bySize.rdd.getNumPartitions == 20)

    val a = packed.select("key", "value").collect().map(r =>
      (new String(r.getAs[Array[Byte]](0)), new String(r.getAs[Array[Byte]](1)))).toSet
    val b = unpacked.select("key", "value").collect().map(r =>
      (new String(r.getAs[Array[Byte]](0)), new String(r.getAs[Array[Byte]](1)))).toSet
    assert(a == b && a.size == 20, "packing must not change scan results")
  }

  test("corrupt member of a combined partition loses only its own split") {
    val tmp = java.nio.file.Files.createTempDirectory("combinecorrupt").toFile
    writeFixture(tmp, 10)
    // corrupt one file's header (the reference's deliberate-corruption
    // trick: leading 0x8080 makes the key length insane)
    val victim = new java.io.RandomAccessFile(new java.io.File(tmp, "ks-cf-jb-5-Data.db"), "rw")
    victim.write(Array(0x80.toByte, 0x80.toByte))
    victim.close()

    val atoms = GraftSSTable.readAtoms(spark, tmp.toString, Map("skipCorrupt" -> "true"))
    assert(atoms.rdd.getNumPartitions == 1, "all 10 files in one combined task")
    val keys = atoms.select("key").collect().map(r => new String(r.getAs[Array[Byte]](0))).toSet
    assert(keys == (1 to 10).filter(_ != 5).map(i => f"key$i%03d").toSet,
      "only the corrupt member's rows may be lost")
    GraftSSTable.assertCorruptFilesBelow(1)
  }
}
