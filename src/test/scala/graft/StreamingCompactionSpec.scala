package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.sstable.{AtomRec, CassType}
import graft.streaming.StreamingCompaction

/** Streaming compaction parity: the incremental state machine must
  * agree with the batch merge on the reference fixtures (RT-free
  * corpus), and be order-insensitive (associativity check). */
class StreamingCompactionSpec extends AnyFunSuite {
  private val testRoot = "/root/reference/aegisthus-hadoop/src/test/resources/testdata"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("incremental compaction (streaming engine) matches batch merge") {
    import spark.implicits._
    // CQL list overwrites emit range tombstones even in randomtable —
    // incremental compaction refuses RTs by design (the reference
    // documents they need batch completeness), so parity is checked on
    // the RT-free cell stream for both sides
    val atomsDf = GraftSSTable.readAtoms(spark, s"$testRoot/2.0.10/randomtable/input")
      .filter("kind != 'rt'")
    val atoms = atomsDf.select("key", "source", "rowDeletedAt", "kind", "name", "value",
      "ts", "ttl", "localDeletionTime", "tsOfLastDelete", "rtMax").as[AtomRec]

    // drive through the actual streaming engine: stage atoms as
    // parquet, readStream, run mapGroupsWithState, memory sink
    val tmp = java.nio.file.Files.createTempDirectory("atoms").toString
    atoms.write.mode("overwrite").parquet(tmp)
    val stream = spark.readStream.schema(atoms.schema).parquet(tmp).as[AtomRec]
    val q = StreamingCompaction.compactIncremental(stream)
      .writeStream.outputMode("update").format("memory").queryName("inc_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT keyHex, max(deletedAt) AS da, CAST(max(nLiveColumns) AS BIGINT) AS nc FROM inc_out GROUP BY keyHex")
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

      val batch = GraftSSTable.compact(atomsDf, numPartitions = 4).collect()
        .map(r => CassType.hex(r.key) -> (r.deletedAt, r.columns.size.toLong)).toMap

      assert(streamed.keySet == batch.keySet)
      batch.foreach { case (k, (da, nc)) =>
        assert(streamed(k) == ((da, nc)), s"key $k: streamed=${streamed(k)} batch=($da,$nc)")
      }
    } finally q.stop()
  }

  test("merge is associative: split input arbitrarily, same state") {
    import spark.implicits._
    val atoms = GraftSSTable.readAtoms(spark, s"$testRoot/1.2.18/randomtable/input")
      .filter("kind != 'rt'")
      .select("key", "source", "rowDeletedAt", "kind", "name", "value",
        "ts", "ttl", "localDeletionTime", "tsOfLastDelete", "rtMax")
      .as[AtomRec].collect().toSeq
    val byKey = atoms.groupBy(a => CassType.hex(a.key))
    byKey.foreach { case (_, as) =>
      val all = StreamingCompaction.mergeAtoms(
        StreamingCompaction.RowState(Long.MinValue, Map.empty), as.iterator)
      Seq(1, 3, 7).foreach { chunk =>
        val stepped = as.grouped(chunk).foldLeft(
          StreamingCompaction.RowState(Long.MinValue, Map.empty)) {
          (st, batch) => StreamingCompaction.mergeAtoms(st, batch.iterator)
        }
        assert(stepped == all)
      }
    }
  }
}
