package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** The prefix-filtered Jaccard variant must find exactly the same
  * pairs as the full count-join (prefix filtering is exact). */
class DedupVariantsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("prefix-filtered jaccard == full candidate jaccard") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("d1", "d2", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val full = pairs(Dedup.ngramJaccardPairs(docs, "text", 3, 0.5))
    val prefix = pairs(Dedup.ngramJaccardPairsPrefix(docs, "text", 3, 0.5))
    assert(full == prefix)
    assert(full.nonEmpty)
  }
}
