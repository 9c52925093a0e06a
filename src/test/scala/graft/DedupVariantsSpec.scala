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

  test("containment finds doc-inside-doc pairs that Jaccard misses") {
    import spark.implicits._
    // doc 2 is a verbatim quote of doc 1 inside a much longer doc:
    // containment(quote) = 1.0, but the union is dominated by the
    // host so Jaccard is far below any useful threshold
    val host = (1 to 40).map(i => s"w$i").mkString(" ")
    val quote = (1 to 6).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, s"$host unique tail terms"), (2L, quote))
      .toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(docs, "text", 3, 0.9)
      .select("d1", "d2", "containment").collect()
    assert(cont.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    assert(cont.head.getDouble(2) == 1.0)
    val jac = Dedup.ngramJaccardPairs(docs, "text", 3, 0.5).collect()
    assert(jac.isEmpty, "symmetric Jaccard must NOT flag the inclusion pair")
  }

  test("containment >= jaccard on every shared candidate pair; capped == uncapped off the hot set") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val capped = Dedup.containmentPairs(docs, "text", 3, 0.6, maxDocFreq = 64)
      .select("d1", "d2", "shared", "n1", "n2", "containment").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    assert(capped.nonEmpty)
    capped.foreach { case (_, (shared, n1, n2, c)) =>
      val jaccard = shared.toDouble / (n1 + n2 - shared).toDouble
      assert(c >= jaccard && c <= 1.0)
      assert(c == shared.toDouble / math.min(n1, n2).toDouble)
    }
    // the uncapped exact-recall path agrees wherever the cap kept the pair
    val uncapped = Dedup.containmentPairs(docs, "text", 3, 0.6)
      .select("d1", "d2", "containment").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    capped.foreach { case (k, (_, _, _, c)) =>
      assert(uncapped(k) == c, s"pair $k differs between capped and exact paths")
    }
  }
}
