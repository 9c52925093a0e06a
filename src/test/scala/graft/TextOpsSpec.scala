package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextOps

/** Lexical-diversity operator boundaries: the empty-doc guard (Spark's
  * sequence(1, 0) is [1, 0] descending — unguarded, its j = 0 element
  * throws INVALID_INDEX_OF_ZERO under ANSI element_at), all-hapax,
  * no-hapax, and single-token cases.
  */
class TextOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.functions.CassFunctions.registerAll(s)
    s
  }

  private def div(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    TextOps.lexicalDiversity(docs.toDF("doc_id", "text"), "text")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
  }

  test("empty and punctuation-only docs yield all-zero counts, not a crash") {
    val out = div(Seq(0L -> "", 1L -> "?!... --- ;;;", 2L -> "real words here"))
    assert(out(0L) == ((0L, 0L, 0L, 0L, 0L)))
    assert(out(1L) == ((0L, 0L, 0L, 0L, 0L)))
    assert(out(2L) == ((3L, 3L, 3L, 1000000L, 1000000L)))
  }

  test("run-boundary counting: types and hapaxes") {
    // sorted tokens: [a, a, b, c, c, c, d] -> 4 types, hapax {b, d}
    val out = div(Seq(0L -> "c a b c d a c"))
    assert(out(0L) == ((7L, 4L, 2L, 571428L, 500000L)))
  }

  test("single token is one type and one hapax") {
    val out = div(Seq(0L -> "solo"))
    assert(out(0L) == ((1L, 1L, 1L, 1000000L, 1000000L)))
  }

  test("no hapax when every type repeats") {
    val out = div(Seq(0L -> "x y x y"))
    assert(out(0L) == ((4L, 2L, 0L, 500000L, 0L)))
  }
}
