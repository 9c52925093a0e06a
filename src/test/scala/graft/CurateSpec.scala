package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Curate

/** [[graft.operators.Curate.pipeline]] stage semantics on a synthetic
  * corpus where every stage provably fires, plus the observe-metric
  * contract (per-stage attrition readable after one action). */
class CurateSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.functions.CassFunctions.registerAll(s)
    s
  }

  private def corpus() = {
    import spark.implicits._
    // source a: 6 docs, 2 exact dups of doc 0 (dedup fires), cap 4
    // (cap fires on the survivors), quality gate keeps top 3/4
    val a = Seq(
      (0L, "a", "alpha beta gamma delta epsilon"),
      (1L, "a", "alpha beta gamma delta epsilon"), // dup of 0
      (2L, "a", "alpha beta gamma delta epsilon"), // dup of 0
      (3L, "a", "one two three four"),
      (4L, "a", "one two"),
      (5L, "a", "one two three four five six"),
      (6L, "a", "solo"))
    // source b: 2 unique docs, under every threshold
    val b = Seq((10L, "b", "b one two three"), (11L, "b", "b four"))
    (a ++ b).toDF("doc_id", "source", "text")
  }

  test("every stage fires and ranks over the previous stage's survivors") {
    val out = Curate.pipeline(corpus(), domainCap = 4,
        keepNumerator = 3, keepDenominator = 4)
      .collect().map(r => r.getLong(0) -> r).toMap
    // dedup keeps doc 0, drops 1 and 2; cap=4 then keeps docs 0,3,4,5
    // (first four SURVIVORS by id — doc 6 only survives if ranked on
    // the post-dedup set, which is the stage-ordering claim) and drops
    // 6; gate keeps top 3 of 4 by tokens: 5 (6 tok), 0 (5), 3 (4)
    assert(out.keySet == Set(0L, 3L, 5L, 10L))
    // source b: 2 docs, gate keeps rk*4 <= 2*3 -> rk 1 only (10)
    assert(!out.contains(11L))
    // interleave keys are unique and positive
    val keys = out.values.map(_.getLong(3)).toSeq
    assert(keys.distinct.size == keys.size && keys.forall(_ >= 1))
  }

  test("observe metrics report per-stage attrition after one action") {
    val df = Curate.pipeline(corpus(), domainCap = 4,
      keepNumerator = 3, keepDenominator = 4)
    df.collect()
    val m = df.queryExecution.observedMetrics
      .map { case (k, row) => k -> row.getLong(0) }
    assert(m("curate_input") == 9L)
    assert(m("curate_dedup") == 7L, "two exact dups dropped")
    assert(m("curate_cap") == 6L, "domain cap dropped one doc from source a")
    assert(m("curate_gate") == 4L, "quartile gate kept 3 of 4 + 1 of 2")
  }

  test("hashSplit: in-memory hash replay, threshold partition, full coverage") {
    import spark.implicits._
    val ids = (0L until 200L)
    val out = Curate.hashSplit(ids.toDF("doc_id"), "doc_id", "s1", 800, 100)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    val P = 1000000007L
    def poly(s: String, m: Long) = s.foldLeft(0L)((a, c) => (a * m + c.toLong) % P)
    def bucket(id: Long) = {
      val h60 = poly(s"s1:$id", 31) * 1073741824L + poly(s"s1:$id", 131) % 1073741824L
      (((h60 % 2147483648L) * 2654435761L) % 2147483648L) % 1000L
    }
    ids.foreach { id =>
      val b = bucket(id)
      val expected = if (b < 800) "train" else if (b < 900) "val" else "test"
      assert(out(id) === ((b, expected)), s"id=$id")
    }
    assert(out.values.map(_._2).toSet === Set("train", "val", "test"),
      "200 ids at 80/10/10 must hit all three splits")
  }

  test("hashSplit: assignment is growth-stable (subset assignments never move) and salt-sensitive") {
    import spark.implicits._
    val all = Curate.hashSplit((0L until 100L).toDF("doc_id"), "doc_id", "s1", 800, 100)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val subset = Curate.hashSplit((0L until 50L).toDF("doc_id"), "doc_id", "s1", 800, 100)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(subset === all.view.filterKeys(_ < 50L).toMap,
      "an id's split must not depend on what else is in the corpus")
    val otherSalt = Curate.hashSplit((0L until 100L).toDF("doc_id"), "doc_id", "s2", 800, 100)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(otherSalt !== all, "a different salt must draw a different split")
  }

  test("hashSplit: guards and map-only plan") {
    import spark.implicits._
    val df = (0L until 10L).toDF("doc_id")
    intercept[IllegalArgumentException](Curate.hashSplit(df, "doc_id", "s", 900, 200))
    intercept[IllegalArgumentException](Curate.hashSplit(df, "doc_id", "it's", 800, 100))
    val plan = Curate.hashSplit(df, "doc_id", "s1", 800, 100)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"hashSplit must be a pure projection:\n$plan")
    assert(!plan.contains("ScalaUDF"), s"hashSplit stays native/codegen:\n$plan")
  }
}
