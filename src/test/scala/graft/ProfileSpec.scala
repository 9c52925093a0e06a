package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Profile

/** Profiling semantics on a null-bearing fixture: null counting,
  * exact distinct (nulls excluded, per SQL count(DISTINCT)), min/max
  * ignoring nulls, all-null and single-value columns. */
class ProfileSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("profile: nulls, distinct, min/max on a hand fixture") {
    import spark.implicits._
    val df = Seq(
      (Some(3L), Some("b")),
      (Some(1L), None),
      (None, Some("a")),
      (Some(3L), Some("a")))
      .toDF("num", "txt")
    val got = Profile.profile(df, Seq("num", "txt"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))))
      .toMap
    assert(got("num") == ((4L, 1L, 2L, "1", "3")))
    assert(got("txt") == ((4L, 1L, 2L, "a", "b")))
  }

  test("profile: an all-null column yields zero distinct and null min/max") {
    import spark.implicits._
    val df = Seq.fill(3)(Option.empty[String]).toDF("c")
    val r = Profile.profile(df, Seq("c")).collect().head
    assert(r.getLong(1) == 3L && r.getLong(2) == 3L && r.getLong(3) == 0L)
    assert(r.isNullAt(4) && r.isNullAt(5))
  }
}
