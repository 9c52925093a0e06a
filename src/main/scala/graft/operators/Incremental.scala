package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the production pattern where a
  * standing rollup absorbs each new data slice WITHOUT rescanning
  * history. Correctness rests on the algebraic-aggregate contract:
  * count/sum merge by sum, min by min, max by max — so a rollup of
  * rollups equals the rollup of the union, which is exactly what the
  * q43 oracle (a single-pass aggregate over everything) hash-checks.
  *
  * Only ALGEBRAIC aggregates ride this path; holistic ones (exact
  * distinct counts, exact percentiles) need their full input or a
  * mergeable sketch (see q37's approx sketches) — callers wanting
  * those incrementally should carry the sketch in the state frame.
  *
  * 100 TB shape: each slice's state is a partially-aggregated
  * O(keys)-row frame; the merge is a union of state frames + ONE
  * partial-agg shuffle over state rows (never the raw history). A
  * day's merge touches |keys| rows no matter how big the archive is.
  */
object Incremental {

  private val StateCols = Seq("n", "cents", "min_cents", "max_cents")

  /** One slice's (day, event_type) rollup state from raw events:
    * exact count, cent sum, cent min/max. One partial-agg shuffle. */
  def dailyTypeState(events: DataFrame, typeCol: String, tsCol: String,
      valueCol: String): DataFrame =
    events
      .selectExpr(s"cast(to_date($tsCol) as string) AS day", s"$typeCol AS event_type",
        s"cast(round($valueCol * 100) as long) AS cents")
      .groupBy(col("day"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"),
        min(col("cents")).as("min_cents"), max(col("cents")).as("max_cents"))

  /** Incremental DISTINCT via mergeable sketches — the holistic
    * aggregate the algebraic path above explicitly excludes: per-day
    * HLL sketches of the user set (Spark's built-in DataSketches HLL,
    * `hll_sketch_agg`) merged up to week grain with `hll_union_agg`,
    * then audited IN THE SAME PLAN against the exact weekly distinct:
    * the output carries (week, exact_users, within_bound) where
    * `within_bound` checks the merged estimate against the exact count
    * at ±5% (or ±1 absolutely) — the q37 sketch-invariant discipline:
    * the hash gate pins the exact counts and the bound verdict, never
    * the implementation-specific raw estimate.
    *
    * 100 TB shape: daily states are O(days) sketch rows (the frame a
    * production pipeline would persist and roll forward); the weekly
    * merge touches sketches only; the exact audit is the only pass
    * over raw history and exists purely as the correctness gate. */
  def sketchDistinctRollup(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val daily = events
      .selectExpr(s"to_date($tsCol) AS d", s"$userCol AS u")
      .groupBy(col("d"))
      .agg(expr("hll_sketch_agg(u)").as("sk"))
    val weekly = daily
      .selectExpr("cast(date_trunc('week', d) as date) AS week", "sk")
      .groupBy(col("week"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
    val exact = events
      .selectExpr(s"cast(date_trunc('week', to_date($tsCol)) as date) AS week",
        s"$userCol AS u")
      .groupBy(col("week"))
      .agg(countDistinct(col("u")).as("exact_users"))
    weekly.join(exact, Seq("week"))
      .selectExpr("cast(week as string) AS week", "exact_users",
        "abs(est - exact_users) <= greatest(1L, cast(exact_users * 0.05 as bigint)) AS within_bound")
  }

  /** Merge per-key partial states (each shaped like [[dailyTypeState]]'s
    * output) into the combined rollup: union + ONE re-aggregation with
    * the merge function of each algebraic aggregate. */
  def mergeStates(states: Seq[DataFrame], keys: Seq[String]): DataFrame = {
    require(states.nonEmpty, "mergeStates needs at least one state frame")
    require(keys.nonEmpty, "mergeStates needs at least one key column")
    states.foreach { s =>
      val missing = (keys ++ StateCols).filterNot(s.columns.contains)
      require(missing.isEmpty, s"state frame lacks columns $missing")
    }
    states.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"), sum(col("cents")).as("cents"),
        min(col("min_cents")).as("min_cents"), max(col("max_cents")).as("max_cents"))
  }
}
