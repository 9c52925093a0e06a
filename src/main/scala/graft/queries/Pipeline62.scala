package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Graph

/** Round-11 additions, part 27: harmonic centrality (the closeness
  * family) on the event-type graph, and the running-peak drawdown
  * analytic over the daily revenue series.
  */
object Pipeline62 {

  def all: Seq[QueryDef] = Seq(c14, q75)

  /** Harmonic centrality
    * ([[graft.operators.Graph.harmonicCentrality]]) of the directed
    * event-type transition graph — which states of the product flow
    * sit closest (in hops) to everything else, the closeness-family
    * complement to c02's flow-mass PageRank. Distances from the
    * frontier BFS; each reachable target contributes
    * `1e6 div d(s,t)` micro-units, exact integers both sides. The
    * oracle replays shortest paths with a depth-capped recursive
    * walk + min(d), then the identical floored-harmonic sum. The
    * node list dedups via an explicit DISTINCT over UNION ALL: a
    * plain UNION's implicit dedup is NOT applied reliably to
    * non-recursive CTEs inside a `WITH RECURSIVE` block (observed
    * 8x row duplication in DuckDB 1.0 — c13's oracle only escapes
    * because its duplicates feed a dedup-ing recursive union). */
  val c14: QueryDef = QueryDef(
    "c14_harmonic_centrality",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val edges = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("s"))
        .withColumn("t", lead(col("s"), 1).over(w))
        .filter(col("t").isNotNull)
        .select(col("s"), col("t"))
      Graph.harmonicCentrality(edges, "s", "t").orderBy(col("node"))
    },
    Some("""WITH RECURSIVE ed AS MATERIALIZED (
        SELECT DISTINCT s, t FROM (
          SELECT event_type AS s,
            lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t
          FROM events) WHERE t IS NOT NULL AND s <> t),
      nodes AS (SELECT DISTINCT n FROM
        (SELECT s AS n FROM ed UNION ALL SELECT t AS n FROM ed)),
      walk(s, t, d) AS (
        SELECT s, t, 1 FROM ed
        UNION
        SELECT w.s, e.t, w.d + 1 FROM walk w JOIN ed e ON w.t = e.s
        WHERE w.s <> e.t AND w.d < 50),
      sp AS (SELECT s, t, min(d) AS d FROM walk GROUP BY 1, 2)
      SELECT n.n AS node,
        CAST(COALESCE(sum(1000000 // sp.d), 0) AS BIGINT) AS harmonic_micro,
        CAST(count(sp.d) AS BIGINT) AS n_reachable
      FROM nodes n LEFT JOIN sp ON n.n = sp.s
      GROUP BY 1 ORDER BY 1"""))

  /** Running-peak drawdown of the daily revenue series — the
    * classic "how far below the best day so far" risk analytic
    * (peak, per-day drawdown, and the running MAX drawdown), in
    * exact cents end to end. The windows run over the per-day
    * AGGREGATE frame (date-domain-sized — thousands of rows at any
    * corpus scale), never the order table: the one log-sized pass is
    * the groupBy, a single partial-agg shuffle. */
  val q75: QueryDef = QueryDef(
    "q75_max_drawdown",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.orders(s, d)
        .groupBy(col("o_orderdate"))
        .agg(sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("cents"))
        .selectExpr("cast(o_orderdate as string) AS day", "cents")
      val w = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily
        .withColumn("peak_cents", max(col("cents")).over(w))
        .withColumn("drawdown_cents", col("peak_cents") - col("cents"))
        .withColumn("max_drawdown_cents", max(col("drawdown_cents")).over(w))
        .orderBy(col("day"))
    },
    Some("""WITH daily AS (SELECT CAST(o_orderdate AS VARCHAR) AS day,
          CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM orders GROUP BY 1),
      r AS (SELECT day, cents,
          CAST(max(cents) OVER (ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS peak_cents
        FROM daily)
      SELECT day, cents, peak_cents,
        peak_cents - cents AS drawdown_cents,
        CAST(max(peak_cents - cents) OVER (ORDER BY day
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS max_drawdown_cents
      FROM r ORDER BY day"""))
}
