package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Round-10 additions, part 14: NULL-semantics suite (null-safe
  * joins + null groups), the dedup-replay face of the streaming
  * deduper, and day-of-week seasonality.
  */
object Pipeline24 {

  def all: Seq[QueryDef] = Seq(q54, st05, e23)

  /** NULL-semantics suite: a deterministically NULLed dimension key
    * (every 7th order) grouped THROUGH a null-safe equi-join (`<=>`
    * / `IS NOT DISTINCT FROM`) — the null group survives the join and
    * lands in its own '(none)' bucket; count(col) vs count(*)
    * difference rides along. The dim side is tiny → broadcast. */
  val q54: QueryDef = QueryDef(
    "q54_null_semantics",
    (s, d) => {
      val base = Tables.orders(s, d).selectExpr(
        "if(o_orderkey % 7 = 0, cast(null as string), o_orderpriority) AS seg",
        "cast(round(o_totalprice * 100) as long) AS cents")
      val dim = base.select(col("seg")).distinct()
        .selectExpr("seg AS dseg", "coalesce(seg, '(none)') AS label")
      base.join(broadcast(dim), col("seg") <=> col("dseg"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_orders"), count(col("seg")).as("n_nonnull"),
          sum(col("cents")).as("cents"))
        .orderBy(col("label"))
    },
    Some("""WITH base AS (SELECT
               CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderpriority END AS seg,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
             FROM orders),
      dim AS (SELECT seg AS dseg, COALESCE(seg, '(none)') AS label
              FROM (SELECT DISTINCT seg FROM base))
      SELECT dim.label, CAST(count(*) AS BIGINT) AS n_orders,
        CAST(count(base.seg) AS BIGINT) AS n_nonnull,
        CAST(sum(base.cents) AS BIGINT) AS cents
      FROM base JOIN dim ON base.seg IS NOT DISTINCT FROM dim.dseg
      GROUP BY 1 ORDER BY 1"""))

  /** Dedup replay — the batch face of the streaming event deduper:
    * every 3rd event re-arrives (the at-least-once delivery model),
    * `dropDuplicates(event_id)` collapses the replay, and the per-type
    * aggregate must equal the clean log exactly while the input count
    * shows the inflation. Streaming face: the same dropDuplicates
    * under a watermark ([[graft.streaming.EventStreams.dedupStream]],
    * spec-proven); the oracle derives both counts from the clean
    * table. */
  val st05: QueryDef = QueryDef(
    "st05_dedup_replay",
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("event_type"),
          expr("cast(round(value * 100) as long)").as("cents"))
      val replayed = ev.unionByName(ev.filter(col("event_id") % 3 === 0))
      val input = replayed.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_input"))
      replayed.dropDuplicates("event_id")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("cents"))
        .join(broadcast(input), Seq("event_type"))
        .select(col("event_type"), col("n_input"), col("n_events"), col("cents"))
        .orderBy(col("event_type"))
    },
    Some("""SELECT event_type,
        CAST(count(*) + sum(CASE WHEN event_id % 3 = 0 THEN 1 ELSE 0 END)
          AS BIGINT) AS n_input,
        CAST(count(*) AS BIGINT) AS n_events,
        CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1 ORDER BY 1"""))

  /** Day-of-week seasonality: per (Monday-based dow, type) the event
    * count and its micro share WITHIN the type — dow from pure
    * epoch-day arithmetic (never an engine dow() with a different
    * week-start convention). Window over the ≤7×T grid. */
  val e23: QueryDef = QueryDef(
    "e23_dow_profile",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val g = Tables.events(s, d)
        .selectExpr("event_type",
          "pmod(datediff(to_date(ts), to_date('1970-01-05')), 7) AS dow")
        .groupBy(col("event_type"), col("dow"))
        .agg(count(lit(1)).as("n"))
      g.withColumn("type_total",
          sum(col("n")).over(Window.partitionBy(col("event_type"))))
        .selectExpr("event_type", "cast(dow as bigint) AS dow", "n",
          "(n * 1000000) div type_total AS share_micro")
        .orderBy(col("event_type"), col("dow"))
    },
    Some("""WITH g AS (SELECT event_type,
               (CAST(ts AS DATE) - DATE '1970-01-05') % 7 AS dow,
               CAST(count(*) AS BIGINT) AS n
             FROM events GROUP BY 1, 2)
      SELECT event_type, CAST(dow AS BIGINT) AS dow, n,
        (n * 1000000) // CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT)
          AS share_micro
      FROM g ORDER BY event_type, dow"""))
}
