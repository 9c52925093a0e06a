package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Round-11 additions, part 48: relational duplicate-billing audit
  * and per-transition median handoff latency (the grouped-median
  * machinery composed over the transition universe).
  */
object Pipeline83 {

  def all: Seq[QueryDef] = Seq(q90, e42)

  /** Duplicate-billing audit: orders sharing (customer, exact cent
    * value, order date) — the relational face of dedup (d01 is the
    * text face): group sizes, the duplicated-order count (group size
    * minus the one legitimate copy), the largest clique, and the
    * duplicated share in micro units. One composite-key partial agg,
    * two 1-row folds.
    *
    * 100 TB shape: a single hash agg on a high-cardinality composite
    * key — the canonical map-side-combine shape; nothing after it
    * scales with the table. */
  val q90: QueryDef = QueryDef(
    "q90_duplicate_orders",
    (s, d) => {
      val g = Tables.orders(s, d)
        .selectExpr("o_custkey",
          "cast(round(o_totalprice * 100) as bigint) AS c",
          "cast(o_orderdate as date) AS day")
        .groupBy(col("o_custkey"), col("c"), col("day"))
        .agg(count(lit(1)).as("sz"))
      val dup = g.filter(col("sz") > 1)
        .agg(count(lit(1)).as("n_dup_groups"),
          coalesce(sum(col("sz") - 1), lit(0L)).as("n_dup_orders"),
          coalesce(max(col("sz")), lit(0L)).as("max_group"))
      val tot = g.agg(sum(col("sz")).as("n_orders"))
      tot.crossJoin(broadcast(dup))
        .selectExpr("n_orders", "n_dup_groups", "n_dup_orders", "max_group",
          "cast((cast(n_dup_orders as decimal(38,0)) * 1000000) div n_orders" +
            " as bigint) AS dup_micro")
    },
    Some("""WITH g AS (SELECT o_custkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS c,
               CAST(o_orderdate AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS sz
             FROM orders GROUP BY 1, 2, 3),
      dup AS (SELECT CAST(count(*) AS BIGINT) AS n_dup_groups,
                CAST(COALESCE(sum(sz - 1), 0) AS BIGINT) AS n_dup_orders,
                CAST(COALESCE(max(sz), 0) AS BIGINT) AS max_group
              FROM g WHERE sz > 1),
      tot AS (SELECT CAST(sum(sz) AS BIGINT) AS n_orders FROM g)
      SELECT n_orders, n_dup_groups, n_dup_orders, max_group,
        CAST((CAST(n_dup_orders AS HUGEINT) * 1000000) // n_orders AS BIGINT)
          AS dup_micro
      FROM tot, dup"""))

  /** Median handoff latency per event-type transition: for each
    * consecutive (from → to) pair per user, the exact lower-median
    * gap in whole seconds — e08's transition counts upgraded with the
    * latency that says whether a hop is a reflex or a day later.
    * Rides [[Pipeline81.groupedMedian]] with the transition pair as
    * the group key, so every median comes from the grouped bucketed
    * rank lookup (no per-group sort).
    *
    * 100 TB shape: one user-partitioned lead window, one
    * (pair, gap)-keyed partial agg, grouped bucketed windows over the
    * collapsed frame — the q88 discipline on a vocabulary² group
    * domain. */
  val e42: QueryDef = QueryDef(
    "e42_handoff_latency",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val pairs = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("a"))
        .withColumn("b", lead(col("a"), 1).over(w))
        .withColumn("nxt", lead(col("ts"), 1).over(w))
        .filter(col("b").isNotNull)
        .selectExpr("concat(a, '|', b) AS g",
          "(unix_micros(nxt) - unix_micros(ts)) div 1000000 AS c")
      val med = Pipeline81.groupedMedian(pairs)
      pairs.groupBy(col("g")).agg(count(lit(1)).as("n_hops"))
        .join(med, Seq("g"))
        .selectExpr("split(g, '[|]')[0] AS from_type",
          "split(g, '[|]')[1] AS to_type", "n_hops",
          "med AS median_gap_s")
        .orderBy(col("from_type"), col("to_type"))
    },
    Some("""WITH e AS (SELECT user_id, ts, event_id, event_type AS a,
               lead(event_type) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS b,
               lead(ts) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS nxt
             FROM events),
      p AS (SELECT a, b, epoch_us(nxt - ts) // 1000000 AS c
            FROM e WHERE b IS NOT NULL),
      g1 AS (SELECT a, b, c, CAST(count(*) AS BIGINT) AS cnt
             FROM p GROUP BY 1, 2, 3),
      med AS (SELECT a, b, c AS med FROM (
          SELECT a, b, c, cnt,
            COALESCE(CAST(sum(cnt) OVER (PARTITION BY a, b ORDER BY c
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
              AS before,
            CAST(sum(cnt) OVER (PARTITION BY a, b) AS BIGINT) AS n
          FROM g1)
        WHERE before < (n + 1) // 2 AND before + cnt >= (n + 1) // 2),
      cn AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n_hops
             FROM p GROUP BY 1, 2)
      SELECT cn.a AS from_type, cn.b AS to_type, cn.n_hops, med.med
        AS median_gap_s
      FROM cn JOIN med ON cn.a = med.a AND cn.b = med.b
      ORDER BY from_type, to_type"""))
}
