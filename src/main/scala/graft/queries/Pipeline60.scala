package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Graph, Similarity}

/** Round-11 additions, part 25: directed-graph SCC over the
  * event-type transition graph, scalable PPS systematic sampling,
  * and a label-free geometric cluster-quality audit (silhouette).
  */
object Pipeline60 {

  def all: Seq[QueryDef] = Seq(c13, q74, s35)

  /** Strongly connected components ([[graft.operators.Graph.scc]])
    * of the DIRECTED event-type transition graph (edges = consecutive
    * types per user, (ts, event_id)-ordered — the e08 lead-window):
    * which parts of the product flow are mutually reachable loops vs
    * one-way funnels. The node domain is the TYPE vocabulary, so the
    * closure is O(T²) rows regardless of log size; the oracle replays
    * the closure with a recursive CTE and the identical reflexive
    * min-label definition. */
  val c13: QueryDef = QueryDef(
    "c13_scc",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val edges = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("s"))
        .withColumn("t", lead(col("s"), 1).over(w))
        .filter(col("t").isNotNull)
        .select(col("s"), col("t"))
      Graph.scc(edges, "s", "t").orderBy(col("node"))
    },
    Some("""WITH RECURSIVE ed AS MATERIALIZED (
        SELECT DISTINCT s, t FROM (
          SELECT event_type AS s,
            lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t
          FROM events) WHERE t IS NOT NULL),
      nodes AS (SELECT s AS n FROM ed UNION SELECT t FROM ed),
      reach(s, t) AS (
        SELECT n, n FROM nodes
        UNION
        SELECT r.s, e.t FROM reach r JOIN ed e ON r.t = e.s),
      mutual AS (SELECT r1.s, r1.t
                 FROM reach r1 JOIN reach r2 ON r1.s = r2.t AND r1.t = r2.s),
      lab AS (SELECT s AS node, min(t) AS scc_id FROM mutual GROUP BY 1)
      SELECT node, scc_id,
        CAST(count(*) OVER (PARTITION BY scc_id) AS BIGINT) AS scc_size
      FROM lab ORDER BY node"""))

  /** Systematic PPS sampling (probability proportional to size — the
    * survey-sampling classic): orders weighted by their exact cent
    * value, laid on a deterministic-hash-ordered line, one threshold
    * every `total/100` cents (offset step/2); a row is picked once
    * per threshold inside its weight interval, so heavy orders can
    * legitimately be picked more than once. All math is exact BIGINT
    * (shifted so every `div` operand is nonnegative — truncation and
    * floor agree, the documented Spark-vs-DuckDB `div` hazard).
    *
    * 100 TB shape: the global cumulative sum is NOT a single-partition
    * window — weights are bucketed by the top bits of the hash (the
    * order key), each bucket cumsums in parallel under a hash-
    * partitioned window, and the 256-row bucket-offset frame (cumsum
    * of bucket totals, broadcast back) shifts each bucket onto the
    * global line. The oracle computes the SAME numbers with one flat
    * window — the decomposition is algebraically the identity. */
  val q74: QueryDef = QueryDef(
    "q74_systematic_sample",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val base = Tables.orders(s, d).selectExpr("o_orderkey",
        "cast(round(o_totalprice * 100) as bigint) AS w_cents",
        "((o_orderkey % 2147483648L) * 2654435761L) % 2147483648L AS h")
        .withColumn("b", expr("h div 8388608"))
      val bw = base.groupBy(col("b")).agg(sum(col("w_cents")).as("bw"))
      val tot = bw.agg(sum(col("bw")).as("total_w"))
      val offsets = bw
        .withColumn("offset", coalesce(sum(col("bw")).over(
          Window.orderBy(col("b")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
        .select(col("b"), col("offset"))
      val wIn = Window.partitionBy(col("b")).orderBy(col("h"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      base
        .withColumn("cum_in", sum(col("w_cents")).over(wIn))
        .join(broadcast(offsets), Seq("b"))
        .crossJoin(broadcast(tot))
        .selectExpr("o_orderkey", "w_cents", "offset + cum_in AS cum",
          "greatest(total_w div 100L, 1L) AS step")
        .selectExpr("o_orderkey", "w_cents",
          "(cum + step - step div 2 - 1) div step " +
            "- (cum - w_cents + step - step div 2 - 1) div step AS n_picks")
        .filter(col("n_picks") >= 1)
        .orderBy(col("o_orderkey"))
    },
    Some("""WITH base AS (SELECT o_orderkey,
          CAST(round(o_totalprice * 100) AS BIGINT) AS w_cents,
          ((o_orderkey % 2147483648) * 2654435761) % 2147483648 AS h
        FROM orders),
      tot AS (SELECT CAST(sum(w_cents) AS BIGINT) AS total_w FROM base),
      cum AS (SELECT o_orderkey, w_cents,
          CAST(sum(w_cents) OVER (ORDER BY h, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        FROM base),
      st AS (SELECT greatest(total_w // 100, 1) AS step FROM tot)
      SELECT o_orderkey, w_cents,
        (cum + step - step // 2 - 1) // step
          - (cum - w_cents + step - step // 2 - 1) // step AS n_picks
      FROM cum, st
      WHERE (cum + step - step // 2 - 1) // step
          - (cum - w_cents + step - step // 2 - 1) // step >= 1
      ORDER BY o_orderkey"""))

  /** Centroid-based silhouette per cluster
    * ([[graft.operators.Similarity.silhouette]]) under the shared
    * fixed 16-centroid codebook: label-free cohesion-vs-separation,
    * (cos₁−cos₂)∕(1−cos₂) in exact micro units per vector, exact
    * BIGINT sums per cluster. The oracle replays the centroid
    * ranking, the pivot, and the identical IEEE op chain. */
  val s35: QueryDef = QueryDef(
    "s35_silhouette",
    (s, d) => Similarity.silhouette(Tables.embeddings(s, d), 16)
      .orderBy(col("cluster")),
    Some(s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
                        FROM embeddings),
      n AS (SELECT vec_id, v, ${DuckOps.norm2("v")} AS nrm FROM e),
      c AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n WHERE vec_id < 16),
      rk AS (SELECT vec_id, cid, cos,
               row_number() OVER (PARTITION BY vec_id
                 ORDER BY cos DESC, cid ASC) AS rn
             FROM (SELECT a.vec_id, c.cid,
                     ${DuckOps.dot("a.v", "c.cv")} / (sqrt(a.nrm) * sqrt(c.cn)) AS cos
                   FROM n a CROSS JOIN c)
             WHERE NOT isnan(cos)),
      piv AS (SELECT vec_id,
          max(CASE WHEN rn = 1 THEN cid END) AS cluster,
          max(CASE WHEN rn = 1 THEN cos END) AS cos1,
          max(CASE WHEN rn = 2 THEN cos END) AS cos2,
          count(*) AS nranks
        FROM rk WHERE rn <= 2 GROUP BY 1),
      sil AS (SELECT cluster,
          CAST(round(CASE WHEN 1.0 - cos2 = 0.0 THEN 0.0
            ELSE ((cos1 - cos2) / (1.0 - cos2)) * 1000000.0 END) AS BIGINT) AS sil_micro
        FROM piv WHERE nranks = 2)
      SELECT cluster, CAST(count(*) AS BIGINT) AS n_vectors,
        CAST(sum(sil_micro) AS BIGINT) AS sum_sil_micro,
        CAST(sum(sil_micro) AS BIGINT) // CAST(count(*) AS BIGINT) AS mean_sil_micro
      FROM sil GROUP BY cluster ORDER BY cluster"""))
}
