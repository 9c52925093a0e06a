package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Similarity
import graft.streaming.EventStreams

/** Round-10 additions, part 9: unpivot (the inverse of q18's pivot),
  * revenue Pareto concentration, k-means cluster purity, and the
  * exact batch face of the sliding-window actives grid.
  */
object Pipeline19 {

  def all: Seq[QueryDef] = Seq(q51, e18, s22, st04)

  /** Wide-to-long unpivot via `stack()` — the melt that inverts q18's
    * pivot: per returnflag, three exact-integer measures land as
    * (metric, val) rows. The stack is a zero-shuffle generator over
    * the 3-row aggregate. */
  val q51: QueryDef = QueryDef(
    "q51_unpivot_metrics",
    (s, d) => Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity").cast("long")).as("qty"),
        sum(expr("cast(round(l_extendedprice * 100) as long)")).as("price_cents"),
        sum(expr("cast(round(l_discount * 100) as long)")).as("disc_cents"))
      .selectExpr("l_returnflag",
        "stack(3, 'qty', qty, 'price_cents', price_cents, " +
          "'disc_cents', disc_cents) AS (metric, val)")
      .orderBy(col("l_returnflag"), col("metric")),
    Some("""WITH b AS (SELECT l_returnflag,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                 AS price_cents,
               CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT)
                 AS disc_cents
             FROM lineitem GROUP BY 1)
      SELECT l_returnflag, metric, val FROM (
        SELECT l_returnflag, 'qty' AS metric, qty AS val FROM b
        UNION ALL SELECT l_returnflag, 'price_cents', price_cents FROM b
        UNION ALL SELECT l_returnflag, 'disc_cents', disc_cents FROM b)
      ORDER BY l_returnflag, metric"""))

  /** Revenue Pareto: the share of purchase revenue held by users at
    * or above the exact interpolated p90 of the per-user cent
    * distribution — one row. The threshold broadcasts (the e06
    * discipline — never a global ntile sort over users). */
  val e18: QueryDef = QueryDef(
    "e18_revenue_pareto",
    (s, d) => {
      val per = Tables.events(s, d).filter(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(sum(expr("cast(round(value * 100) as long)")).as("cents"))
      val thr = per.agg(expr("percentile(cents, 0.9)").as("p90"),
        count(lit(1)).as("n_users"), sum(col("cents")).as("total_cents"))
      per.crossJoin(broadcast(thr))
        .filter(col("cents") >= col("p90"))
        .groupBy(col("n_users"), col("total_cents"))
        .agg(count(lit(1)).as("top_users"), sum(col("cents")).as("top_cents"))
        .selectExpr("n_users", "total_cents", "top_users", "top_cents",
          "(top_cents * 1000000) div total_cents AS top_share_micro")
    },
    Some("""WITH per AS (SELECT user_id,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
             FROM events WHERE event_type = 'purchase' GROUP BY 1),
      thr AS (SELECT quantile_cont(cents, 0.9) AS p90,
               CAST(count(*) AS BIGINT) AS n_users,
               CAST(sum(cents) AS BIGINT) AS total_cents FROM per)
      SELECT thr.n_users, thr.total_cents,
        CAST(count(*) AS BIGINT) AS top_users,
        CAST(sum(per.cents) AS BIGINT) AS top_cents,
        (CAST(sum(per.cents) AS BIGINT) * 1000000) // thr.total_cents
          AS top_share_micro
      FROM per, thr WHERE per.cents >= thr.p90
      GROUP BY 1, 2"""))

  /** Cluster purity — the clustering-vs-labels eval: every vector
    * assigned to its fixed-codebook centroid (s04's assignment
    * semantics), then per centroid the member count, modal label, and
    * purity in micro units. The windows run over the (centroid,
    * label) grid, never the corpus. */
  val s22: QueryDef = QueryDef(
    "s22_cluster_purity",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val emb = Tables.embeddings(s, d)
      val lab = emb.selectExpr("vec_id", "cast(label as long) AS label")
      val counts = Similarity.assignCentroids(emb, 16)
        .select(col("vec_id"), col("centroid"))
        .join(lab, Seq("vec_id"))
        .groupBy(col("centroid"), col("label")).agg(count(lit(1)).as("n"))
      val pick = Window.partitionBy(col("centroid"))
        .orderBy(col("n").desc, col("label").asc)
      counts
        .withColumn("rn", row_number().over(pick))
        .withColumn("n_members",
          sum(col("n")).over(Window.partitionBy(col("centroid"))))
        .filter(col("rn") === 1)
        .selectExpr("centroid", "n_members", "label AS top_label", "n AS top_n",
          "(n * 1000000) div n_members AS purity_micro")
        .orderBy(col("centroid"))
    },
    Some(s"""WITH e AS (SELECT vec_id,
               list_transform(embedding, x -> x::DOUBLE) AS v,
               CAST(label AS BIGINT) AS label FROM embeddings),
      n AS (SELECT vec_id, v, label, ${DuckOps.norm2("v")} AS nrm FROM e),
      c AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n WHERE vec_id < 16),
      asg AS (SELECT vec_id, label, cid AS centroid FROM (
          SELECT a.vec_id, a.label, c.cid,
            row_number() OVER (PARTITION BY a.vec_id
              ORDER BY ${DuckOps.dot("a.v", "c.cv")} / (sqrt(a.nrm) * sqrt(c.cn)) DESC,
                       c.cid ASC) AS rn
          FROM n a CROSS JOIN c
          WHERE NOT isnan(${DuckOps.dot("a.v", "c.cv")} / (sqrt(a.nrm) * sqrt(c.cn))))
        WHERE rn = 1),
      g AS (SELECT centroid, label, CAST(count(*) AS BIGINT) AS n
            FROM asg GROUP BY 1, 2),
      m AS (SELECT centroid, CAST(sum(n) AS BIGINT) AS n_members FROM g GROUP BY 1),
      top AS (SELECT centroid, label AS top_label, n AS top_n FROM (
          SELECT centroid, label, n,
            row_number() OVER (PARTITION BY centroid
              ORDER BY n DESC, label ASC) AS rn
          FROM g) WHERE rn = 1)
      SELECT t.centroid, m.n_members, t.top_label, t.top_n,
        (t.top_n * 1000000) // m.n_members AS purity_micro
      FROM top t JOIN m ON t.centroid = m.centroid
      ORDER BY t.centroid"""))

  /** Exact sliding-window actives
    * ([[graft.streaming.EventStreams.slidingActiveUsersExact]]): the
    * batch/backfill face of the streaming sliding grid — every event
    * lands in exactly two epoch-aligned 10-minute windows sliding by
    * 5; exact distinct users and event counts per window. */
  val st04: QueryDef = QueryDef(
    "st04_sliding_actives",
    (s, d) => EventStreams.slidingActiveUsersExact(Tables.events(s, d))
      .orderBy(col("win_start_ms")),
    Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
      w AS (SELECT user_id, (us // 300000000) * 300000000 - o AS ws
            FROM e, unnest([0::BIGINT, 300000000::BIGINT]) AS t(o))
      SELECT ws // 1000 AS win_start_ms,
        CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        CAST(count(*) AS BIGINT) AS n_events
      FROM w GROUP BY 1 ORDER BY 1"""))
}
