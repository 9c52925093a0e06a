package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Similarity

/** Round-11 additions, part 18: conversion by burst cohort, the
  * k-NN confusion matrix, and exact-moment skewness.
  */
object Pipeline53 {

  def all: Seq[QueryDef] = Seq(e36, s32, q70)

  /** Conversion rate by peak-burst cohort: users bucketed by their
    * e31 max-10-minute burst, crossed with "ever purchased" — do
    * bursty (power/abusive) users actually convert? One window pass
    * (e31's), one distinct purchase-user flag, one partial agg.
    * Buckets and window pinned to e31's exactly, so the cohort
    * definition stays one source of truth. */
  val e36: QueryDef = QueryDef(
    "e36_burst_conversion",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("u")).orderBy(col("tus"))
        .rangeBetween(-(600000000L - 1), 0)
      val burst = Tables.events(s, d)
        .selectExpr("user_id AS u", "unix_micros(ts) AS tus")
        .withColumn("c", count(lit(1)).over(w))
        .groupBy(col("u")).agg(max(col("c")).as("mb"))
        .selectExpr("u",
          "cast(case when mb >= 10 then 10 when mb >= 5 then 5 else mb end as bigint) AS bucket")
      val conv = Tables.events(s, d).filter(col("event_type") === "purchase")
        .select(col("user_id").as("u")).distinct().withColumn("cv", lit(1L))
      burst.join(conv, Seq("u"), "left")
        .selectExpr("bucket", "coalesce(cv, 0L) AS cv")
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_users"),
          coalesce(sum(col("cv")), lit(0L)).as("n_converters"))
        .selectExpr("bucket", "n_users", "n_converters",
          "cast((cast(n_converters as decimal(38,0)) * 1000000) div n_users as bigint) AS cvr_micro")
        .orderBy(col("bucket"))
    },
    Some("""WITH s AS (SELECT user_id AS u, epoch_us(ts) AS tus FROM events),
      b AS (SELECT u, count(*) OVER (PARTITION BY u ORDER BY tus
              RANGE BETWEEN 599999999 PRECEDING AND CURRENT ROW) AS c FROM s),
      m AS (SELECT u, max(c) AS mb FROM b GROUP BY 1),
      k AS (SELECT u, CAST(CASE WHEN mb >= 10 THEN 10 WHEN mb >= 5 THEN 5
              ELSE mb END AS BIGINT) AS bucket FROM m),
      cv AS (SELECT DISTINCT user_id AS u FROM events
             WHERE event_type = 'purchase')
      SELECT k.bucket, CAST(count(*) AS BIGINT) AS n_users,
        CAST(COALESCE(sum(CASE WHEN cv.u IS NOT NULL THEN 1 ELSE 0 END), 0)
          AS BIGINT) AS n_converters,
        CAST((CAST(COALESCE(sum(CASE WHEN cv.u IS NOT NULL THEN 1 ELSE 0 END), 0)
          AS HUGEINT) * 1000000) // count(*) AS BIGINT) AS cvr_micro
      FROM k LEFT JOIN cv ON k.u = cv.u
      GROUP BY 1 ORDER BY 1"""))

  /** k-NN confusion matrix: s21's leave-one-out classifier rolled to
    * (actual, predicted) cells with per-actual-row micro shares —
    * the classifier-eval primitive (which labels bleed into which).
    * Composes the audited s21 machinery; the oracle nests s21's
    * replay. Only observed cells emit (the label catalog is
    * data-defined). */
  val s32: QueryDef = QueryDef(
    "s32_knn_confusion",
    (s, d) => {
      val cls = Similarity.knnClassify(Tables.embeddings(s, d),
        "vec_id % 7 = 0 AND vec_id < 1400", 5)
        .select(col("actual"), col("pred_label"))
      val rows = cls.groupBy(col("actual")).agg(count(lit(1)).as("row_n"))
      cls.groupBy(col("actual"), col("pred_label")).agg(count(lit(1)).as("n"))
        .join(rows, Seq("actual"))
        .selectExpr("actual", "pred_label", "n",
          "cast((cast(n as decimal(38,0)) * 1000000) div row_n as bigint) AS row_share_micro")
        .orderBy(col("actual"), col("pred_label"))
    },
    Some(s"""WITH s21 AS (SELECT * FROM (${Pipeline18.s21.oracle.get}) AS x),
      cells AS (SELECT actual, pred_label, CAST(count(*) AS BIGINT) AS n
                FROM s21 GROUP BY 1, 2),
      rows_ AS (SELECT actual, CAST(sum(n) AS BIGINT) AS row_n
                FROM cells GROUP BY 1)
      SELECT c.actual, c.pred_label, c.n,
        CAST((CAST(c.n AS HUGEINT) * 1000000) // r.row_n AS BIGINT)
          AS row_share_micro
      FROM cells c JOIN rows_ r ON c.actual = r.actual
      ORDER BY c.actual, c.pred_label"""))

  /** Exact-moment skewness of order totals (whole dollars): the
    * third standardized moment from raw integer power sums —
    * skew = B / A^1.5 with A = n·Σx² − (Σx)² and
    * B = n²·Σx³ − 3n·Σx·Σx² + 2(Σx)³, both EXACT 128-bit integers;
    * only the final ratio is one IEEE chain, micro-rounded. Dollars
    * (not cents) keep B inside decimal(38): the documented bound is
    * n²·Σx³ < 1e38 — at corpus scale beyond that, pre-center per
    * partition (skewness is translation-invariant) before the power
    * sums. Positive skew = the long right tail every revenue
    * distribution has. */
  val q70: QueryDef = QueryDef(
    "q70_skewness",
    (s, d) => Tables.orders(s, d)
      .selectExpr("cast(round(o_totalprice) as bigint) AS x")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s1"),
        sum(expr("x * x")).as("s2"),
        sum(expr("cast(x as decimal(38,0)) * x * x")).as("s3"))
      .selectExpr("n", "s1", "s2",
        "cast(n as decimal(38,0)) * s2 - cast(s1 as decimal(38,0)) * s1 AS a",
        "cast(n as decimal(38,0)) * n * s3 - 3 * cast(n as decimal(38,0)) * s1 * s2 + 2 * cast(s1 as decimal(38,0)) * s1 * s1 AS b")
      .selectExpr("n", "s1 AS sum_dollars",
        "cast(a as double) AS a_d", "cast(b as double) AS b_d")
      .selectExpr("n", "sum_dollars",
        "cast(round(b_d / (a_d * sqrt(a_d)) * 1000000) as bigint) AS skew_micro"),
    Some("""WITH m AS (SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS s1,
               CAST(sum(x * x) AS BIGINT) AS s2,
               CAST(sum(CAST(x AS HUGEINT) * x * x) AS HUGEINT) AS s3
             FROM (SELECT CAST(round(o_totalprice) AS BIGINT) AS x FROM orders)),
      ab AS (SELECT n, s1,
               CAST(CAST(n AS HUGEINT) * s2 - CAST(s1 AS HUGEINT) * s1 AS DOUBLE) AS a_d,
               CAST(CAST(n AS HUGEINT) * n * s3
                 - 3 * CAST(n AS HUGEINT) * s1 * s2
                 + 2 * CAST(s1 AS HUGEINT) * s1 * s1 AS DOUBLE) AS b_d
             FROM m)
      SELECT n, s1 AS sum_dollars,
        CAST(round(b_d / (a_d * sqrt(a_d)) * 1000000) AS BIGINT) AS skew_micro
      FROM ab"""))
}
