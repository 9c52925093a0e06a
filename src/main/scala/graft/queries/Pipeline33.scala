package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Similarity

/** Round-10 additions, part 23: growth accounting (new / retained /
  * resurrected), PQ code-usage histograms, and the log2 magnitude
  * histogram.
  */
object Pipeline33 {

  def all: Seq[QueryDef] = Seq(e29, s26, q61)

  /** Growth accounting: each user's active weeks classify as `new`
    * (first ever), `retained` (active the week before), or
    * `resurrected` (returned after a gap) — the standard
    * new/retained/resurrected decomposition of weekly actives. One
    * user-keyed lag over the distinct (user, week) grid. */
  val e29: QueryDef = QueryDef(
    "e29_growth_accounting",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val wk = Tables.events(s, d)
        .selectExpr("user_id", "trunc(to_date(ts), 'week') AS w").distinct()
      wk.withColumn("pw",
          lag(col("w"), 1).over(Window.partitionBy(col("user_id")).orderBy(col("w"))))
        .selectExpr("cast(w as string) AS week",
          "case when pw is null then 'new'" +
            " when datediff(w, pw) = 7 then 'retained'" +
            " else 'resurrected' end AS state")
        .groupBy(col("week"), col("state"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("week"), col("state"))
    },
    Some("""WITH wk AS (SELECT DISTINCT user_id,
               date_trunc('week', CAST(ts AS DATE)) AS w FROM events),
      lg AS (SELECT user_id, w,
               lag(w) OVER (PARTITION BY user_id ORDER BY w) AS pw
             FROM wk)
      SELECT CAST(w AS VARCHAR) AS week,
        CASE WHEN pw IS NULL THEN 'new'
             WHEN w - pw = 7 THEN 'retained'
             ELSE 'resurrected' END AS state,
        CAST(count(*) AS BIGINT) AS n_users
      FROM lg GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** PQ code-usage histogram — the d16 degeneracy check applied to
    * product quantization: per subspace the number of codes actually
    * used, the assigned vector count, and the fattest code's share in
    * micro units (a subspace where one code swallows everything
    * carries no information). Nests s09's assignment chain. */
  val s26: QueryDef = QueryDef(
    "s26_pq_code_histogram",
    (s, d) => Similarity.productQuantize(Tables.embeddings(s, d))
      .selectExpr("vec_id", "posexplode(codes) AS (j, cid)")
      .groupBy(col("j"), col("cid")).agg(count(lit(1)).as("n"))
      .groupBy(col("j").cast("long").as("subspace"))
      .agg(count(lit(1)).as("n_codes_used"), sum(col("n")).as("n_vecs"),
        max(col("n")).as("max_code"))
      .selectExpr("subspace", "n_codes_used", "n_vecs",
        "(max_code * 1000000) div n_vecs AS top_share_micro")
      .orderBy(col("subspace")),
    Some(s"""WITH e AS (SELECT vec_id,
          list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
      cb AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
      sub AS (SELECT e.vec_id, j, cid,
                list_reduce(list_concat([0.0::DOUBLE],
                  list_transform(range(1, 9), i ->
                    (e.v[j * 8 + i] - cb.cv[j * 8 + i]) *
                    (e.v[j * 8 + i] - cb.cv[j * 8 + i]))),
                  (x, y) -> x + y) AS d
              FROM e, cb, unnest(range(0, 8)) AS t(j)),
      asg AS (SELECT vec_id, j, cid FROM (
                SELECT vec_id, j, cid,
                  row_number() OVER (PARTITION BY vec_id, j ORDER BY d, cid) AS rk
                FROM sub) WHERE rk = 1),
      g AS (SELECT CAST(j AS BIGINT) AS subspace, cid,
              CAST(count(*) AS BIGINT) AS n
            FROM asg GROUP BY 1, 2)
      SELECT subspace, CAST(count(*) AS BIGINT) AS n_codes_used,
        CAST(sum(n) AS BIGINT) AS n_vecs,
        (CAST(max(n) AS BIGINT) * 1000000) // CAST(sum(n) AS BIGINT)
          AS top_share_micro
      FROM g GROUP BY 1 ORDER BY 1"""))

  /** Log2 magnitude histogram: order totals in cents bucketed by bit
    * length (`length(bin(c))` — exact integer floor(log2)+1, no
    * engine log() variance), with the power-of-two bucket bounds. */
  val q61: QueryDef = QueryDef(
    "q61_log2_histogram",
    (s, d) => Tables.orders(s, d)
      .selectExpr("cast(round(o_totalprice * 100) as long) AS c")
      .selectExpr("cast(length(bin(c)) as bigint) AS bucket")
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_orders"))
      .selectExpr("bucket", "shiftleft(1L, cast(bucket as int) - 1) AS lo_bound",
        "shiftleft(1L, cast(bucket as int)) - 1 AS hi_bound", "n_orders")
      .orderBy(col("bucket")),
    Some("""WITH c AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c
             FROM orders),
      b AS (SELECT CAST(length(bin(c)) AS BIGINT) AS bucket FROM c)
      SELECT bucket, (1::BIGINT << (bucket - 1)) AS lo_bound,
        (1::BIGINT << bucket) - 1 AS hi_bound,
        CAST(count(*) AS BIGINT) AS n_orders
      FROM b GROUP BY 1 ORDER BY 1"""))
}
