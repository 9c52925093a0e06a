package graft.queries

import graft.Tables
import graft.operators.Curate

/** Round-11 additions, part 35: the trimmed mean — the two-tailed
  * face of the value-range-bucketed rank family.
  */
object Pipeline70 {

  def all: Seq[QueryDef] = Seq(q81)

  /** 5%-trimmed mean of order values in cents
    * ([[graft.operators.Curate.trimmedMeanExact]], permille = 50):
    * drop the 750 smallest and largest orders at sf0.01, average the
    * rest — the robust center a revenue dashboard should show when
    * whales and refunds pollute the plain mean. Both tails fall out
    * of ONE ascending collapsed frame (the high-tail take is the
    * ascending take reflected through n), exact through ties by the
    * weight-uniform tie-group rule. */
  val q81: QueryDef = QueryDef(
    "q81_trimmed_mean",
    (s, d) => Curate.trimmedMeanExact(
      Tables.orders(s, d)
        .selectExpr("cast(round(o_totalprice * 100) as bigint) AS cents"),
      "cents", permille = 50),
    Some("""WITH w AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c
               FROM orders),
      g AS (SELECT c, CAST(count(*) AS BIGINT) AS cnt FROM w GROUP BY 1),
      r AS (SELECT c, cnt, COALESCE(CAST(sum(cnt) OVER (ORDER BY c
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
              0) AS before
            FROM g),
      t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n,
              CAST(sum(CAST(c AS HUGEINT) * cnt) AS HUGEINT) AS total FROM g),
      k AS (SELECT n, total, (50 * n) // 1000 AS kk FROM t),
      cut AS (SELECT CAST(sum(CAST(r.c AS HUGEINT) *
                (GREATEST(0, LEAST(r.cnt, k.kk - r.before))
                 + GREATEST(0, LEAST(r.cnt, k.kk - (k.n - r.before - r.cnt)))))
                AS HUGEINT) AS cu
              FROM r, k)
      SELECT k.n AS n_rows, CAST(k.kk AS BIGINT) AS k_trim,
        CAST(k.total AS BIGINT) AS total_weight,
        CAST(k.total - cut.cu AS BIGINT) AS trimmed_sum,
        CAST(CASE WHEN k.n - 2 * k.kk <= 0 THEN 0
          ELSE (k.total - cut.cu) * 1000 // (k.n - 2 * k.kk) END AS BIGINT)
          AS trimmed_mean_milli
      FROM k, cut"""))
}
