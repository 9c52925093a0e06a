package graft.queries

import org.apache.spark.sql.functions.{col, count, lit}
import graft.Tables
import graft.operators.TextOps

/** Round-15 additions, part 91: the grouped ln-ln OLS fit applied to
  * two new surfaces — per-source Zipf slopes (which source is
  * templated?) and the user-activity power law (the events family's
  * frequency-shape diagnostic).
  */
object Pipeline102 {

  def all: Seq[QueryDef] = Seq(t52, e43)

  /** Shared DuckDB replay of [[TextOps.lnLnFitGrouped]] over a counts
    * CTE named `counts` with columns (grp, item, c). */
  private def olsOracle(countsCte: String, maxRank: Int): String =
    s"""WITH counts AS ($countsCte),
      tot AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_items
              FROM counts GROUP BY 1),
      top AS (SELECT grp, c, row_number() OVER (PARTITION BY grp
                ORDER BY c DESC, item ASC) AS rk
              FROM counts),
      xy AS (SELECT grp, CAST(floor(ln(rk) * 1000000) AS BIGINT) AS x,
               CAST(floor(ln(c) * 1000000) AS BIGINT) AS y
             FROM top WHERE rk <= $maxRank),
      s AS (SELECT grp, CAST(count(*) AS HUGEINT) AS n,
              CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
              CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
              CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
              CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
            FROM xy GROUP BY 1),
      d AS (SELECT s.grp, n_items, CAST(n AS BIGINT) AS n_fit,
              n * sxy - sx * sy AS num, n * sxx - sx * sx AS den,
              n * syy - sy * sy AS syy_den, sx, sy, n
            FROM s JOIN tot ON s.grp = tot.grp),
      d2 AS (SELECT *, CASE WHEN den = 0 THEN 0::HUGEINT
               ELSE num * 1000000 // den END AS slope_d FROM d)
      SELECT grp, n_items, n_fit,
        CAST(slope_d AS BIGINT) AS slope_micro,
        CAST((sy - slope_d * sx // 1000000) // n AS BIGINT)
          AS intercept_micro,
        CAST(CASE WHEN syy_den = 0 THEN 1000000
          ELSE (slope_d * num) // syy_den END AS BIGINT) AS r2_micro
      FROM d2 ORDER BY grp"""

  /** Per-source Zipf slope over each source's own top-300 terms — the
    * per-source version of t50's vocabulary-health audit: a templated
    * source reads near-flat while its neighbors read natural. */
  val t52: QueryDef = QueryDef(
    "t52_source_zipf_slopes",
    (s, d) => TextOps.lnLnFitGrouped(
      Tables.documents(s, d)
        .selectExpr("source AS grp",
          s"explode(${TextOps.tokens("text")}) AS item")
        .groupBy(col("grp"), col("item")).agg(count(lit(1)).as("c")),
      maxRank = 300),
    Some(olsOracle(
      s"""SELECT source AS grp, t AS item, CAST(count(*) AS BIGINT) AS c
        FROM (SELECT source, unnest(${DuckOps.tokens("text")}) AS t
              FROM documents)
        GROUP BY 1, 2""", 300)))

  /** User-activity power law: ln-ln OLS over the rows-per-user rank
    * curve — q93 says whether the user key is SAFE to shuffle on;
    * this says what DISTRIBUTION the activity follows (a natural
    * product reads heavy-tailed; a bot-farm or synthetic feed reads
    * flat). */
  val e43: QueryDef = QueryDef(
    "e43_user_activity_powerlaw",
    (s, d) => TextOps.lnLnFitGrouped(
      Tables.events(s, d)
        .selectExpr("'users' AS grp", "cast(user_id as string) AS item")
        .groupBy(col("grp"), col("item")).agg(count(lit(1)).as("c")),
      maxRank = 1000),
    Some(olsOracle(
      """SELECT 'users' AS grp, CAST(user_id AS VARCHAR) AS item,
          CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2""", 1000)))
}
