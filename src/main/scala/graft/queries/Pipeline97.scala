package graft.queries

import graft.Tables
import graft.operators.{Curate, TextOps}

/** Round-15 additions, part 86: mixture planning under availability
  * (water-filling budget allocation — the redistribution step the
  * proportional [[Curate.tokenBudgetSelect]] cannot express) and the
  * corpus vocabulary-health audit (Zipf-law OLS fit over the term
  * frequency distribution).
  */
object Pipeline97 {

  def all: Seq[QueryDef] = Seq(p57, t50)

  /** Water-filling allocation of a 40%-of-corpus token budget across
    * sources at uniform target weights: small sources saturate (they
    * cannot absorb an equal share) and their unabsorbed share
    * redistributes to the rest — the classic mixture-planning
    * primitive. Budget is computed from the corpus itself (2/5 of
    * total tokens) so the saturation structure is scale-free across
    * SFs. Oracle replays the exact integer algorithm (saturation-key
    * sort, monotone prefix test, truncated-division fills). */
  val p57: QueryDef = QueryDef(
    "p57_waterfill_budget",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val total = docs.selectExpr(
        "sum(cast(size(filter(split(text, '[ ]+'), x -> x != '')) as bigint)) AS t")
        .head.getLong(0)
      Curate.waterfillBudget(docs, "source", "text", 2L * total / 5L)
    },
    Some("""WITH per AS (SELECT source,
               CAST(sum(len(list_filter(regexp_split_to_array(text, '[ ]+'),
                 x -> x <> ''))) AS BIGINT) AS cap_tokens
             FROM documents GROUP BY 1),
      b AS (SELECT (2 * CAST(sum(cap_tokens) AS BIGINT)) // 5 AS budget FROM per),
      keyed AS (SELECT source, cap_tokens, 1::BIGINT AS weight,
          (CAST(cap_tokens AS HUGEINT) * 1000000000000) // weight AS sat_key
        FROM per),
      scan AS (SELECT *,
          COALESCE(CAST(sum(cap_tokens) OVER w0 AS BIGINT), 0) AS cap_before,
          COALESCE(CAST(sum(weight) OVER w0 AS BIGINT), 0) AS w_before,
          CAST(sum(weight) OVER () AS BIGINT) AS w_total
        FROM keyed, b
        WINDOW w0 AS (ORDER BY sat_key, source
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      cnd AS (SELECT *,
          CAST(cap_tokens AS HUGEINT) * (w_total - w_before)
            <= CAST(budget - cap_before AS HUGEINT) * weight AS c
        FROM scan),
      sat AS (SELECT *,
          min(CASE WHEN c THEN 1 ELSE 0 END) OVER
            (ORDER BY sat_key, source
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1 AS saturated
        FROM cnd),
      fin AS (SELECT *,
          budget - CAST(sum(CASE WHEN saturated THEN cap_tokens ELSE 0 END)
            OVER () AS BIGINT) AS r_budget,
          CAST(sum(CASE WHEN saturated THEN 0 ELSE weight END)
            OVER () AS BIGINT) AS w_unsat
        FROM sat),
      alloc AS (SELECT source, cap_tokens, weight, saturated,
          CASE WHEN saturated THEN cap_tokens
            ELSE least(cap_tokens,
              CAST(CAST(r_budget AS HUGEINT) * weight // w_unsat AS BIGINT))
          END AS alloc_tokens
        FROM fin)
      SELECT source, cap_tokens, weight, saturated, alloc_tokens,
        CAST(CAST(alloc_tokens AS HUGEINT) * 1000000 // cap_tokens AS BIGINT)
          AS fill_micro
      FROM alloc ORDER BY source"""))

  /** Zipf-law fit: OLS of ln(freq) on ln(rank) over the top-1000
    * terms, all arithmetic on the 1e-6 ln grid in exact integers —
    * slope/intercept/r² in micro units, cell-exact across engines. */
  val t50: QueryDef = QueryDef(
    "t50_zipf_fit",
    (s, d) => TextOps.zipfFit(Tables.documents(s, d), "text", 1000),
    Some(s"""WITH tf AS (SELECT t AS term, CAST(count(*) AS BIGINT) AS c
               FROM (SELECT unnest(${DuckOps.tokens("text")}) AS t
                     FROM documents)
               GROUP BY 1),
      nt AS (SELECT CAST(count(*) AS BIGINT) AS n_types FROM tf),
      top AS (SELECT c, row_number() OVER (ORDER BY c DESC, term ASC) AS rk
              FROM tf ORDER BY c DESC, term ASC LIMIT 1000),
      xy AS (SELECT CAST(floor(ln(rk) * 1000000) AS BIGINT) AS x,
               CAST(floor(ln(c) * 1000000) AS BIGINT) AS y FROM top),
      s AS (SELECT CAST(count(*) AS HUGEINT) AS n,
              CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
              CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
              CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
              CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
            FROM xy),
      d AS (SELECT n_types, CAST(n AS BIGINT) AS n_fit,
              n * sxy - sx * sy AS num, n * sxx - sx * sx AS den,
              n * syy - sy * sy AS syy_den, sx, sy, n
            FROM s, nt),
      d2 AS (SELECT *, CASE WHEN den = 0 THEN 0::HUGEINT
               ELSE num * 1000000 // den END AS slope_d FROM d)
      SELECT n_types, n_fit,
        CAST(slope_d AS BIGINT) AS slope_micro,
        CAST((sy - slope_d * sx // 1000000) // n AS BIGINT)
          AS intercept_micro,
        CAST(CASE WHEN syy_den = 0 THEN 1000000
          ELSE (slope_d * num) // syy_den END AS BIGINT)
          AS r2_micro
      FROM d2"""))
}
