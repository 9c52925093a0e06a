package graft.queries

import graft.Tables
import graft.operators.{Profile, TextOps}

/** Round-11 additions, part 29: Benford first-digit audit (the
  * forensic data-quality classic, pinned integer expectations),
  * exact weighted median through the value-range bucket machinery,
  * and hapax/dis lexical richness per source.
  */
object Pipeline64 {

  def all: Seq[QueryDef] = Seq(q77, q78, t44)

  /** Benford first-significant-digit audit
    * ([[graft.operators.Profile.benfordAudit]]) of order values in
    * cents. TPC-H-style uniform prices are decidedly NOT
    * Benford-distributed — the audit's job is to SAY so, with exact
    * counts, micro shares, and deviations from the pinned
    * `log10(1+1/d)` expectations (integer constants on both
    * engines; no runtime log anywhere). 9-row data-independent
    * grid, zeros for absent digits. */
  val q77: QueryDef = QueryDef(
    "q77_benford",
    (s, d) => Profile.benfordAudit(
      Tables.orders(s, d)
        .selectExpr("cast(round(o_totalprice * 100) as bigint) AS cents"),
      "cents"),
    Some("""WITH d AS (SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100)
               AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
             FROM orders WHERE CAST(round(o_totalprice * 100) AS BIGINT) > 0),
      c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1),
      grid AS (SELECT unnest(range(1, 10)) AS digit),
      tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM c),
      j AS (SELECT g.digit, CAST(COALESCE(c.n, 0) AS BIGINT) AS n, t.n_total,
              CAST(CASE WHEN t.n_total = 0 THEN 0
                ELSE CAST(COALESCE(c.n, 0) AS HUGEINT) * 1000000 // t.n_total
                END AS BIGINT) AS share_micro,
              CAST(CASE g.digit WHEN 1 THEN 301029 WHEN 2 THEN 176091
                WHEN 3 THEN 124938 WHEN 4 THEN 96910 WHEN 5 THEN 79181
                WHEN 6 THEN 66946 WHEN 7 THEN 57991 WHEN 8 THEN 51152
                ELSE 45757 END AS BIGINT) AS benford_micro
            FROM grid g LEFT JOIN c ON g.digit = c.digit CROSS JOIN tot t)
      SELECT digit, n, n_total, share_micro, benford_micro,
        abs(share_micro - benford_micro) AS dev_micro
      FROM j ORDER BY digit"""))

  /** Exact weighted median
    * ([[graft.operators.Profile.weightedMedianExact]]) of line-item
    * price in cents weighted by quantity — "the price at which half
    * the shipped units cost less". The q76 value-range bucket
    * decomposition carries the cumulative weight; the oracle's flat
    * window over the distinct-price frame proves the decomposition
    * is the identity. */
  val q78: QueryDef = QueryDef(
    "q78_weighted_median",
    (s, d) => Profile.weightedMedianExact(
      Tables.lineitem(s, d)
        .selectExpr("cast(round(l_extendedprice * 100) as bigint) AS cents",
          "cast(round(l_quantity) as bigint) AS qty"),
      "cents", "qty"),
    Some("""WITH g AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS c,
               CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS wv
             FROM lineitem GROUP BY 1),
      r AS (SELECT c, wv, CAST(sum(wv) OVER (ORDER BY c
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
            FROM g),
      t AS (SELECT CAST(sum(wv) AS BIGINT) AS total FROM g)
      SELECT min(r.c) AS median_value,
        CAST(any_value(t.total) AS BIGINT) AS total_weight,
        CAST(arg_min(r.cum, r.c) AS BIGINT) AS cum_at_median
      FROM r, t WHERE r.cum * 2 >= t.total"""))

  /** Hapax/dis legomena lexical richness per source
    * ([[graft.operators.TextOps.lexicalRichness]]) — the TYPE-side
    * synthetic-text flag next to t43's token-side Simpson repeat:
    * natural corpora run ~40–60% hapax share, template text
    * collapses it. */
  val t44: QueryDef = QueryDef(
    "t44_lexical_richness",
    (s, d) => TextOps.lexicalRichness(Tables.documents(s, d), "source", "text"),
    Some(s"""WITH toks AS (SELECT source, unnest(${DuckOps.tokens("text")}) AS tok
               FROM documents),
      cnt AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS n
              FROM toks GROUP BY 1, 2),
      agg AS (SELECT source, CAST(count(*) AS BIGINT) AS n_types,
                CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
                CAST(sum(CASE WHEN n = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dis
              FROM cnt GROUP BY 1)
      SELECT source, n_types, n_hapax, n_dis,
        CAST(CAST(n_hapax AS HUGEINT) * 1000000 // n_types AS BIGINT)
          AS hapax_share_micro
      FROM agg ORDER BY source"""))
}
