package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Dedup

/** Round-13 additions, part 66: the ExactSubstr SCRUB (removal) face
  * (VERDICT r12 #3) — the action half of Lee et al. 2021 that rewrites
  * the corpus keeping one canonical copy per cross-document duplicated
  * window — and its per-source savings rollup (the "tokens removed"
  * number a curator reads after d29/d30 report the dup mass).
  */
object Pipeline89 {

  def all: Seq[QueryDef] = Seq(d32, p47)

  /** Cross-document exact-substring scrub
    * ([[graft.operators.Dedup.exactSubstrScrub]], k = 8): every
    * ≥8-token window appearing in ≥2 distinct documents keeps exactly
    * one canonical (lowest (doc_id, pos)) copy corpus-wide; each doc's
    * text is rebuilt from surviving tokens. The oracle replays seed
    * hashing, canonical election (row_number over (doc_id, pos) within
    * hash), the cross-document test (window min≠max doc), and the
    * coverage rebuild — the rewritten text itself is cell-exact. */
  val d32: QueryDef = QueryDef(
    "d32_exact_substr_scrub",
    (s, d) => Dedup.exactSubstrScrub(Tables.documents(s, d), "text", 8)
      .orderBy(col("doc_id")),
    Some(s"""WITH tk AS (SELECT doc_id, ${DuckOps.tokens("text")} AS t FROM documents),
      hx AS (SELECT doc_id, list_transform(${DuckOps.shingles("t", 8)},
               s -> ${DuckOps.strHash60("s")}) AS hs FROM tk),
      e AS (SELECT doc_id, unnest(list_transform(range(1, len(hs) + 1),
              i -> {'pos': i, 'sgl': hs[i]}), recursive := true) FROM hx),
      r AS (SELECT doc_id, pos,
              row_number() OVER (PARTITION BY sgl ORDER BY doc_id, pos) AS rn,
              min(doc_id) OVER (PARTITION BY sgl)
                <> max(doc_id) OVER (PARTITION BY sgl) AS xd
            FROM e),
      cov AS (SELECT doc_id, list_sort(list(pos)) AS cov FROM r
              WHERE rn >= 2 AND xd GROUP BY doc_id),
      j AS (SELECT tk.doc_id, t, coalesce(cov, []::BIGINT[]) AS cov
            FROM tk LEFT JOIN cov USING (doc_id)),
      k AS (SELECT doc_id, t, list_filter(range(1, len(t) + 1),
              p -> len(list_filter(cov, i -> i <= p AND i > p - 8)) = 0) AS kept
            FROM j)
      SELECT doc_id, CAST(len(t) AS BIGINT) AS n_before,
        CAST(len(kept) AS BIGINT) AS n_after,
        coalesce(array_to_string(list_transform(kept, p -> t[p]), ' '), '')
          AS text_scrubbed
      FROM k ORDER BY doc_id"""))

  /** Per-source ExactSubstr scrub savings — d32's rewrite rolled up to
    * the curation-dashboard number: tokens removed per source and the
    * micro share of that source's token mass the scrub reclaims (the
    * realized counterpart of d30's would-be dup mass; smaller, because
    * canonical copies stay). One doc-keyed equi-join attaches the
    * source, one partial agg folds per source. */
  val p47: QueryDef = QueryDef(
    "p47_scrub_savings_by_source",
    (s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.exactSubstrScrub(docs, "text", 8)
        .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_before")).as("tokens_before"),
          sum(col("n_after")).as("tokens_after"))
        .selectExpr("source", "n_docs", "tokens_before", "tokens_after",
          "tokens_before - tokens_after AS removed_tokens",
          "cast(if(tokens_before = 0, 0, (cast(tokens_before - tokens_after" +
            " as decimal(38,0)) * 1000000) div tokens_before) as bigint)" +
            " AS removed_micro")
        .orderBy(col("source"))
    },
    Some(s"""WITH tk AS (SELECT doc_id, source, ${DuckOps.tokens("text")} AS t
               FROM documents),
      hx AS (SELECT doc_id, list_transform(${DuckOps.shingles("t", 8)},
               s -> ${DuckOps.strHash60("s")}) AS hs FROM tk),
      e AS (SELECT doc_id, unnest(list_transform(range(1, len(hs) + 1),
              i -> {'pos': i, 'sgl': hs[i]}), recursive := true) FROM hx),
      r AS (SELECT doc_id, pos,
              row_number() OVER (PARTITION BY sgl ORDER BY doc_id, pos) AS rn,
              min(doc_id) OVER (PARTITION BY sgl)
                <> max(doc_id) OVER (PARTITION BY sgl) AS xd
            FROM e),
      cov AS (SELECT doc_id, list_sort(list(pos)) AS cov FROM r
              WHERE rn >= 2 AND xd GROUP BY doc_id),
      j AS (SELECT tk.doc_id, tk.source, t, coalesce(cov, []::BIGINT[]) AS cov
            FROM tk LEFT JOIN cov USING (doc_id)),
      k AS (SELECT doc_id, source, CAST(len(t) AS BIGINT) AS n_before,
              CAST(len(list_filter(range(1, len(t) + 1),
                p -> len(list_filter(cov, i -> i <= p AND i > p - 8)) = 0))
                AS BIGINT) AS n_after
            FROM j),
      a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(n_before) AS BIGINT) AS tokens_before,
              CAST(sum(n_after) AS BIGINT) AS tokens_after
            FROM k GROUP BY 1)
      SELECT source, n_docs, tokens_before, tokens_after,
        tokens_before - tokens_after AS removed_tokens,
        CAST(CASE WHEN tokens_before = 0 THEN 0
          ELSE (CAST(tokens_before - tokens_after AS HUGEINT) * 1000000)
            // tokens_before END AS BIGINT) AS removed_micro
      FROM a ORDER BY source"""))
}
