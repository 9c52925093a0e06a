package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Dedup, TextOps}

/** Round-12 additions, part 54: cross-document exact-substring span
  * dedup (the Lee et al. 2021 ExactSubstr method — VERDICT r11 #2,
  * the one missing first-class LLM-dedup operator) and its per-source
  * curation rollup.
  */
object Pipeline88 {

  def all: Seq[QueryDef] = Seq(d29, d30, d31, p46)

  /** Per-document exact-substring duplication inventory
    * ([[graft.operators.Dedup.exactSubstrStats]], k = 8): maximal
    * ≥8-token spans appearing verbatim in at least one OTHER
    * document at ANY offset — the tier the prefix-fingerprint family
    * (d27) misses for mid-document boilerplate. The oracle replays
    * seed hashing, the min≠max cross-doc test, and the gap-≤k island
    * merge with one flat window. */
  val d29: QueryDef = QueryDef(
    "d29_exact_substr",
    (s, d) => Dedup.exactSubstrStats(Tables.documents(s, d), "text", 8)
      .orderBy(col("doc_id")),
    Some(s"""WITH tk AS (SELECT doc_id, ${DuckOps.tokens("text")} AS t FROM documents),
      hx AS (SELECT doc_id, list_transform(${DuckOps.shingles("t", 8)},
               s -> ${DuckOps.strHash60("s")}) AS hs FROM tk),
      occ AS (SELECT doc_id, unnest(list_transform(range(1, len(hs) + 1),
              i -> {'pos': i, 'h': hs[i]}), recursive := true) FROM hx),
      cd AS (SELECT h FROM occ GROUP BY h HAVING min(doc_id) <> max(doc_id)),
      dp AS (SELECT occ.doc_id, CAST(occ.pos AS BIGINT) AS pos
             FROM occ JOIN cd USING (h)),
      br AS (SELECT doc_id, pos, CASE WHEN pos - lag(pos) OVER
               (PARTITION BY doc_id ORDER BY pos) <= 8 THEN 0 ELSE 1 END AS brk
             FROM dp),
      gr AS (SELECT doc_id, pos, sum(brk) OVER (PARTITION BY doc_id
               ORDER BY pos) AS grp FROM br),
      sp AS (SELECT doc_id, min(pos) AS s, max(pos) + 7 AS e
             FROM gr GROUP BY doc_id, grp)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
        CAST(sum(e - s + 1) AS BIGINT) AS dup_tokens,
        CAST(max(e - s + 1) AS BIGINT) AS max_span_tokens
      FROM sp GROUP BY 1 ORDER BY 1"""))

  /** Per-source exact-substring duplication mass — the curation
    * dashboard number next to d29's per-doc inventory: what fraction
    * of each source's token mass sits inside cross-document verbatim
    * ≥8-token spans (the ExactSubstr scrub's would-be savings,
    * source-attributed). Docs with no span contribute zero dup mass
    * but full token mass. */
  val d30: QueryDef = QueryDef(
    "d30_exact_substr_by_source",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val perDoc = Dedup.exactSubstrSpans(docs, "text", 8)
        .groupBy(col("doc_id")).agg(sum(col("span_tokens")).as("dup_tokens"))
      docs.selectExpr("doc_id", "source",
          s"cast(size(${TextOps.tokens("text")}) as bigint) AS n_toks")
        .join(perDoc, Seq("doc_id"), "left")
        .na.fill(0L, Seq("dup_tokens"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"),
          sum(col("dup_tokens")).as("dup_span_tokens"))
        .selectExpr("source", "n_docs", "n_tokens", "dup_span_tokens",
          "cast(if(n_tokens = 0, 0, (cast(dup_span_tokens as decimal(38,0))" +
            " * 1000000) div n_tokens) as bigint) AS dup_micro")
        .orderBy(col("source"))
    },
    Some(s"""WITH tk AS (SELECT doc_id, source, ${DuckOps.tokens("text")} AS t
               FROM documents),
      hx AS (SELECT doc_id, list_transform(${DuckOps.shingles("t", 8)},
               s -> ${DuckOps.strHash60("s")}) AS hs FROM tk),
      occ AS (SELECT doc_id, unnest(list_transform(range(1, len(hs) + 1),
              i -> {'pos': i, 'h': hs[i]}), recursive := true) FROM hx),
      cd AS (SELECT h FROM occ GROUP BY h HAVING min(doc_id) <> max(doc_id)),
      dp AS (SELECT occ.doc_id, CAST(occ.pos AS BIGINT) AS pos
             FROM occ JOIN cd USING (h)),
      br AS (SELECT doc_id, pos, CASE WHEN pos - lag(pos) OVER
               (PARTITION BY doc_id ORDER BY pos) <= 8 THEN 0 ELSE 1 END AS brk
             FROM dp),
      gr AS (SELECT doc_id, pos, sum(brk) OVER (PARTITION BY doc_id
               ORDER BY pos) AS grp FROM br),
      sp AS (SELECT doc_id, min(pos) AS s, max(pos) + 7 AS e
             FROM gr GROUP BY doc_id, grp),
      pd AS (SELECT doc_id, CAST(sum(e - s + 1) AS BIGINT) AS dup_tokens
             FROM sp GROUP BY 1),
      m AS (SELECT tk.source, CAST(len(tk.t) AS BIGINT) AS n_toks,
              COALESCE(pd.dup_tokens, 0) AS dup_tokens
            FROM tk LEFT JOIN pd USING (doc_id))
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(n_toks) AS BIGINT) AS n_tokens,
        CAST(sum(dup_tokens) AS BIGINT) AS dup_span_tokens,
        CAST(CASE WHEN sum(n_toks) = 0 THEN 0
          ELSE (CAST(sum(dup_tokens) AS HUGEINT) * 1000000) // sum(n_toks)
          END AS BIGINT) AS dup_micro
      FROM m GROUP BY 1 ORDER BY 1"""))

  /** Pair-attributed aligned spans
    * ([[graft.operators.Dedup.exactSubstrPairSpans]], k = 8,
    * occurrence cap 16): which document PAIRS share verbatim ≥8-token
    * spans, with the longest and total aligned-span mass per pair —
    * the partner-naming face d29's per-doc inventory cannot give.
    * The oracle mirrors the df-cap (total occurrences ≤ 16) and the
    * per-diagonal island merge. */
  val d31: QueryDef = QueryDef(
    "d31_exact_substr_pairs",
    (s, d) => Dedup.exactSubstrPairSpans(Tables.documents(s, d), "text", 8, 16)
      .orderBy(col("d1"), col("d2")),
    Some(s"""WITH tk AS (SELECT doc_id, ${DuckOps.tokens("text")} AS t FROM documents),
      hx AS (SELECT doc_id, list_transform(${DuckOps.shingles("t", 8)},
               s -> ${DuckOps.strHash60("s")}) AS hs FROM tk),
      occ AS (SELECT doc_id, unnest(list_transform(range(1, len(hs) + 1),
              i -> {'pos': i, 'h': hs[i]}), recursive := true) FROM hx),
      el AS (SELECT h FROM occ GROUP BY h
             HAVING count(*) <= 16 AND min(doc_id) <> max(doc_id)),
      oc AS (SELECT occ.doc_id, CAST(occ.pos AS BIGINT) AS pos, occ.h
             FROM occ JOIN el USING (h)),
      pr AS (SELECT a.doc_id AS d1, b.doc_id AS d2, a.pos AS p1,
               a.pos - b.pos AS diag
             FROM oc a JOIN oc b ON a.h = b.h AND a.doc_id < b.doc_id),
      br AS (SELECT d1, d2, diag, p1, CASE WHEN p1 - lag(p1) OVER
               (PARTITION BY d1, d2, diag ORDER BY p1) <= 8 THEN 0 ELSE 1 END
               AS brk FROM pr),
      gr AS (SELECT d1, d2, diag, p1, sum(brk) OVER
               (PARTITION BY d1, d2, diag ORDER BY p1) AS g FROM br),
      sp AS (SELECT d1, d2, diag, max(p1) - min(p1) + 8 AS span
             FROM gr GROUP BY d1, d2, diag, g)
      SELECT d1, d2, CAST(count(*) AS BIGINT) AS n_spans,
        CAST(max(span) AS BIGINT) AS max_span_tokens,
        CAST(sum(span) AS BIGINT) AS span_tokens
      FROM sp GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Train→eval span contamination
    * ([[graft.operators.Dedup.spanContamination]], k = 8, eval set =
    * `doc_id % 97 = 0`): the published n-gram-overlap train/test
    * leakage audit — per eval document the verbatim ≥8-token span
    * mass that also occurs anywhere in the train split, zero-filled
    * for clean docs. Only train-side presence contaminates
    * (eval↔eval overlap does not count — spec-pinned). */
  val p46: QueryDef = QueryDef(
    "p46_span_contamination",
    (s, d) => Dedup.spanContamination(Tables.documents(s, d), "text", 8,
        "doc_id % 97 = 0")
      .orderBy(col("doc_id")),
    Some(s"""WITH tk AS (SELECT doc_id, doc_id % 97 = 0 AS is_eval,
               ${DuckOps.tokens("text")} AS t FROM documents),
      hx AS (SELECT doc_id, is_eval, CAST(len(t) AS BIGINT) AS n_tokens,
               list_transform(${DuckOps.shingles("t", 8)},
                 s -> ${DuckOps.strHash60("s")}) AS hs FROM tk),
      occ AS (SELECT doc_id, is_eval, unnest(list_transform(range(1, len(hs) + 1),
              i -> {'pos': i, 'h': hs[i]}), recursive := true) FROM hx),
      th AS (SELECT DISTINCT h FROM occ WHERE NOT is_eval),
      dp AS (SELECT occ.doc_id, CAST(occ.pos AS BIGINT) AS pos
             FROM occ JOIN th USING (h) WHERE occ.is_eval),
      br AS (SELECT doc_id, pos, CASE WHEN pos - lag(pos) OVER
               (PARTITION BY doc_id ORDER BY pos) <= 8 THEN 0 ELSE 1 END AS brk
             FROM dp),
      gr AS (SELECT doc_id, pos, sum(brk) OVER (PARTITION BY doc_id
               ORDER BY pos) AS grp FROM br),
      sp AS (SELECT doc_id, min(pos) AS s, max(pos) + 7 AS e
             FROM gr GROUP BY doc_id, grp),
      pd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
               CAST(sum(e - s + 1) AS BIGINT) AS ct FROM sp GROUP BY 1)
      SELECT hx.doc_id, hx.n_tokens,
        COALESCE(pd.n_spans, 0) AS n_spans,
        COALESCE(pd.ct, 0) AS contaminated_tokens,
        CAST(CASE WHEN hx.n_tokens = 0 THEN 0
          ELSE (CAST(COALESCE(pd.ct, 0) AS HUGEINT) * 1000000) // hx.n_tokens
          END AS BIGINT) AS contamination_micro
      FROM hx LEFT JOIN pd USING (doc_id)
      WHERE hx.is_eval ORDER BY doc_id"""))
}
