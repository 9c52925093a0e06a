package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Dedup

/** Round-12 additions, part 54: cross-document exact-substring span
  * dedup (the Lee et al. 2021 ExactSubstr method — VERDICT r11 #2,
  * the one missing first-class LLM-dedup operator).
  */
object Pipeline88 {

  def all: Seq[QueryDef] = Seq(d29)

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
}
