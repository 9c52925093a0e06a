package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Dedup, Packing, TextOps}

/** Round-15 additions, part 85: the end-to-end curation COMPOSITION
  * (VERDICT r14 #6) — every stage of the real training-data loop the
  * engine's operators serve individually, chained as ONE query whose
  * oracle replays the full pipeline, proving the faces compose
  * cell-exactly: eval-span decontamination (p52) → cross-document
  * exact-substring scrub (d32) → Gopher repetition gates (t48) →
  * per-language greedy sequence packing (p53). The composition
  * invariant — p46's span-contamination audit over (packed output ∪
  * eval) reads ZERO — is pinned in ScrubSpec, not here (a second
  * audit query over the same chain would double the plan for a
  * constant answer).
  */
object Pipeline96 {

  def all: Seq[QueryDef] = Seq(p54)

  /** The composed curation pipeline at the registered stages'
    * parameters (k = 8 for both scrubs, eval = `doc_id % 97 = 0`,
    * Gopher gates at 0.20/0.30, pack budget 200): train docs are
    * span-scrubbed against the eval set, then exact-substring
    * deduplicated corpus-wide (canonical copy survives), then gated
    * on the POST-scrub text, and the survivors greedy-packed per
    * language in doc_id order. Output = p53's shape (one row per
    * packed doc with its bin and running fill) over the fully
    * curated corpus — bin boundaries shift with every token either
    * scrub removes and every doc the gates drop, so the oracle's
    * replay of the whole chain is what "cell-exact" means here.
    *
    * 100 TB shape: the four composed plans' shapes, unchanged (each
    * pinned in its operator scaladoc); the chain is linear — no
    * stage joins back to a pre-scrub frame except the O(1)-column
    * lang attach, and each scrub's rebuilt text feeds the next stage
    * as a plain column, so Catalyst pipelines the whole thing as one
    * DAG with no corpus-sized side state. */
  val p54: QueryDef = QueryDef(
    "p54_curation_compose",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val sc1 = Dedup.decontaminationScrub(docs, "text", 8, "doc_id % 97 = 0")
        .selectExpr("doc_id", "text_scrubbed AS text")
      val sc2 = Dedup.exactSubstrScrub(sc1, "text", 8)
        .selectExpr("doc_id", "text_scrubbed AS text")
      val gated = TextOps.repetitionGates(sc2, "text")
        .filter(!col("flagged"))
        .select(col("doc_id"), col("n_tokens"))
      val sized = docs.select(col("doc_id"), col("lang"))
        .join(gated, Seq("doc_id"))
      Packing.packGreedy(sized, "lang", "doc_id", "n_tokens", budget = 200L)
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH RECURSIVE
      -- stage 1: p52 span decontamination (k = 8, eval = doc_id % 97 = 0)
      tk1 AS (SELECT doc_id, doc_id % 97 = 0 AS is_eval,
               ${DuckOps.tokens("text")} AS t FROM documents),
      hx1 AS (SELECT doc_id, is_eval, t, list_transform(${DuckOps.shingles("t", 8)},
               s -> ${DuckOps.strHash60("s")}) AS hs FROM tk1),
      occ1 AS (SELECT doc_id, is_eval, unnest(list_transform(range(1, len(hs) + 1),
              i -> {'pos': i, 'h': hs[i]}), recursive := true) FROM hx1),
      eh1 AS (SELECT DISTINCT h FROM occ1 WHERE is_eval),
      cov1 AS (SELECT occ1.doc_id, list_sort(list(CAST(occ1.pos AS BIGINT))) AS cov
              FROM occ1 JOIN eh1 USING (h) WHERE NOT occ1.is_eval
              GROUP BY occ1.doc_id),
      j1 AS (SELECT hx1.doc_id, t, coalesce(cov, []::BIGINT[]) AS cov
            FROM hx1 LEFT JOIN cov1 USING (doc_id) WHERE NOT hx1.is_eval),
      sc1 AS (SELECT doc_id, list_transform(list_filter(range(1, len(t) + 1),
              p -> len(list_filter(cov, i -> i <= p AND i > p - 8)) = 0),
              p -> t[p]) AS t
            FROM j1),
      -- stage 2: d32 exact-substring scrub (k = 8) over the scrubbed train
      hx2 AS (SELECT doc_id, t, list_transform(${DuckOps.shingles("t", 8)},
               s -> ${DuckOps.strHash60("s")}) AS hs FROM sc1),
      e2 AS (SELECT doc_id, unnest(list_transform(range(1, len(hs) + 1),
              i -> {'pos': i, 'sgl': hs[i]}), recursive := true) FROM hx2),
      r2 AS (SELECT doc_id, pos,
              row_number() OVER (PARTITION BY sgl ORDER BY doc_id, pos) AS rn,
              min(doc_id) OVER (PARTITION BY sgl)
                <> max(doc_id) OVER (PARTITION BY sgl) AS xd
            FROM e2),
      cov2 AS (SELECT doc_id, list_sort(list(CAST(pos AS BIGINT))) AS cov
              FROM r2 WHERE rn >= 2 AND xd GROUP BY doc_id),
      j2 AS (SELECT hx2.doc_id, t, coalesce(cov, []::BIGINT[]) AS cov
            FROM hx2 LEFT JOIN cov2 USING (doc_id)),
      sc2 AS (SELECT doc_id, list_transform(list_filter(range(1, len(t) + 1),
              p -> len(list_filter(cov, i -> i <= p AND i > p - 8)) = 0),
              p -> t[p]) AS t
            FROM j2),
      -- stage 3: t48 Gopher repetition gates over the POST-scrub text
      hx3 AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n,
               list_transform(${DuckOps.shingles("t", 2)},
                 s -> ${DuckOps.strHash60("s")}) AS h2,
               list_transform(${DuckOps.shingles("t", 3)},
                 s -> ${DuckOps.strHash60("s")}) AS h3 FROM sc2),
      e32 AS (SELECT doc_id, unnest(h2) AS h FROM hx3),
      c32 AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS top2_count FROM
              (SELECT doc_id, h, count(*) AS c FROM e32 GROUP BY 1, 2)
             GROUP BY 1),
      e33 AS (SELECT doc_id, unnest(list_transform(range(1, len(h3) + 1),
              i -> {'pos': i, 'h': h3[i]}), recursive := true) FROM hx3),
      r33 AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos,
               count(*) OVER (PARTITION BY doc_id, h) AS cnt FROM e33),
      cov3 AS (SELECT doc_id, list_sort(list(pos)) AS cov FROM r33
              WHERE cnt >= 2 GROUP BY 1),
      j3 AS (SELECT hx3.doc_id, hx3.n,
              coalesce(c32.top2_count, 0) AS top2_count,
              coalesce(cov3.cov, []::BIGINT[]) AS cov
            FROM hx3 LEFT JOIN c32 USING (doc_id) LEFT JOIN cov3 USING (doc_id)),
      k3 AS (SELECT doc_id, n, top2_count,
              n - CAST(len(list_filter(range(1, n + 1),
                p -> len(list_filter(cov, i -> i <= p AND i > p - 3)) = 0))
                AS BIGINT) AS dup3_cov_tokens
            FROM j3),
      m3 AS (SELECT doc_id, n AS n_tokens,
              CASE WHEN n < 2 THEN 0
                ELSE (top2_count * 1000000) // (n - 1) END AS top2_share_micro,
              CASE WHEN n = 0 THEN 0
                ELSE (dup3_cov_tokens * 1000000) // n END AS dup3_cov_micro
            FROM k3),
      -- stage 4: p53 per-language greedy packing of the gated survivors
      gated AS MATERIALIZED (
        SELECT d.lang, m3.doc_id, m3.n_tokens,
          row_number() OVER (PARTITION BY d.lang ORDER BY m3.doc_id) AS rn
        FROM m3 JOIN documents d USING (doc_id)
        WHERE NOT (m3.top2_share_micro > 200000 OR m3.dup3_cov_micro > 300000)),
      packed AS (
        SELECT lang, doc_id, n_tokens, rn, CAST(0 AS BIGINT) AS bin_id,
          n_tokens AS fill_after
        FROM gated WHERE rn = 1
        UNION ALL
        SELECT o.lang, o.doc_id, o.n_tokens, o.rn,
          CASE WHEN p.fill_after + o.n_tokens > 200 THEN p.bin_id + 1
               ELSE p.bin_id END,
          CASE WHEN p.fill_after + o.n_tokens > 200 THEN o.n_tokens
               ELSE p.fill_after + o.n_tokens END
        FROM packed p JOIN gated o ON o.lang = p.lang AND o.rn = p.rn + 1)
      SELECT lang, doc_id, n_tokens, bin_id, fill_after
      FROM packed ORDER BY doc_id"""))
}
