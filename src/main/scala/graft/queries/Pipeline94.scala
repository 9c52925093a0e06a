package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Dedup, Packing, TextOps}

/** Round-14 additions, part 78: the decontamination SCRUB face
  * (VERDICT r13 #5) — the action half of the p46/t37/s39
  * contamination audits: remove every eval-overlapping ≥k-token span
  * from the TRAIN documents in place, the surgical alternative to
  * dropping whole documents — and the quality-gated packing face
  * (r13 #8's named candidate) composing t48's Gopher gates with
  * p03's sequence packing.
  */
object Pipeline94 {

  def all: Seq[QueryDef] = Seq(p52, p53)

  /** Train-side span decontamination scrub
    * ([[graft.operators.Dedup.decontaminationScrub]], k = 8, eval =
    * p46's `doc_id % 97 = 0` split): every ≥8-token window of a train
    * doc that appears verbatim anywhere in the eval set is scrubbed;
    * the rewritten text itself is cell-exact against the oracle's
    * replay of the hash election + coverage rebuild. Composes with
    * p46: after this rewrite, p46 over (scrubbed train ∪ eval) reports
    * zero contamination — pinned in ScrubSpec. */
  val p52: QueryDef = QueryDef(
    "p52_decontamination_scrub",
    (s, d) => Dedup.decontaminationScrub(Tables.documents(s, d), "text", 8,
        "doc_id % 97 = 0")
      .orderBy(col("doc_id")),
    Some(s"""WITH tk AS (SELECT doc_id, doc_id % 97 = 0 AS is_eval,
               ${DuckOps.tokens("text")} AS t FROM documents),
      hx AS (SELECT doc_id, is_eval, t, list_transform(${DuckOps.shingles("t", 8)},
               s -> ${DuckOps.strHash60("s")}) AS hs FROM tk),
      occ AS (SELECT doc_id, is_eval, unnest(list_transform(range(1, len(hs) + 1),
              i -> {'pos': i, 'h': hs[i]}), recursive := true) FROM hx),
      eh AS (SELECT DISTINCT h FROM occ WHERE is_eval),
      cov AS (SELECT occ.doc_id, list_sort(list(CAST(occ.pos AS BIGINT))) AS cov
              FROM occ JOIN eh USING (h) WHERE NOT occ.is_eval
              GROUP BY occ.doc_id),
      j AS (SELECT hx.doc_id, t, coalesce(cov, []::BIGINT[]) AS cov
            FROM hx LEFT JOIN cov USING (doc_id) WHERE NOT hx.is_eval),
      kp AS (SELECT doc_id, t, list_filter(range(1, len(t) + 1),
              p -> len(list_filter(cov, i -> i <= p AND i > p - 8)) = 0) AS kept
            FROM j)
      SELECT doc_id, CAST(len(t) AS BIGINT) AS n_before,
        CAST(len(kept) AS BIGINT) AS n_after,
        coalesce(array_to_string(list_transform(kept, p -> t[p]), ' '), '')
          AS text_scrubbed
      FROM kp ORDER BY doc_id"""))

  /** Quality-GATED sequence packing — the step a real training-data
    * build runs between filtering and tokenization: only documents
    * passing BOTH Gopher repetition gates (t48: top-2-gram share
    * ≤ 0.20 AND repeated-3-gram coverage ≤ 0.30) are packed, greedy
    * in-order per language at p03's budget (200 tokens). Flagged
    * docs consume no budget and appear in no bin — the composition
    * that keeps repetition-heavy boilerplate from diluting training
    * sequences. The oracle nests t48's full gate chain and replays
    * the greedy recurrence as a recursive CTE, so bin boundaries
    * shifted by every REMOVED doc are cell-exact.
    *
    * 100 TB shape: t48's audited per-doc aggregations + one
    * doc-keyed equi-join + packGreedy's single group shuffle with a
    * spillable sort and O(1) running state — nothing new beyond the
    * two composed plans. */
  val p53: QueryDef = QueryDef(
    "p53_gated_packing",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val gated = TextOps.repetitionGates(docs, "text")
        .filter(!col("flagged"))
        .select(col("doc_id"), col("n_tokens"))
      val sized = docs.select(col("doc_id"), col("lang"))
        .join(gated, Seq("doc_id"))
      Packing.packGreedy(sized, "lang", "doc_id", "n_tokens", budget = 200L)
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH RECURSIVE gated AS MATERIALIZED (
        SELECT d.lang, t.doc_id, t.n_tokens,
          row_number() OVER (PARTITION BY d.lang ORDER BY t.doc_id) AS rn
        FROM (${Pipeline91.t48.oracle.get}) t
        JOIN documents d USING (doc_id)
        WHERE NOT t.flagged),
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
