package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Importance

/** Round-9 additions, part 2: data-selection operators a training-data
  * pipeline runs between curation and tokenization — DSIR-style
  * importance weighting (fit on a target corpus, transform the raw
  * corpus), a GD-trained quality scorer, and the Bloom-prefiltered
  * exact decontamination path.
  */
object Pipeline7 {

  def all: Seq[QueryDef] = Seq(p14)

  /** DSIR importance-weighted selection
    * ([[graft.operators.Importance.dsirSelect]], arXiv:2302.03169):
    * hashed-bigram (n=2, the paper's feature) unigram models fit on
    * the English subset as the target distribution vs the whole
    * corpus as raw, 512 hash buckets, keep the top quarter by
    * likelihood-ratio score (k-th-VALUE threshold, boundary ties all
    * kept). The oracle replays the exact arithmetic — the Padé
    * log-surrogate keeps every float op IEEE-exact in both engines
    * (no libm ln), and per-doc scores are exact integer sums. */
  val p14: QueryDef = QueryDef(
    "p14_dsir_selection",
    (s, d) => {
      val docs = Tables.documents(s, d)
      Importance.dsirSelect(docs, docs.filter(col("lang") === "en"), "text",
          n = 2, buckets = 512, num = 1, den = 4)
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH tk AS (SELECT doc_id, ${DuckOps.tokens("text")} AS t FROM documents),
      gr AS (SELECT doc_id, unnest(list_transform(${DuckOps.shingles("t", 2)},
               s -> ${DuckOps.strHash("s")} % 512)) AS bkt FROM tk),
      raw AS (SELECT bkt, CAST(count(*) AS BIGINT) AS cr FROM gr GROUP BY bkt),
      tgt AS (SELECT bkt, CAST(count(*) AS BIGINT) AS ct
              FROM gr JOIN documents USING (doc_id) WHERE lang = 'en' GROUP BY bkt),
      tot AS (SELECT (SELECT CAST(coalesce(sum(cr), 0) AS BIGINT) FROM raw) AS nr,
                     (SELECT CAST(coalesce(sum(ct), 0) AS BIGINT) FROM tgt) AS nt),
      lam AS (SELECT bkt,
               CAST(round(((2 * (r - 1)) / (r + 1)) * 1000000) AS BIGINT) AS lam_micro
              FROM (SELECT bkt, pt / pr AS r FROM (
                SELECT raw.bkt,
                  (coalesce(ct, 0) + 1)::DOUBLE / (nt + 512)::DOUBLE AS pt,
                  (cr + 1)::DOUBLE / (nr + 512)::DOUBLE AS pr
                FROM raw LEFT JOIN tgt ON raw.bkt = tgt.bkt, tot))),
      sc AS (SELECT d.doc_id,
               CAST(coalesce(p.n_grams, 0) AS BIGINT) AS n_grams,
               CAST(coalesce(p.score_micro, 0) AS BIGINT) AS score_micro
             FROM documents d LEFT JOIN (
               SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
                      CAST(sum(lam_micro) AS BIGINT) AS score_micro
               FROM gr JOIN lam USING (bkt) GROUP BY doc_id) p USING (doc_id)),
      kk AS (SELECT (count(*) * 1 + 3) // 4 AS kv FROM sc),
      th AS (SELECT max(score_micro) AS s0 FROM (
               SELECT score_micro, sum(c) OVER (ORDER BY score_micro DESC) AS cum
               FROM (SELECT score_micro, count(*) AS c FROM sc GROUP BY score_micro))
             WHERE cum >= (SELECT kv FROM kk))
      SELECT doc_id, n_grams, score_micro,
             score_micro >= (SELECT s0 FROM th) AS kept
      FROM sc ORDER BY doc_id"""))
}
