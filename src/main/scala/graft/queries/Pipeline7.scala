package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Decontaminate, Importance, QualityModel, TextOps}

/** Round-9 additions, part 2: data-selection operators a training-data
  * pipeline runs between curation and tokenization — DSIR-style
  * importance weighting (fit on a target corpus, transform the raw
  * corpus), a GD-trained quality scorer, and the Bloom-prefiltered
  * exact decontamination path.
  */
object Pipeline7 {

  def all: Seq[QueryDef] = Seq(p14, t17, p15)

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

  /** GD-trained linear quality scorer
    * ([[graft.operators.QualityModel]]): 4 batch-gradient steps on
    * squared loss over (stop-ratio, TTR, saturating length) with
    * "lang = 'en'" as the heuristic label, then a map-only scoring
    * pass under the trained weights. The oracle UNROLLS the training
    * loop as a CTE chain replaying the exact quantize -> integer-sum
    * -> divide -> halve update, so the hash pins the TRAINED WEIGHTS
    * (emitted as micro-quantized constant columns) as well as every
    * per-doc score. */
  val t17: QueryDef = QueryDef(
    "t17_quality_trained",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val w = QualityModel.fit(docs, "text", "lang = 'en'", steps = 4)
      QualityModel.score(docs, "text", "lang = 'en'", w).orderBy(col("doc_id"))
    },
    Some(qualityTrainedSql(4)))

  /** Bloom-prefiltered exact decontamination
    * ([[graft.operators.Decontaminate.cleanDocs]]): drop every corpus
    * doc (doc_id >= 50) sharing a distinct 5-gram with the benchmark
    * slice (doc_id < 50) — t05's contamination semantics flipped to
    * the keep-side, executed through the Bloom plan (2^17-bit image,
    * 3 probes): clean docs are proven clean by a map-only probe and
    * never enter a join; only probe-positives reach the exact verify
    * join. The oracle checks the exact anti-join semantics — a Bloom
    * with any FPP must produce the identical kept set, which is
    * precisely the operator's contract (DecontaminateSpec pins the
    * plan shape and the false-positive/no-false-negative behavior). */
  val p15: QueryDef = QueryDef(
    "p15_bloom_decontaminate",
    (s, d) => {
      val docs = Tables.documents(s, d)
      Decontaminate.cleanDocs(
          docs.filter(col("doc_id") >= 50), docs.filter(col("doc_id") < 50),
          "text", n = 5, m = 1 << 17, k = 3)
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH tk AS (SELECT doc_id, ${DuckOps.tokens("text")} AS t FROM documents),
      sh AS (SELECT doc_id, list_distinct(list_transform(${DuckOps.shingles("t", 5)},
               x -> ${DuckOps.strHash60("x")})) AS hs FROM tk),
      bh AS (SELECT DISTINCT unnest(hs) AS sgl FROM sh WHERE doc_id < 50),
      bad AS (SELECT DISTINCT s.doc_id FROM
                (SELECT doc_id, unnest(hs) AS sgl FROM sh WHERE doc_id >= 50) s
                JOIN bh USING (sgl))
      SELECT doc_id, CAST(len(hs) AS BIGINT) AS n_shingles FROM sh
      WHERE doc_id >= 50 AND doc_id NOT IN (SELECT doc_id FROM bad)
      ORDER BY doc_id"""))

  /** The t17 oracle: featurize, then `steps` unrolled GD CTEs, then
    * score. Generated (not hand-unrolled) so the step count provably
    * matches the Spark side's. */
  private def qualityTrainedSql(steps: Int): String = {
    // residual under the step-k weights; op order mirrors the Spark
    // Column expression (left-associated sum of products, then - y)
    val e = "((((w0 + (x1 * w1)) + (x2 * w2)) + (x3 * w3)) - y)"
    def gsum(term: String) =
      s"CAST(sum(CAST(round(($term) * 1000000) AS BIGINT)) AS DOUBLE)"
    val stepCtes = (1 to steps).map { k =>
      s"""g$k AS (SELECT ${gsum(e)} AS g0d, ${gsum(s"x1 * $e")} AS g1d,
             ${gsum(s"x2 * $e")} AS g2d, ${gsum(s"x3 * $e")} AS g3d,
             CAST(count(*) AS BIGINT) AS nd FROM ft, ws${k - 1}),
      ws$k AS (SELECT w0 - g0d / 1000000 / nd / 2 AS w0,
                      w1 - g1d / 1000000 / nd / 2 AS w1,
                      w2 - g2d / 1000000 / nd / 2 AS w2,
                      w3 - g3d / 1000000 / nd / 2 AS w3 FROM ws${k - 1}, g$k)"""
    }.mkString(",\n      ")
    s"""WITH tk AS (SELECT doc_id, ${DuckOps.tokens("text")} AS t,
             CASE WHEN lang = 'en' THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END AS y
           FROM documents),
      ft AS MATERIALIZED (SELECT doc_id, y,
             CASE WHEN nt = 0 THEN CAST(0 AS DOUBLE) ELSE sh::DOUBLE / nt::DOUBLE END AS x1,
             CASE WHEN nt = 0 THEN CAST(0 AS DOUBLE) ELSE ntypes::DOUBLE / nt::DOUBLE END AS x2,
             nt::DOUBLE / (nt + 100)::DOUBLE AS x3
           FROM (SELECT doc_id, y, CAST(len(t) AS BIGINT) AS nt,
                   CAST(len(list_distinct(t)) AS BIGINT) AS ntypes,
                   CAST(${DuckOps.stopHits("t", TextOps.StopEn)} AS BIGINT) AS sh
                 FROM tk)),
      ws0 AS (SELECT CAST(0 AS DOUBLE) AS w0, CAST(0 AS DOUBLE) AS w1,
                     CAST(0 AS DOUBLE) AS w2, CAST(0 AS DOUBLE) AS w3),
      $stepCtes
      SELECT doc_id, CAST(y AS BIGINT) AS y_label,
        CAST(round(((((w0 + (x1 * w1)) + (x2 * w2)) + (x3 * w3))) * 1000000) AS BIGINT) AS score_micro,
        CAST(round(w0 * 1000000) AS BIGINT) AS w0_micro,
        CAST(round(w1 * 1000000) AS BIGINT) AS w1_micro,
        CAST(round(w2 * 1000000) AS BIGINT) AS w2_micro,
        CAST(round(w3 * 1000000) AS BIGINT) AS w3_micro
      FROM ft, ws$steps ORDER BY doc_id"""
  }
}
