package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.LanguageModel

/** Round-13 additions, part 71+: the CCNet bucketing step itself —
  * per-language LM fit + head/middle/tail fluency thirds (the one
  * published curation stage between t20's corpus-wide fluency score
  * and p10's corpus-wide quality quartiles that the surface still
  * lacked).
  */
object Pipeline92 {

  def all: Seq[QueryDef] = Seq(p50, s39, p51)

  /** Soft dedup — DOWN-WEIGHT duplicates instead of dropping them
    * (SoftDedup, He et al., ACL 2024, arXiv:2407.04752, public
    * method; "commonness" here is the exact-dup cluster size, the
    * d01 fingerprint face): every copy in a cluster of size c gets
    * sampling weight 1/c (`w_micro = 1e6 div c`), so each distinct
    * text contributes ~one effective copy while NO document is
    * removed — the curation knob between p49's hard keep-best (weight
    * ∈ {0, 1}) and p48's source-level dup-mass correction. Per
    * source: docs, docs-in-dup-clusters, raw vs EFFECTIVE token mass
    * (`eff_tokens_micro = Σ n_toks·w_micro` — exact: tokens·1e6 stays
    * far inside Int64 per source), and the retention ratio.
    *
    * 100 TB shape: one map-only (fp, n_toks) projection, ONE
    * fp-keyed window for the cluster size (fine-grained 60-bit
    * keys — the p49 shape), one source-keyed partial agg. */
  val p51: QueryDef = QueryDef(
    "p51_soft_dedup_weights",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      import graft.operators.TextOps
      Tables.documents(s, d).selectExpr("doc_id", "source",
          s"${TextOps.strHash60("text")} AS fp",
          s"cast(size(${TextOps.tokens("text")}) as bigint) AS n_toks")
        .withColumn("csize", count(lit(1)).over(Window.partitionBy(col("fp"))))
        .selectExpr("source", "n_toks", "csize", "1000000L div csize AS w_micro")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(expr("cast(csize >= 2 as bigint)")).as("n_dup_docs"),
          sum(col("n_toks")).as("raw_tokens"),
          sum(expr("n_toks * w_micro")).as("eff_tokens_micro"))
        .selectExpr("source", "n_docs", "n_dup_docs", "raw_tokens",
          "eff_tokens_micro",
          "if(raw_tokens = 0, 1000000L, eff_tokens_micro div raw_tokens)" +
            " AS retention_micro")
        .orderBy(col("source"))
    },
    Some(s"""WITH sc AS (SELECT doc_id, source, ${DuckOps.strHash60("text")} AS fp,
               CAST(len(${DuckOps.tokens("text")}) AS BIGINT) AS n_toks
             FROM documents),
      w AS (SELECT source, n_toks,
              count(*) OVER (PARTITION BY fp) AS csize FROM sc),
      m AS (SELECT source, n_toks, csize, 1000000 // csize AS w_micro FROM w)
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(CASE WHEN csize >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
        CAST(sum(n_toks) AS BIGINT) AS raw_tokens,
        CAST(sum(n_toks * w_micro) AS BIGINT) AS eff_tokens_micro,
        CAST(CASE WHEN sum(n_toks) = 0 THEN 1000000
          ELSE sum(n_toks * w_micro) // sum(n_toks) END AS BIGINT) AS retention_micro
      FROM m GROUP BY 1 ORDER BY 1"""))

  /** Semantic eval-contamination audit
    * ([[graft.operators.Similarity.evalContamination]] — the
    * embedding-space face of t37/p46's n-gram leakage gates; exact
    * semantics, tie rule, zero-norm exclusion, and the 100 TB shape
    * are pinned in the operator scaladoc). Eval = the pinned bounded
    * slice vec_id < 50 (the t37 convention); τ = 0.95 — the
    * near-verbatim leak threshold; the base corpus sits well below it
    * (max ≈ 0.49 at sf0.01) while the scaled slices' perturbed
    * near-copies of eval vectors cross it, so the flag is exercised
    * exactly where contamination is real. The oracle replays the
    * norm-filtered pair cosines, the micro quantization, the max, and
    * the smallest-id tie-break. */
  val s39: QueryDef = QueryDef(
    "s39_semantic_contamination",
    (s, d) => graft.operators.Similarity
      .evalContamination(Tables.embeddings(s, d), "vec_id < 50", 950000L)
      .orderBy(col("vec_id")),
    Some(s"""WITH ce AS (SELECT vec_id,
               list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
      cn0 AS (SELECT vec_id, v, ${DuckOps.norm2("v")} AS nrm FROM ce),
      cn AS (SELECT * FROM cn0 WHERE nrm > 0),
      ev AS (SELECT vec_id AS e_id, v AS evv, nrm AS en FROM cn WHERE vec_id < 50),
      tr AS (SELECT vec_id, v, nrm FROM cn WHERE NOT (vec_id < 50)),
      sc AS (SELECT tr.vec_id, ev.e_id,
               CAST(round(${DuckOps.dot("tr.v", "ev.evv")}
                 / (sqrt(tr.nrm) * sqrt(ev.en)) * 1000000) AS BIGINT) AS cm
             FROM tr, ev),
      mx AS (SELECT vec_id, max(cm) AS max_cos_micro FROM sc GROUP BY 1),
      nn AS (SELECT sc.vec_id, min(sc.e_id) AS nn_eval_id
             FROM sc JOIN mx ON sc.vec_id = mx.vec_id AND sc.cm = mx.max_cos_micro
             GROUP BY 1)
      SELECT mx.vec_id, nn.nn_eval_id, mx.max_cos_micro,
        mx.max_cos_micro >= 950000 AS contaminated
      FROM mx JOIN nn ON mx.vec_id = nn.vec_id ORDER BY mx.vec_id"""))

  /** CCNet head/middle/tail buckets per language
    * ([[graft.operators.LanguageModel.ccnetBuckets]] — Wenzek et al.
    * 2019 §4.3; per-language bigram-surrogate model, type-1 tertile
    * cuts, value-based assignment; exact semantics and the 100 TB
    * shape are pinned in the operator scaladoc). Docs with < 2 tokens
    * land in 'unscored'. The summary reports, per (language, bucket):
    * doc count, bigram mass, and the score range the bucket spans.
    * The oracle replays the per-language count tables, every
    * micro-quantized inverse-probability, the rank-⌈n/3⌉/⌈2n/3⌉ cut
    * lookup, and the value-based assignment. */
  val p50: QueryDef = QueryDef(
    "p50_ccnet_buckets",
    (s, d) => LanguageModel.ccnetBuckets(Tables.documents(s, d), "text", "lang", 4096)
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_bigrams")).as("n_bigrams"),
        min(col("mean_inv_micro")).as("min_mean_inv_micro"),
        max(col("mean_inv_micro")).as("max_mean_inv_micro"))
      .orderBy(col("lang"), col("bucket")),
    Some(s"""WITH tk AS (SELECT doc_id, lang, ${DuckOps.tokens("text")} AS t
               FROM documents),
      sh AS (SELECT doc_id, lang, unnest(${DuckOps.shingles("t", 2)}) AS s FROM tk),
      g AS (SELECT doc_id, lang,
              ${DuckOps.strHash("split_part(s, ' ', 1)")} % 4096 AS ctx_b,
              ${DuckOps.strHash("s")} % 4096 AS big_b
            FROM sh),
      cc AS (SELECT lang, ctx_b, CAST(count(*) AS BIGINT) AS cc FROM g GROUP BY 1, 2),
      cb AS (SELECT lang, big_b, CAST(count(*) AS BIGINT) AS cb FROM g GROUP BY 1, 2),
      sc AS (SELECT g.doc_id, g.lang,
               CAST(round(CAST(cc.cc + 4096 AS DOUBLE)
                 / CAST(cb.cb + 1 AS DOUBLE) * 1000000) AS BIGINT) AS inv_micro
             FROM g JOIN cc USING (lang, ctx_b) JOIN cb USING (lang, big_b)),
      pd AS (SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_bigrams,
               CAST(sum(inv_micro) AS BIGINT) AS s FROM sc GROUP BY 1, 2),
      sd AS (SELECT doc_id, lang, n_bigrams, s // n_bigrams AS mean_inv_micro
             FROM pd),
      n AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM sd GROUP BY 1),
      rk AS (SELECT lang, mean_inv_micro,
               row_number() OVER (PARTITION BY lang
                 ORDER BY mean_inv_micro, doc_id) AS r
             FROM sd),
      cuts AS (SELECT rk.lang,
                 max(CASE WHEN r = (n + 2) // 3 THEN mean_inv_micro END) AS cut1,
                 max(CASE WHEN r = (2 * n + 2) // 3 THEN mean_inv_micro END) AS cut2
               FROM rk JOIN n USING (lang) GROUP BY 1),
      asn AS (SELECT sd.doc_id, sd.lang, sd.n_bigrams, sd.mean_inv_micro,
                CASE WHEN mean_inv_micro <= cut1 THEN 'head'
                     WHEN mean_inv_micro <= cut2 THEN 'middle'
                     ELSE 'tail' END AS bucket
              FROM sd JOIN cuts USING (lang)),
      allx AS (SELECT d.doc_id, d.lang,
                 coalesce(a.n_bigrams, 0) AS n_bigrams,
                 coalesce(a.mean_inv_micro, 0) AS mean_inv_micro,
                 coalesce(a.bucket, 'unscored') AS bucket
               FROM documents d LEFT JOIN asn a ON d.doc_id = a.doc_id)
      SELECT lang, bucket, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(n_bigrams) AS BIGINT) AS n_bigrams,
        CAST(min(mean_inv_micro) AS BIGINT) AS min_mean_inv_micro,
        CAST(max(mean_inv_micro) AS BIGINT) AS max_mean_inv_micro
      FROM allx GROUP BY 1, 2 ORDER BY 1, 2"""))
}
