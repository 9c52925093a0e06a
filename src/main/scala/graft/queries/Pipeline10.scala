package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Curate, LanguageModel, Retrieval, Similarity, Storage}

/** Round-10 additions: fit-once/serve-many artifacts for the two
  * round-9 trained surfaces that still refit per call — the BM25
  * postings index ([[graft.operators.Retrieval.fitPostings]]) and the
  * bigram fluency model
  * ([[graft.operators.LanguageModel.fitBigramModel]]) — completing
  * the d07/t16 artifact discipline across every trained operator.
  */
object Pipeline10 {

  def all: Seq[QueryDef] = Seq(t21, t22, t23, p19)

  /** shared DuckDB index CTEs for the BM25 oracles (the t19 pipeline
    * verbatim: tokenize, postings, document frequency, totals). */
  private val bm25IndexCtes: String =
    s"""tk AS (SELECT doc_id, ${DuckOps.tokens("text")} AS t FROM documents),
      d AS (SELECT doc_id, t, CAST(len(t) AS BIGINT) AS dl FROM tk WHERE len(t) > 0),
      tf AS (SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
             FROM (SELECT doc_id, dl, unnest(t) AS term FROM d) GROUP BY 1, 2, 3),
      dft AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS tt FROM d)"""

  /** one query batch (docs with doc_id % 100 = `m` as keyword
    * queries) scored + top-5-ranked against the shared index CTEs —
    * the t19 scoring tail, parameterized on the batch selector. */
  private def bm25BatchCtes(m: Int): String =
    s"""qt$m AS (SELECT doc_id AS q_id, unnest(list_sort(list_distinct(t))[1:6]) AS term
             FROM d WHERE doc_id % 100 = $m AND doc_id < 5000),
      rc$m AS (SELECT qt.q_id, tf.doc_id,
               CAST(2 * tot.n - 2 * dft.df + 1 AS DOUBLE) / CAST(2 * dft.df + 1 AS DOUBLE) AS r,
               CAST(22 * tf.tf * tot.tt AS DOUBLE) /
                 CAST(10 * tf.tf * tot.tt + 3 * tot.tt + 9 * tf.dl * tot.n AS DOUBLE) AS core
             FROM qt$m qt JOIN dft ON qt.term = dft.term
                  JOIN tf ON qt.term = tf.term, tot),
      sc$m AS (SELECT q_id, doc_id,
               CAST(round((2 * (r - 1) / (r + 1)) * core * 1000000) AS BIGINT) AS s_micro
             FROM rc$m),
      agg$m AS (SELECT q_id, doc_id, CAST(sum(s_micro) AS BIGINT) AS score_micro,
                CAST(count(*) AS BIGINT) AS n_terms_hit
              FROM sc$m GROUP BY 1, 2),
      rk$m AS (SELECT CAST($m AS BIGINT) AS batch, q_id, doc_id, score_micro, n_terms_hit,
               CAST(row_number() OVER (PARTITION BY q_id
                 ORDER BY score_micro DESC, doc_id) AS BIGINT) AS rnk
             FROM agg$m)"""

  /** Fit-once/serve-many over the BM25 index artifact
    * ([[graft.operators.Retrieval.fitPostings]]): ONE postings build
    * (t19 refits the whole index inside every call) serves TWO query
    * batches (doc_id % 100 = 7 — t19's — and = 13) through
    * [[graft.operators.Retrieval.bm25TopKWith]]. At 100 TB the index
    * build is the corpus-sized job and query batches are arbitrarily
    * many — the d07/t16 artifact discipline applied to retrieval.
    * Lifecycle: both consumer plans are lazy reads of the artifact's
    * O(postings) checkpoint; the union result is eagerly checkpointed
    * BEFORE the artifact is released (a lazy result would read freed
    * blocks — the t16 lesson), machine-checked in CacheHygieneSpec.
    * The oracle replays the shared index once and each batch's
    * scoring tail term for term. */
  val t21: QueryDef = QueryDef(
    "t21_bm25_artifact",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val idx = Retrieval.fitPostings(docs, "text")
      try {
        def batch(m: Int) = Retrieval.bm25TopKWith(
          idx,
          docs.filter(col("doc_id") % 100 === m && col("doc_id") < 5000)
            .select(col("doc_id").as("q_id"), col("text")),
          "text", k = 5, maxQueryTerms = 6)
          .withColumn("batch", lit(m.toLong))
        Storage.checkpointed(
          batch(7).unionAll(batch(13))
            .select(col("batch"), col("q_id"), col("rnk"), col("doc_id"),
              col("score_micro"), col("n_terms_hit"))
            .orderBy(col("batch"), col("q_id"), col("rnk")))
      } finally idx.release()
    },
    Some(s"""WITH $bm25IndexCtes,
      ${bm25BatchCtes(7)},
      ${bm25BatchCtes(13)}
      SELECT batch, q_id, rnk, doc_id, score_micro, n_terms_hit FROM rk7 WHERE rnk <= 5
      UNION ALL
      SELECT batch, q_id, rnk, doc_id, score_micro, n_terms_hit FROM rk13 WHERE rnk <= 5
      ORDER BY batch, q_id, rnk"""))

  /** Fit-once/serve-many over the bigram fluency model
    * ([[graft.operators.LanguageModel.fitBigramModel]], B = 4096):
    * the model is fit ONCE on the FULL corpus (one pass building both
    * count tables — t20's inline plan walks the corpus once per
    * table) and scores TWO held-out-style slices
    * (doc_id % 5 = 0 and = 1) through
    * [[graft.operators.LanguageModel.bigramSurprisalWith]] — each
    * slice scored under the full-corpus distribution, NOT a refit on
    * the slice (the result provably differs from
    * `bigramSurprisal(slice)`: the counts are corpus-wide). 100 TB
    * shape: the fit is the corpus-sized job; each scoring batch is a
    * map-side broadcast join over its slice + one doc-keyed shuffle.
    * Result checkpointed before release (t16 lesson). The oracle fits
    * the same corpus-wide counts and replays both slices' scoring. */
  val t22: QueryDef = QueryDef(
    "t22_lm_artifact",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val model = LanguageModel.fitBigramModel(docs, "text", 4096)
      try {
        def slice(m: Int) = LanguageModel.bigramSurprisalWith(
          model, docs.filter(col("doc_id") % 5 === m), "text")
          .withColumn("slice", lit(m.toLong))
        Storage.checkpointed(
          slice(0).unionAll(slice(1))
            .select(col("slice"), col("doc_id"), col("n_bigrams"),
              col("surprisal_micro"), col("mean_inv_micro"))
            .orderBy(col("slice"), col("doc_id")))
      } finally model.release()
    },
    Some(s"""WITH tk AS (SELECT doc_id, ${DuckOps.tokens("text")} AS t FROM documents),
      sh AS (SELECT doc_id, unnest(${DuckOps.shingles("t", 2)}) AS s FROM tk),
      g AS (SELECT doc_id,
              ${DuckOps.strHash("split_part(s, ' ', 1)")} % 4096 AS ctx_b,
              ${DuckOps.strHash("s")} % 4096 AS big_b
            FROM sh),
      cc AS (SELECT ctx_b, CAST(count(*) AS BIGINT) AS cc FROM g GROUP BY 1),
      cb AS (SELECT big_b, CAST(count(*) AS BIGINT) AS cb FROM g GROUP BY 1),
      sg AS (SELECT doc_id, ctx_b, big_b FROM g WHERE doc_id % 5 IN (0, 1)),
      sc AS (SELECT sg.doc_id,
               CAST(round(CAST(COALESCE(cc.cc, 0) + 4096 AS DOUBLE)
                 / CAST(COALESCE(cb.cb, 0) + 1 AS DOUBLE)
                 * 1000000) AS BIGINT) AS inv_micro
             FROM sg LEFT JOIN cc USING (ctx_b) LEFT JOIN cb USING (big_b)),
      pd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
               CAST(sum(inv_micro) AS BIGINT) AS surprisal_micro
             FROM sc GROUP BY 1)
      SELECT CAST(d.doc_id % 5 AS BIGINT) AS slice, d.doc_id,
        COALESCE(pd.n_bigrams, CAST(0 AS BIGINT)) AS n_bigrams,
        COALESCE(pd.surprisal_micro, CAST(0 AS BIGINT)) AS surprisal_micro,
        CASE WHEN COALESCE(pd.n_bigrams, 0) = 0 THEN CAST(0 AS BIGINT)
             ELSE pd.surprisal_micro // pd.n_bigrams END AS mean_inv_micro
      FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id
      WHERE d.doc_id % 5 IN (0, 1)
      ORDER BY slice, d.doc_id"""))

  /** Hybrid retrieval via reciprocal-rank fusion
    * ([[graft.operators.Retrieval.rrfFuse]], Cormack et al. SIGIR
    * 2009): the keyword ranking (t19's BM25, top-10) and the
    * embedding ranking
    * ([[graft.operators.Similarity.cosineTopKFor]], brute exact
    * top-10 — vec_id is doc-aligned by testdata construction) for the
    * SAME query set (doc_id % 100 = 7) fuse by summed exact-integer
    * 1e6 div (60 + rank) contributions, re-ranked top-5 — the
    * standard dense+sparse combination a retrieval-augmented dataset
    * build runs, with no score calibration across the two scales.
    * 100 TB shape: both input rankings are top-k bounded before the
    * fusion shuffle ever sees them; the fusion itself touches
    * O(queries · 20) rows. The oracle replays both rankings and every
    * floor-divided contribution. */
  val t23: QueryDef = QueryDef(
    "t23_hybrid_rrf",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val qs = docs.filter(col("doc_id") % 100 === 7 && col("doc_id") < 5000)
        .select(col("doc_id").as("q_id"), col("text"))
      val bm = Retrieval.bm25TopK(docs, "text", qs, "text", k = 10, maxQueryTerms = 6)
        .select(col("q_id"), col("doc_id"), col("rnk"))
      val cos = Similarity.cosineTopKFor(Tables.embeddings(s, d),
        "vec_id % 100 = 7 AND vec_id < 2000", 10)
        .select(col("q_id"), col("n_id").as("doc_id"), col("rk").as("rnk"))
      Retrieval.rrfFuse(Seq(bm, cos), k0 = 60, k = 5)
        .orderBy(col("q_id"), col("rnk"))
    },
    Some(s"""WITH $bm25IndexCtes,
      ${bm25BatchCtes(7)},
      ce AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
             FROM embeddings),
      cn AS (SELECT vec_id, v, ${DuckOps.norm2("v")} AS nrm FROM ce),
      cp AS (SELECT q.vec_id AS q_id, c.vec_id AS n_id,
               ${DuckOps.dot("q.v", "c.v")} / (sqrt(q.nrm) * sqrt(c.nrm)) AS cos
             FROM cn q JOIN cn c ON q.vec_id % 100 = 7 AND q.vec_id < 2000
               AND c.vec_id <> q.vec_id),
      ck AS (SELECT q_id, n_id,
               row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rk
             FROM cp),
      un AS (SELECT q_id, doc_id,
               CAST(1000000 // (60 + rnk) AS BIGINT) AS contrib
             FROM rk7 WHERE rnk <= 10
             UNION ALL
             SELECT q_id, n_id AS doc_id,
               CAST(1000000 // (60 + rk) AS BIGINT) AS contrib
             FROM ck WHERE rk <= 10),
      f AS (SELECT q_id, doc_id, CAST(sum(contrib) AS BIGINT) AS rrf_micro,
              CAST(count(*) AS BIGINT) AS n_lists
            FROM un GROUP BY 1, 2),
      fr AS (SELECT q_id, doc_id, rrf_micro, n_lists,
               CAST(row_number() OVER (PARTITION BY q_id
                 ORDER BY rrf_micro DESC, doc_id) AS BIGINT) AS rnk
             FROM f)
      SELECT q_id, rnk, doc_id, rrf_micro, n_lists
      FROM fr WHERE rnk <= 5 ORDER BY q_id, rnk"""))

  /** Deterministic salted hash split
    * ([[graft.operators.Curate.hashSplit]], 80/10/10 per-mille): the
    * reproducible, engine-independent, growth-stable train/val/test
    * assignment — pure projection, zero shuffle (PlanAuditSpec).
    * The oracle replays the polynomial hash, the mod-1000 bucket,
    * and both thresholds. */
  val p19: QueryDef = QueryDef(
    "p19_hash_split",
    (s, d) => Curate.hashSplit(Tables.documents(s, d), "doc_id", "graft",
        trainPerMille = 800, valPerMille = 100)
      .orderBy(col("doc_id")),
    Some(s"""WITH h AS (SELECT doc_id,
               (((${DuckOps.strHash60("('graft:' || CAST(doc_id AS VARCHAR))")} % 2147483648)
                 * 2654435761) % 2147483648) % 1000 AS bucket
             FROM documents)
      SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
        CASE WHEN bucket < 800 THEN 'train'
             WHEN bucket < 900 THEN 'val'
             ELSE 'test' END AS split
      FROM h ORDER BY doc_id"""))
}
