package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** N-gram language-model fluency scoring — the CCNet-style "how
  * typical is this document of the corpus" filter (Wenzek et al.,
  * "CCNet: Extracting High Quality Monolingual Datasets from Web
  * Crawl Data", arXiv:1911.00359 — public method; CCNet uses a KenLM
  * 5-gram, this operator fits a hashed BIGRAM model distributed):
  * documents whose token transitions are improbable under a model fit
  * on the corpus itself are boilerplate, gibberish, or wrong-language
  * — the high-surprisal tail a pretraining pipeline drops or
  * down-weights.
  *
  * Model: add-one-smoothed conditional bigram probability over hashed
  * buckets,  p(w2 | w1) = (c(w1 w2) + 1) / (c(w1 ·) + B),
  * where both the bigram and its context hash into B buckets and
  * c(w1 ·) counts bigram INSTANCES with context w1 (doc-final tokens
  * are no one's context, exactly as in the chain rule).
  *
  * Determinism contract (cell-exact across engines): perplexity's
  * geometric mean needs ln/exp, whose libm implementations are not
  * correctly rounded — so the per-bigram score is the INVERSE
  * PROBABILITY 1/p = (c(w1 ·) + B) / (c(w1 w2) + 1), one IEEE-exact
  * division of exactly-representable integers, micro-quantized
  * immediately; document totals are exact BIGINT sums
  * (order-insensitive). The resulting mean-inverse-probability is the
  * HARMONIC-mean surrogate of perplexity: >= the geometric mean by
  * AM-GM, identically ordered on the extremes, and — unlike a Padé
  * fold — it does not saturate for rare transitions. Documented as a
  * surrogate, not sold as perplexity.
  *
  * 100 TB shape (the [[Importance]] template):
  *  - both count fits are B-bounded aggregations with map-side
  *    combine — the shuffle carries at most B rows per task;
  *  - both count tables are O(B) and BROADCAST: the scoring pass is
  *    a map-side join over the exploded corpus followed by ONE
  *    doc-keyed partially aggregated shuffle;
  *  - pure plan builder — lazy, no action, no driver state.
  */
object LanguageModel {

  /** Per-document fluency: (`doc_id`, `n_bigrams`,
    * `surprisal_micro` = Σ micro(1/p), `mean_inv_micro` =
    * surprisal_micro div n_bigrams). Docs with fewer than 2 tokens
    * have no bigrams and score 0. */
  def bigramSurprisal(corpus: DataFrame, textCol: String, buckets: Int): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    // explode_outer + post-Generate filter: a plain explode makes the
    // optimizer infer a size(...)>0 PRE-filter duplicating the whole
    // tokenize+shingle expression below the Generate (the t05 lesson)
    val grams = corpus
      .selectExpr("doc_id", s"${TextOps.tokens(textCol)} AS t")
      .selectExpr("doc_id",
        s"explode_outer(${TextOps.shingles("t", 2)}) AS s")
      .filter(col("s").isNotNull)
      .selectExpr("doc_id",
        s"${TextOps.strHash("substring_index(s, ' ', 1)")} % $buckets AS ctx_b",
        s"${TextOps.strHash("s")} % $buckets AS big_b")
    val cc = grams.groupBy(col("ctx_b")).agg(count(lit(1)).as("cc"))
    val cb = grams.groupBy(col("big_b")).agg(count(lit(1)).as("cb"))
    val perDoc = grams
      .join(broadcast(cc), Seq("ctx_b"))
      .join(broadcast(cb), Seq("big_b"))
      .selectExpr("doc_id",
        s"cast(round(cast(cc + $buckets as double) / cast(cb + 1 as double) " +
          "* 1000000) as bigint) AS inv_micro")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("inv_micro")).as("surprisal_micro"))
    corpus.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .selectExpr("doc_id",
        "coalesce(n_bigrams, cast(0 as bigint)) AS n_bigrams",
        "coalesce(surprisal_micro, cast(0 as bigint)) AS surprisal_micro")
      .selectExpr("doc_id", "n_bigrams", "surprisal_micro",
        "if(n_bigrams = 0, cast(0 as bigint), surprisal_micro div n_bigrams) AS mean_inv_micro")
  }
}
