package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ranked full-text retrieval over a document corpus — the search
  * layer a training-data pipeline needs for eval-set mining, targeted
  * corpus probes, and retrieval-augmented dataset construction
  * (the keyword-side complement of the embedding operators in
  * [[Similarity]]).
  *
  * Scoring is BM25 (Robertson & Spärck Jones probabilistic relevance,
  * public method) with the standard k1 = 1.2, b = 0.75 — both exact
  * rationals (6/5, 3/4), so the term-frequency core collapses to a
  * single division of two exactly-representable integers:
  *
  *   tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
  *     = 22·tf·T / (10·tf·T + 3·T + 9·dl·N)
  *
  * with N docs and T total tokens (avgdl = T/N substituted through).
  *
  * Determinism contract (cell-exact across engines): the idf log is
  * replaced by its first-order Padé surrogate 2(r−1)/(r+1) on
  * r = (2N − 2·df + 1)/(2·df + 1) — monotone in r, same sign as
  * ln r, negative exactly when BM25's idf is (df > N/2) — the
  * [[Importance]] idiom: every floating-point step is a fixed
  * sequence of IEEE-exact ops (+, −, ×, ÷) on exactly-representable
  * integers, both engines round identically, and the per-term score
  * is micro-quantized so per-document totals are order-insensitive
  * exact BIGINT sums. (Exactness of the integer operands bounds
  * 22·tf·T < 2^53 — fine to ~10^13 corpus tokens; beyond that the
  * determinism harness would quantize T first.)
  *
  * 100 TB shape:
  *  - postings build: one explode + one (doc, term)-keyed partially
  *    aggregated shuffle; document-frequency table: one term-keyed
  *    partial agg; corpus totals: one O(1)-row aggregate, broadcast;
  *  - the query set is small by contract — query terms join the df
  *    table first (pruning the vocabulary to query terms), then the
  *    postings, all equi-joins;
  *  - per-(query, doc) totals: one partially aggregated shuffle;
  *    top-k: a per-query window (candidates per query are bounded by
  *    the query's posting lists, and queries parallelize across
  *    partitions).
  *  - Pure plan builder — lazy, no action, no driver state.
  */
object Retrieval {

  /** Top-k BM25 retrieval. `corpus` needs (`doc_id`, textCol);
    * `queries` needs (`q_id`, qTextCol). Query terms are the first
    * `maxQueryTerms` DISTINCT tokens in lexicographic order —
    * deterministic in both engines. Empty-token docs are excluded
    * from the index (they can match nothing); ties in score break by
    * ascending `doc_id`.
    *
    * Returns (`q_id`, `rnk`, `doc_id`, `score_micro`, `n_terms_hit`).
    */
  def bm25TopK(
      corpus: DataFrame,
      textCol: String,
      queries: DataFrame,
      qTextCol: String,
      k: Int,
      maxQueryTerms: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxQueryTerms >= 1, s"maxQueryTerms must be >= 1, got $maxQueryTerms")
    val docs = corpus
      .selectExpr("doc_id", s"${TextOps.tokens(textCol)} AS t")
      .selectExpr("doc_id", "t", "cast(size(t) as bigint) AS dl")
      .filter(col("dl") > 0)
    // dl rides the grouping key (functionally dependent on doc_id) so
    // no second join against the doc-length table is needed
    val tf = docs.selectExpr("doc_id", "dl", "explode(t) AS term")
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dft = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val tot = docs.agg(count(lit(1)).as("n"), sum(col("dl")).as("tt"))
    val qt = queries.selectExpr("q_id",
      s"explode(slice(array_sort(array_distinct(${TextOps.tokens(qTextCol)})), " +
        s"1, $maxQueryTerms)) AS term")
    val scored = qt
      .join(dft, Seq("term"))  // prune vocabulary to query terms first
      .join(tf, Seq("term"))
      .crossJoin(broadcast(tot))
      .selectExpr("q_id", "doc_id",
        "cast(2 * n - 2 * df + 1 as double) / cast(2 * df + 1 as double) AS r",
        "cast(22 * tf * tt as double) / " +
          "cast(10 * tf * tt + 3 * tt + 9 * dl * n as double) AS core")
      .selectExpr("q_id", "doc_id",
        "cast(round((2 * (r - 1) / (r + 1)) * core * 1000000) as bigint) AS s_micro")
      .groupBy(col("q_id"), col("doc_id"))
      .agg(sum(col("s_micro")).as("score_micro"), count(lit(1)).as("n_terms_hit"))
    import org.apache.spark.sql.expressions.Window
    scored
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("score_micro").desc, col("doc_id"))).cast("bigint"))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("doc_id"), col("score_micro"),
        col("n_terms_hit"))
  }
}
