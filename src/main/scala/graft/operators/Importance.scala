package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DSIR-style importance-weighted data selection (Xie et al., "Data
  * Selection for Language Models via Importance Resampling",
  * arXiv:2302.03169 — public method): fit hashed n-gram unigram
  * models over a small TARGET corpus and the RAW corpus, weight every
  * raw document by its target/raw log-likelihood ratio, and keep the
  * top fraction.
  *
  * Determinism contract (the oracle hash-matches cell-exact): every
  * floating-point step is a fixed sequence of IEEE-exact operations
  * (+, -, *, /) on exactly-representable integers, which both Spark
  * and DuckDB round identically — no `ln`/`exp`, whose libm
  * implementations are NOT correctly-rounded and may differ between
  * engines in the last ulp. The per-bucket log-likelihood ratio
  * ln(r) is therefore replaced by its first-order Padé surrogate
  * 2(r-1)/(r+1) (exact at r=1, strictly monotone in r, same sign as
  * ln r), quantized to micro-units; per-document scores are then
  * EXACT integer sums of the quantized per-gram weights —
  * order-insensitive, so shuffle nondeterminism can't change a hash.
  *
  * 100 TB shape:
  *  - both fits are `buckets`-bounded aggregations with map-side
  *    combine (the shuffle carries at most `buckets` rows per task,
  *    never the corpus);
  *  - the weight table is O(buckets) rows and BROADCAST, so the
  *    transform is a map-side hash join over the exploded corpus
  *    followed by ONE doc-keyed partially-aggregated shuffle;
  *  - the selection threshold comes from a score HISTOGRAM (grouped
  *    cumulative count), not a global sort: no TakeOrdered of k
  *    corpus rows to the driver, no single-partition corpus window.
  *    The single-partition cumulative window runs over DISTINCT
  *    scores only (quantized micro sums collide heavily; if a corpus
  *    ever produced O(N) distinct scores, swap the exact histogram
  *    for approx_percentile and re-rank the boundary bucket).
  *  - driver state: two scalars (corpus count, threshold score).
  */
object Importance {

  /** Per-document importance scores: `doc_id`, `n_grams` (number of
    * n-token shingles), `score_micro` (exact integer sum of quantized
    * per-gram weights). Every corpus doc appears; docs with fewer
    * than `n` tokens score 0. Pure plan builder — lazy, no action. */
  def dsirWeights(corpus: DataFrame, target: DataFrame, textCol: String,
      n: Int, buckets: Int): DataFrame = {
    require(n >= 1, s"shingle order must be >= 1, got $n")
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    // explode_outer + post-Generate null filter: a plain explode makes
    // the optimizer infer a size(...)>0 PRE-filter that duplicates the
    // whole tokenize+shingle+hash expression below the Generate (the
    // t05 lesson); filtering the generated attribute stays above it.
    def grams(df: DataFrame): DataFrame = df
      .selectExpr("doc_id", s"${TextOps.tokens(textCol)} AS t")
      .selectExpr("doc_id",
        s"explode_outer(transform(${TextOps.shingles("t", n)}, " +
          s"s -> ${TextOps.strHash("s")} % $buckets)) AS bkt")
      .filter(col("bkt").isNotNull)
    val raw = grams(corpus).groupBy(col("bkt")).agg(count(lit(1)).as("cr"))
    val tgt = grams(target).groupBy(col("bkt")).agg(count(lit(1)).as("ct"))
    val nr = raw.agg(coalesce(sum(col("cr")), lit(0L)).as("nr"))
    val nt = tgt.agg(coalesce(sum(col("ct")), lit(0L)).as("nt"))
    // add-1 smoothed hashed-unigram probabilities; r is the
    // target/raw likelihood ratio. Buckets absent from the TARGET get
    // ct=0 via the left join; buckets absent from the RAW corpus
    // cannot reach the transform join below (every transform-side
    // gram was counted into `raw` by construction).
    val lam = raw.join(tgt, Seq("bkt"), "left")
      .na.fill(0L, Seq("ct"))
      .crossJoin(broadcast(nr)).crossJoin(broadcast(nt))
      .selectExpr("bkt",
        s"cast(ct + 1 as double) / cast(nt + $buckets as double) AS pt",
        s"cast(cr + 1 as double) / cast(nr + $buckets as double) AS pr")
      .selectExpr("bkt", "pt / pr AS r")
      .selectExpr("bkt",
        "cast(round(((2 * (r - 1)) / (r + 1)) * 1000000) as bigint) AS lam_micro")
    val perDoc = grams(corpus)
      .join(broadcast(lam), Seq("bkt"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"), sum(col("lam_micro")).as("score_micro"))
    corpus.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .selectExpr("doc_id",
        "coalesce(n_grams, cast(0 as bigint)) AS n_grams",
        "coalesce(score_micro, cast(0 as bigint)) AS score_micro")
  }

  /** [[dsirWeights]] plus the selection decision: keep the top
    * ceil(num/den * N) documents by score, TIES AT THE BOUNDARY ALL
    * KEPT (the threshold is the k-th largest score VALUE, so the kept
    * set can exceed k by the boundary tie count — the deterministic,
    * rank-free contract that survives any row order). Output adds a
    * `kept` boolean to every scored row.
    *
    * EAGER (per [[Storage]]'s contract): the score frame is
    * checkpointed at call time — the threshold needs a corpus count
    * and a histogram pass, and re-running the full fit per action
    * would triple the corpus cost. The returned frame re-reads the
    * checkpoint blocks; free them via [[Storage.release]] after the
    * terminal action. */
  def dsirSelect(corpus: DataFrame, target: DataFrame, textCol: String,
      n: Int, buckets: Int, num: Long, den: Long): DataFrame = {
    require(num >= 1 && den >= 1 && num <= den,
      s"keep fraction must satisfy 0 < num/den <= 1, got $num/$den")
    val scored = Storage.checkpointed(dsirWeights(corpus, target, textCol, n, buckets))
    val total = scored.count()
    val k = (total * num + den - 1) / den
    val threshold = thresholdTopK(scored, k)
    scored.withColumn("kept", col("score_micro") >= lit(threshold))
  }

  /** The k-th largest value of `score_micro` (k >= 1): grouped score
    * histogram -> cumulative count ordered score-descending -> max
    * score whose cumulative count reaches k. The window is
    * single-partition BY DESIGN but runs over distinct scores only
    * (see class doc). Runs two jobs; returns a driver scalar. */
  private[graft] def thresholdTopK(scored: DataFrame, k: Long): Long = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val hist = scored.groupBy(col("score_micro")).agg(count(lit(1)).as("c"))
    val row = hist
      .withColumn("cum", sum(col("c")).over(Window.orderBy(col("score_micro").desc)))
      .filter(col("cum") >= k)
      .agg(max(col("score_micro")))
      .head()
    if (row.isNullAt(0))
      throw new IllegalArgumentException(s"k=$k exceeds the corpus row count")
    row.getLong(0)
  }
}
