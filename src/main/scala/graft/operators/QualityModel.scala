package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A TRAINED document-quality scorer: batch gradient descent on a
  * linear model over cheap quality signals, fit with one corpus pass
  * per step and O(features) driver state — the third trained-artifact
  * operator next to the k-means codebook ([[Similarity.trainedCodebook]])
  * and the BPE tokenizer ([[Bpe.fit]]). The fitted weight vector IS
  * the artifact: fit once, then [[score]] any corpus with a map-only
  * projection (no per-transform re-training).
  *
  * Features (each exactly derived from integer token statistics via a
  * fixed sequence of IEEE-exact ops — see the determinism note):
  *   x1 = English-stopword ratio, x2 = type/token ratio,
  *   x3 = saturating length n/(n+100), plus an intercept.
  * The training label is caller-supplied heuristic supervision (a
  * boolean SQL expression — e.g. "lang = 'en'" as a stand-in for
  * "looks like the high-quality reference slice"); the operator is
  * the TRAINER, not the labeling policy.
  *
  * Determinism contract (the unrolled-CTE oracle hash-matches the
  * trained weights AND every per-doc score): squared loss, so the
  * gradient is polynomial in (w, x, y) — no sigmoid/exp whose libm
  * implementations differ across engines in the last ulp. Per-row
  * gradient terms are quantized to micro-units (one IEEE multiply +
  * round each) and summed as EXACT integers, so shuffle order can't
  * perturb a bit; the (quantize -> integer-sum -> two divisions ->
  * halve -> subtract) update sequence is replayed verbatim by the
  * oracle's step CTEs.
  *
  * 100 TB shape: each GD step is ONE map-side-combined aggregation
  * (4 integer sums + a count) over the checkpointed feature frame —
  * no shuffle wider than the 1-row aggregate, driver holds 4 doubles.
  * Integer gradient sums bound |term| <= ~2^21 micro-units, so BIGINT
  * sums are safe to ~2^42 rows; beyond that switch the sums to
  * DECIMAL(38,0). Scoring is a pure projection.
  */
object QualityModel {

  val Features = 4 // intercept, stop-ratio, TTR, saturating length

  /** doc_id, y (label as 0/1 double), x1..x3. Pure plan builder. */
  def featurize(docs: DataFrame, textCol: String, labelExpr: String): DataFrame =
    docs
      .selectExpr("doc_id", s"${TextOps.tokens(textCol)} AS t",
        s"if($labelExpr, cast(1 as double), cast(0 as double)) AS y")
      .selectExpr("doc_id", "y",
        "cast(size(t) as bigint) AS nt",
        "cast(size(array_distinct(t)) as bigint) AS ntypes",
        s"cast(${TextOps.stopHits("t", TextOps.StopEn)} as bigint) AS sh")
      .selectExpr("doc_id", "y",
        "if(nt = 0, cast(0 as double), cast(sh as double) / cast(nt as double)) AS x1",
        "if(nt = 0, cast(0 as double), cast(ntypes as double) / cast(nt as double)) AS x2",
        "cast(nt as double) / cast(nt + 100 as double) AS x3")

  /** w0 + x1*w1 + x2*w2 + x3*w3 with the exact left-associated op
    * order the oracle's SQL parse produces. */
  private def predict(w: Array[Double]): Column =
    lit(w(0)) + col("x1") * lit(w(1)) + col("x2") * lit(w(2)) + col("x3") * lit(w(3))

  /** Batch-GD fit over [[featurize]] output: `steps` passes, learning
    * rate fixed at 1/2 (an exact power of two, so the halving is a
    * single IEEE op in both engines). Returns the weight vector; the
    * feature checkpoint is released before returning — the weights
    * are the whole artifact. */
  def fit(docs: DataFrame, textCol: String, labelExpr: String, steps: Int): Array[Double] = {
    require(steps >= 1, s"steps must be >= 1, got $steps")
    val feats = Storage.checkpointed(featurize(docs, textCol, labelExpr))
    try {
      val w = Array(0.0, 0.0, 0.0, 0.0)
      for (_ <- 1 to steps) {
        val e = predict(w) - col("y")
        def gsum(x: Column): Column = sum(round((x * e) * lit(1000000), 0).cast("long"))
        val row = feats.agg(
          gsum(lit(1)).as("g0"), gsum(col("x1")).as("g1"),
          gsum(col("x2")).as("g2"), gsum(col("x3")).as("g3"),
          count(lit(1)).as("n")).head()
        val n = row.getLong(4)
        require(n > 0, "cannot fit on an empty corpus")
        for (j <- 0 until Features) {
          val g = (row.getLong(j).toDouble / 1000000) / n.toDouble
          w(j) = w(j) - g / 2
        }
      }
      w
    } finally Storage.release(feats)
  }

  /** Map-only scoring under a fitted (or any) weight vector:
    * doc_id, y_label, score_micro, plus the weights themselves as
    * micro-quantized constant columns so a hash-check pins the
    * TRAINING result, not just the per-doc arithmetic. */
  def score(docs: DataFrame, textCol: String, labelExpr: String, w: Array[Double]): DataFrame = {
    require(w.length == Features, s"expected $Features weights, got ${w.length}")
    featurize(docs, textCol, labelExpr)
      .select(col("doc_id"),
        col("y").cast("long").as("y_label"),
        round(predict(w) * lit(1000000), 0).cast("long").as("score_micro"),
        round(lit(w(0)) * lit(1000000), 0).cast("long").as("w0_micro"),
        round(lit(w(1)) * lit(1000000), 0).cast("long").as("w1_micro"),
        round(lit(w(2)) * lit(1000000), 0).cast("long").as("w2_micro"),
        round(lit(w(3)) * lit(1000000), 0).cast("long").as("w3_micro"))
  }
}
