package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The composed corpus-curation pipeline as a library API (p12's
  * chain): NFC-normalize -> exact-dup keep-first on the normalized
  * fingerprint -> per-domain cap -> per-source quality quantile gate
  * -> round-robin interleave key. Every stage ranks over the
  * SURVIVORS of the previous one — that ordering is the pipeline's
  * semantics, not an implementation detail (a cap computed on the
  * pre-dedup corpus would charge duplicate docs against a domain's
  * budget).
  *
  * 100 TB shape: one fingerprint window shuffle + three
  * source-partitioned window shuffles over a monotonically shrinking
  * survivor set, plus broadcast-only interleave arithmetic — no joins
  * between big sides, no global windows, no driver state.
  */
object Curate {

  /** Stage-boundary row counts ride the job as `observe` metrics
    * (read them from `df.queryExecution.observedMetrics` after any
    * action, keyed `curate_input`/`curate_dedup`/`curate_cap`/
    * `curate_gate`) — the A3 accumulator pattern for the curation
    * surface: per-stage attrition without re-running any stage.
    *
    * @param domainCap      keep at most this many docs per source
    *                       (first-by-doc_id, deterministic)
    * @param keepNumerator  keep the top keepNumerator/keepDenominator
    * @param keepDenominator  of each source's docs by token count
    * @return (doc_id, source, n_tokens, interleave_key) for the final
    *         survivor set, interleave_key a deterministic round-robin
    *         training order */
  def pipeline(docs: DataFrame, textCol: String = "text", domainCap: Int = 20,
      keepNumerator: Int = 3, keepDenominator: Int = 4): DataFrame = {
    require(domainCap > 0 && keepNumerator > 0 && keepDenominator >= keepNumerator)
    val bySource = Window.partitionBy(col("source"))
    val norm = docs
      .selectExpr("doc_id", "source", s"graft_nfc($textCol) AS text_n")
      .selectExpr("doc_id", "source", "text_n",
        s"${TextOps.strHash60("text_n")} AS fp")
      .observe("curate_input", count(lit(1)).as("rows"))
    val deduped = norm
      .withColumn("dup_rk",
        row_number().over(Window.partitionBy(col("fp")).orderBy(col("doc_id"))))
      .filter(col("dup_rk") === 1)
      .observe("curate_dedup", count(lit(1)).as("rows"))
    val capped = deduped
      .withColumn("cap_rk", row_number().over(bySource.orderBy(col("doc_id"))))
      .filter(col("cap_rk") <= domainCap)
      .selectExpr("doc_id", "source",
        s"cast(size(${TextOps.tokens("text_n")}) as bigint) AS n_tokens")
      .observe("curate_cap", count(lit(1)).as("rows"))
    val gated = capped
      .withColumn("q_rk", row_number().over(
        bySource.orderBy(col("n_tokens").desc, col("doc_id"))).cast("long"))
      .withColumn("n_src", count(lit(1)).over(bySource).cast("long"))
      .filter(col("q_rk") * keepDenominator <= col("n_src") * keepNumerator)
      .observe("curate_gate", count(lit(1)).as("rows"))
    // the interleave side inputs (surviving-source index + count) need
    // a SECOND and THIRD traversal of the whole window chain if built
    // lazily off `gated` (they ride broadcast branches, so plan-level
    // reuse never kicks in — the round-7 triple-recompute advisory).
    // Checkpoint ONCE, pruned to the distinct sources — O(|domains|)
    // storage, not O(corpus) — and build both side inputs from that.
    // eager = false: building a plan must not execute it (explain/
    // audit callers pay nothing, and no observe metrics fire at
    // construction) — the blocks materialize with the caller's first
    // action and both branches reuse them. The O(|domains|) blocks are
    // owned by the returned frame: Storage.release(result) frees them
    // deterministically, the ContextCleaner otherwise.
    val srcs = gated.select(col("source")).distinct().localCheckpoint(eager = false)
    val srcIdx = srcs
      .withColumn("src_idx",
        row_number().over(Window.orderBy(col("source"))).cast("long"))
    val nSrc = srcs.agg(count(lit(1)).as("n_all_src"))
    gated
      .withColumn("r", row_number().over(bySource.orderBy(col("doc_id"))).cast("long"))
      .join(broadcast(srcIdx), Seq("source"))
      .crossJoin(broadcast(nSrc))
      .selectExpr("doc_id", "source", "n_tokens",
        "(r - 1) * n_all_src + src_idx AS interleave_key")
  }
}
