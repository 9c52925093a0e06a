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

  /** Deterministic salted hash split — the train/val/test assignment
    * a corpus build needs BEFORE any training touches the data:
    * bucket = polyhash(salt:id) mod 1000, split by per-mille
    * thresholds. Hash-based (not random) so (a) the assignment is
    * reproducible from the id alone on any engine or rerun, (b)
    * adding documents never reshuffles existing assignments (the
    * stability property a growing 100 TB corpus needs — a
    * `rand(seed)` split changes with partitioning), and (c) a doc's
    * split can be recomputed row-local anywhere downstream.
    *
    * 100 TB shape: pure projection — zero shuffles, zero driver
    * state; the hash is the codegen'd native `graft_polyhash`. Lazy
    * plan builder.
    *
    * Bucketing: the 60-bit polyhash is finished with a Knuth
    * multiplicative mix modulo 2^31 before the mod-1000 bucket — a
    * plain polynomial hash mod 1000 is visibly NON-uniform on
    * sequential integer ids (low buckets cluster in arithmetic
    * progressions; measured: 124/1000 buckets hit over 2000
    * sequential ids, max occupancy 30 — the mix restores 844/1000,
    * max 6). All intermediates stay inside Int64:
    * (2^31 − 1) · 2654435761 < 2^63.
    *
    * @param trainPerMille buckets [0, trainPerMille) => 'train'
    * @param valPerMille   next valPerMille buckets => 'val'; the rest
    *                      => 'test'
    * @return (`idCol`, `bucket`, `split`)
    */
  def hashSplit(df: DataFrame, idCol: String, salt: String,
      trainPerMille: Int, valPerMille: Int): DataFrame = {
    require(trainPerMille >= 0 && valPerMille >= 0 &&
      trainPerMille + valPerMille <= 1000,
      s"per-mille shares must be non-negative and sum <= 1000, " +
        s"got train=$trainPerMille val=$valPerMille")
    require(!salt.contains("'"), "salt must not contain quotes")
    val h = TextOps.strHash60(s"concat('$salt', ':', cast($idCol as string))")
    df.selectExpr(idCol,
        s"((($h % 2147483648L) * 2654435761L) % 2147483648L) % 1000 AS bucket")
      .selectExpr(idCol, "bucket",
        s"case when bucket < $trainPerMille then 'train' " +
          s"when bucket < ${trainPerMille + valPerMille} then 'val' " +
          "else 'test' end AS split")
  }
}
