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
  /** Token-budget apportionment + deterministic selection: split a
    * global token budget across sources by the largest-remainder
    * (Hamilton) apportionment — EXACT integers, no float shares — then
    * select each source's docs in salted-hash order greedily while the
    * running token total stays within the source's quota (a selected
    * set never exceeds its quota; a quota smaller than the source's
    * first-ranked doc selects nothing from it).
    *
    * Quotas: `base_i = B·W_i div W`; the `B − Σ base_i` leftover
    * tokens go one each to the sources with the largest remainders
    * `B·W_i mod W` (ties broken by source name — a strict total
    * order). `B · max(W_i)` must stay inside Int64 (require'd via one
    * O(1)-row aggregate).
    *
    * 100 TB shape: one source-keyed partial agg to O(sources) rows;
    * the apportionment windows run over that tiny frame; the quota
    * table broadcasts back; selection is ONE source-keyed window
    * (running sum in hash order, spillable external sort). The only
    * driver scalar is the overflow-guard max.
    *
    * @return selected docs: (id, source, n_tokens, cum_tokens,
    *         quota_tokens), one row per kept doc
    */
  def tokenBudgetSelect(docs: DataFrame, idCol: String, srcCol: String,
      textCol: String, budgetTokens: Long, salt: String): DataFrame = {
    require(budgetTokens >= 0L, s"budgetTokens must be >= 0, got $budgetTokens")
    require(!salt.contains("'"), "salt must not contain quotes")
    val toks = docs.selectExpr(s"$idCol AS id", s"$srcCol AS source",
      s"cast(size(filter(split($textCol, '[ ]+'), x -> x != '')) as bigint) AS n_tokens")
    val perSrc = toks.groupBy(col("source")).agg(sum(col("n_tokens")).as("w"))
    val maxW = perSrc.agg(coalesce(max(col("w")), lit(0L))).head.getLong(0)
    require(BigInt(budgetTokens) * BigInt(math.max(maxW, 1L)) < BigInt(Long.MaxValue),
      s"tokenBudgetSelect exact-integer contract: budget($budgetTokens) * " +
        s"maxSourceTokens($maxW) must stay below 2^63; rescale the budget units")
    val one = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
    val byRem = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
      .orderBy(col("rem").desc, col("source").asc)
    val quotas = perSrc
      .withColumn("w_tot", sum(col("w")).over(one))
      .selectExpr("source", "w",
        s"($budgetTokens * w) div w_tot AS base",
        s"($budgetTokens * w) % w_tot AS rem")
      .withColumn("leftover", lit(budgetTokens) - sum(col("base")).over(one))
      .withColumn("rk", row_number().over(byRem))
      .selectExpr("source",
        "base + if(rk <= leftover, 1L, 0L) AS quota_tokens")
    val sel = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("hkey"), col("id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val h = graft.operators.TextOps.strHash60(
      s"concat('$salt', ':', cast(id as string))")
    toks.selectExpr("id", "source", "n_tokens", s"$h AS hkey")
      .withColumn("cum_tokens", sum(col("n_tokens")).over(sel))
      .join(broadcast(quotas), Seq("source"))
      .filter(col("cum_tokens") <= col("quota_tokens"))
      .select(col("id"), col("source"), col("n_tokens"),
        col("cum_tokens"), col("quota_tokens"))
  }

  /** Deterministic source rebalancing (fractional oversampling):
    * every source is upsampled toward the LARGEST source's total token
    * mass by the exact-integer factor `max_w · 1e6 div w_i` — the
    * integer part replicates every doc, and the fractional part
    * replicates exactly the docs whose salted mixed hash bucket
    * (mod 1e6, the [[hashSplit]] mixing) falls below it, so the
    * expected replication is the exact rational factor with NO
    * randomness and stable doc-level assignment. Emits one row per
    * (doc, copy_idx).
    *
    * 100 TB shape: one source-keyed partial agg to O(sources) rows
    * (broadcast back), a map-side copies computation, and one
    * bounded-fan-out explode (factor is bounded by max/min source
    * mass — a degenerate near-empty source would surface in the
    * require'd Int64 bound first). */
  def rebalanceSources(docs: DataFrame, idCol: String, srcCol: String,
      textCol: String, salt: String): DataFrame = {
    require(!salt.contains("'"), "salt must not contain quotes")
    val toks = docs.selectExpr(s"$idCol AS id", s"$srcCol AS source",
      s"cast(size(filter(split($textCol, '[ ]+'), x -> x != '')) as bigint) AS n_tokens")
    val perSrc = toks.groupBy(col("source")).agg(sum(col("n_tokens")).as("w"))
    val maxW = perSrc.agg(coalesce(max(col("w")), lit(0L))).head.getLong(0)
    require(BigInt(maxW) * BigInt(1000000L) < BigInt(Long.MaxValue),
      s"rebalanceSources exact-integer contract: maxSourceTokens($maxW) * 1e6 " +
        "must stay below 2^63")
    require(perSrc.filter(col("w") <= 0L).isEmpty,
      "rebalanceSources: every source needs positive token mass")
    val factors = perSrc.selectExpr("source",
      s"(${maxW}L * 1000000) div w AS factor_micro")
    val h = graft.operators.TextOps.strHash60(
      s"concat('$salt', ':', cast(id as string))")
    toks
      .selectExpr("id", "source", "n_tokens",
        s"((($h % 2147483648L) * 2654435761L) % 2147483648L) % 1000000 AS bucket")
      .join(broadcast(factors), Seq("source"))
      .selectExpr("id", "source", "n_tokens",
        "factor_micro div 1000000 + if(bucket < factor_micro % 1000000, 1L, 0L) AS copies")
      .selectExpr("id", "source", "n_tokens", "copies",
        "explode(sequence(0L, copies - 1)) AS copy_idx")
      .select(col("id"), col("source"), col("n_tokens"), col("copies"),
        col("copy_idx"))
  }

  /** Corpus concentration summary: per-source whitespace-token mass
    * folded to ONE row — source count, total tokens, the largest
    * source's share, the Herfindahl–Hirschman index (Σ share²) and
    * its inverse ("effective number of sources"), all in exact micro
    * units (shares floor-quantized to micro BEFORE squaring, so both
    * engines square the same integers). The one-number answer to "is
    * this training mix dominated by one crawl?".
    *
    * 100 TB shape: one source-keyed partial agg to S rows, then a
    * single-row broadcast total and an S-row final fold — nothing
    * after the first agg scales with the corpus. */
  def sourceConcentration(docs: DataFrame, srcCol: String,
      textCol: String): DataFrame = {
    val per = docs
      .selectExpr(s"$srcCol AS source",
        s"cast(size(filter(split($textCol, '[ ]+'), x -> x != '')) as bigint) AS n_tokens")
      .groupBy(col("source")).agg(sum(col("n_tokens")).as("w"))
    val tot = per.agg(sum(col("w")).as("total"), count(lit(1)).as("n_sources"))
    // decimal(38,0) intermediate: `w * 1e6` overflows Int64 once one
    // source holds >~9.2e12 tokens — exactly the 100 TB shape. Spark
    // (non-ANSI) would wrap silently while the DuckDB oracle raises;
    // the 128-bit product (mirrored by HUGEINT in the oracle) keeps
    // both engines exact at any corpus size below 1e32 tokens.
    per.crossJoin(broadcast(tot))
      .selectExpr("n_sources", "total",
        "cast((cast(w as decimal(38,0)) * 1000000) div total as bigint)" +
          " AS share_micro")
      .groupBy(col("n_sources"), col("total"))
      .agg(max(col("share_micro")).as("max_share_micro"),
        sum(expr("share_micro * share_micro")).as("hhi_raw"))
      .selectExpr("n_sources", "total AS total_tokens", "max_share_micro",
        "hhi_raw div 1000000 AS hhi_micro",
        "if(hhi_raw div 1000000 = 0, 0L, " +
          "1000000000000 div (hhi_raw div 1000000)) AS effective_sources_micro")
  }

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

  /** Deterministic stratified Bernoulli sampling + realized-rate
    * audit: each row's fate is a pure function of (salt, id) — the
    * [[hashSplit]] salted-hash bucket against a PER-STRATUM
    * per-mille rate — so the sample is reproducible run-to-run,
    * join-stable across tables sharing the id, and needs no RNG
    * state anywhere. This is the 100 TB sampling primitive: a
    * map-only filter whose audit (this frame) is one partial agg.
    * Returns per stratum: `stratum, n_rows, target_permille,
    * n_sampled, realized_micro` (ordered). */
  def stratifiedHashSample(df: DataFrame, idCol: String, stratumCol: String,
      salt: String, rates: Map[String, Int], defaultPerMille: Int): DataFrame = {
    require(!salt.contains("'"), "salt must not contain quotes")
    require((rates.values ++ Seq(defaultPerMille)).forall(r => r >= 0 && r <= 1000),
      "per-mille rates must be in [0, 1000]")
    require(rates.keys.forall(!_.contains("'")), "stratum keys must not contain quotes")
    val h = TextOps.strHash60(s"concat('$salt', ':', cast($idCol as string))")
    val rate = rates.toSeq.sortBy(_._1)
      .map { case (k, v) => s"when $stratumCol = '$k' then ${v}L" }
      .mkString("case ", " ", s" else ${defaultPerMille}L end")
    df.selectExpr(s"$stratumCol AS stratum", s"$rate AS target_permille",
        s"((($h % 2147483648L) * 2654435761L) % 2147483648L) % 1000 AS bucket")
      .selectExpr("stratum", "target_permille",
        "cast(bucket < target_permille as bigint) AS sampled")
      .groupBy(col("stratum"), col("target_permille"))
      .agg(count(lit(1)).as("n_rows"),
        coalesce(sum(col("sampled")), lit(0L)).as("n_sampled"))
      .selectExpr("stratum", "n_rows", "target_permille", "n_sampled",
        "cast((cast(n_sampled as decimal(38,0)) * 1000000) div n_rows as bigint) AS realized_micro")
      .orderBy(col("stratum"))
  }

  /** Exact Gini coefficient of a NON-NEGATIVE integer weight column
    * (order values, doc token counts, per-source masses) — the
    * inequality measure that complements [[sourceConcentration]]'s
    * HHI. With weights sorted ascending and 1-based ranks i,
    * `G = (2·Σ i·wᵢ − (n+1)·Σw) / (n·Σw)`, reported floored to
    * micro-units. Ties collapse: rows are grouped per DISTINCT
    * weight, and a tie group of `cnt` rows starting at global rank
    * `before+1` contributes `w·(cnt·(before+1) + cnt·(cnt−1)/2)`
    * exactly — so no per-row rank is ever materialized.
    *
    * 100 TB shape: the global exclusive cumulative count is NOT a
    * single-partition window over the distinct-weight frame — the
    * weight domain splits into ≤257 value-range buckets (top bits of
    * the weight relative to a broadcast 1-row max; bucket order IS
    * value order, unlike q74's hash line), each bucket window-cumsums
    * in parallel, and the ≤257-row bucket-offset frame broadcasts
    * back. The decomposition is algebraically the identity; the
    * oracle computes the same numbers with one flat window. All
    * products ride decimal(38,0) (mirrored by HUGEINT): s1 ≤ n²·wmax
    * ≈ 5e31 at 1e12 rows of ≤5e7, ×1e6 still inside 38 digits. */
  def giniExact(df: DataFrame, weightCol: String): DataFrame =
    giniExactFromCounts(df.selectExpr(s"cast($weightCol as bigint) AS c")
      .groupBy(col("c")).agg(count(lit(1)).as("cnt")))

  /** [[giniExact]] over a PRE-AGGREGATED value-frequency state
    * (columns `c`, `cnt`) — the mergeable-state face: value
    * histograms from independent slices union+sum to the identical
    * state the one-shot scan builds, so a maintained Gini never
    * re-reads history (the q43/q44 incremental discipline applied to
    * a holistic order statistic). */
  def giniExactFromCounts(g: DataFrame): DataFrame = {
    bucketedCumsum(g, "c", "cnt")
      .agg(sum(col("cnt")).as("n"),
        sum(expr("cast(c as decimal(38,0)) * cnt")).as("t"),
        sum(expr("cast(c as decimal(38,0)) * (cast(cnt as decimal(38,0)) * (before + 1)" +
          " + cast(cnt as decimal(38,0)) * (cnt - 1) div 2)")).as("s1"))
      .selectExpr("n AS n_rows", "cast(t as bigint) AS total_weight",
        "cast(if(n < 2 or t <= 0, 0, " +
          "(2 * s1 - (n + 1) * t) * 1000000 div (n * t)) as bigint) AS gini_micro")
  }

  /** The shared ≤257-bucket value-range exclusive-cumsum decomposition
    * (ADVICE r11 — previously repeated inline by [[giniExactFromCounts]],
    * [[trimmedMeanExact]], [[topShareExact]],
    * [[graft.operators.Profile.weightedMedianExact]], and the q82
    * Spearman rank map): given a DISTINCT-value frame `g` with a
    * value column and an additive aggregate column, appends `before`
    * — the exact exclusive cumulative `aggCol` in `valueCol` order
    * (ascending or descending) — without ever riding a
    * single-partition window. The value domain splits into ≤257
    * range buckets (`v div (max div 256 + 1)`; bucket order IS value
    * order), each bucket window-cumsums in parallel, and the ≤257-row
    * bucket-offset frame broadcasts back. Algebraically the identity;
    * every caller's oracle computes the same numbers with one flat
    * window.
    *
    * Contract: `g` must already be collapsed per distinct `valueCol`
    * (one row per value) with `valueCol` a BIGINT. */
  private[graft] def bucketedCumsum(g: DataFrame, valueCol: String,
      aggCol: String, ascending: Boolean = true): DataFrame = {
    val mx = g.agg(max(col(valueCol)).as("__mx"))
    val gb = g.crossJoin(broadcast(mx))
      .withColumn("__b", expr(s"$valueCol div greatest(1L, (__mx div 256) + 1L)"))
    val bOrd = if (ascending) col("__b").asc else col("__b").desc
    val vOrd = if (ascending) col(valueCol).asc else col(valueCol).desc
    val offs = gb.groupBy(col("__b")).agg(sum(col(aggCol)).as("__bagg"))
      .withColumn("__off",
        coalesce(sum(col("__bagg")).over(Window.orderBy(bOrd)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val win = Window.partitionBy(col("__b")).orderBy(vOrd)
      .rowsBetween(Window.unboundedPreceding, -1)
    gb.join(broadcast(offs.select(col("__b"), col("__off"))), Seq("__b"))
      .withColumn("before",
        col("__off") + coalesce(sum(col(aggCol)).over(win), lit(0L)))
      .drop("__b", "__mx", "__off")
  }

  /** Exact trimmed (truncated) mean: drop the `k = permille·n div
    * 1000` smallest AND largest rows by weight, average the rest —
    * the robust-statistics classic that ignores both tails. ONE
    * collapsed distinct-weight frame serves both tails: the
    * ascending exclusive cumcount `before` gives the low-tail take
    * `min(cnt, k − before)` and, by symmetry, the high-tail take
    * `min(cnt, k − (n − before − cnt))` — tie groups are
    * weight-uniform so partial takes are exact (the [[topShareExact]]
    * rule applied twice). Same ≤257 value-range bucket
    * decomposition; returns one row
    * (n_rows, k_trim, total_weight, trimmed_sum, trimmed_mean_milli).
    * Requires 2k < n (a fully-trimmed frame has no mean).
    *
    * 100 TB shape: one distinct-weight partial agg, one ≤257-row
    * broadcast offset frame, one bucket window, 1-row folds. */
  def trimmedMeanExact(df: DataFrame, weightCol: String, permille: Int): DataFrame = {
    require(permille >= 0 && permille < 500,
      s"permille must be in [0, 500), got $permille")
    val g = df.selectExpr(s"cast($weightCol as bigint) AS c")
      .groupBy(col("c")).agg(count(lit(1)).as("cnt"))
    val tot = g.agg(sum(col("cnt")).as("n"),
      sum(expr("cast(c as decimal(38,0)) * cnt")).as("total"))
      .selectExpr("n", "total", s"($permille * n) div 1000 AS k")
    bucketedCumsum(g, "c", "cnt")
      .crossJoin(broadcast(tot))
      .selectExpr("n", "k", "total",
        "cast(c as decimal(38,0)) * (greatest(0L, least(cnt, k - before))" +
          " + greatest(0L, least(cnt, k - (n - before - cnt)))) AS cut")
      .groupBy(col("n"), col("k"), col("total"))
      .agg(sum(col("cut")).as("cut"))
      .selectExpr("n AS n_rows", "cast(k as bigint) AS k_trim",
        "cast(total as bigint) AS total_weight",
        "cast(total - cut as bigint) AS trimmed_sum",
        "cast(if(n - 2 * k <= 0, 0, (total - cut) * 1000 div (n - 2 * k))" +
          " as bigint) AS trimmed_mean_milli")
  }

  /** Exact top-fraction concentration: the share of total weight
    * held by the top `ceil(permille·n/1000)` rows ranked by weight
    * descending — "the top 1% of users generate X% of events", the
    * concentration number next to [[giniExact]]'s inequality index.
    * Ties collapse per distinct weight (the [[giniExact]] idiom):
    * when the cutoff K lands inside a tie group, `K − before`
    * members are taken — every member weighs the same, so the SUM is
    * tie-break-invariant and needs no per-row ranking. Same ≤257
    * value-range bucket decomposition, descending.
    *
    * 100 TB shape: one distinct-weight partial agg, one ≤257-row
    * broadcast offset frame, one bucket-partitioned window, 1-row
    * folds. */
  def topShareExact(df: DataFrame, weightCol: String, permille: Int): DataFrame = {
    require(permille >= 1 && permille <= 1000,
      s"permille must be in [1, 1000], got $permille")
    val g = df.selectExpr(s"cast($weightCol as bigint) AS c")
      .groupBy(col("c")).agg(count(lit(1)).as("cnt"))
    val tot = g.agg(sum(col("cnt")).as("n"),
      sum(expr("cast(c as decimal(38,0)) * cnt")).as("total"))
      .selectExpr("n", "total", s"($permille * n + 999) div 1000 AS kk")
    bucketedCumsum(g, "c", "cnt", ascending = false)
      .crossJoin(broadcast(tot))
      .selectExpr("n", "kk", "total",
        "cast(c as decimal(38,0)) *" +
          " if(before >= kk, 0L, least(cnt, kk - before)) AS taken")
      .groupBy(col("n"), col("kk"), col("total"))
      .agg(sum(col("taken")).as("tw"))
      .selectExpr("n AS n_rows", "cast(kk as bigint) AS k_top",
        "cast(total as bigint) AS total_weight",
        "cast(tw as bigint) AS top_weight",
        "cast(if(total <= 0, 0, tw * 1000000 div total) as bigint) AS share_micro")
  }

  /** Annealed training-mixture schedule: per epoch, each source's
    * sampling weight interpolates linearly from its NATURAL token
    * share (epoch 0) to the UNIFORM share `1e6 div S` (the last
    * epoch) — the standard curriculum that starts faithful to the
    * corpus and ends upweighting scarce sources. All integer micro
    * arithmetic: `w(e) = nat + (uni − nat)·e div (E−1)`; the signed
    * `div` truncates toward zero in BOTH engines (the documented
    * Spark-`div`/DuckDB-`//` agreement), so rows where uniform is
    * below natural hash-compare too. Returns the (epoch × source)
    * grid with natural, uniform, and annealed micro weights.
    *
    * 100 TB shape: one source-keyed partial agg to S rows; the
    * epoch grid is a broadcast `range(E)` cross of the S-row frame —
    * nothing after the first agg scales with the corpus. */
  def annealedMixture(docs: DataFrame, srcCol: String, textCol: String,
      epochs: Int): DataFrame = {
    require(epochs >= 2, s"epochs must be >= 2, got $epochs")
    val spark = docs.sparkSession
    val per = docs
      .selectExpr(s"$srcCol AS source",
        s"cast(size(filter(split($textCol, '[ ]+'), x -> x != '')) as bigint) AS n_tokens")
      .groupBy(col("source")).agg(sum(col("n_tokens")).as("w"))
    val tot = per.agg(sum(col("w")).as("total"), count(lit(1)).as("n_sources"))
    per.crossJoin(broadcast(tot))
      .selectExpr("source",
        "cast((cast(w as decimal(38,0)) * 1000000) div total as bigint) AS natural_micro",
        "1000000L div n_sources AS uniform_micro")
      .crossJoin(broadcast(spark.range(0, epochs).selectExpr("id AS epoch")))
      .selectExpr("epoch", "source", "natural_micro", "uniform_micro",
        s"natural_micro + (uniform_micro - natural_micro) * epoch div ${epochs - 1}" +
          " AS weight_micro")
      .orderBy(col("epoch"), col("source"))
  }

  /** Water-filling token-budget allocation across sources under
    * availability caps — the mixture-planning step [[tokenBudgetSelect]]
    * skips: that operator splits the budget proportional to AVAILABLE
    * mass, so a small high-priority source can never bind; this one
    * takes target WEIGHTS and redistributes the share a saturated
    * source cannot absorb to the unsaturated rest (the classic
    * water-filling solution: alloc_i = min(cap_i, level * w_i) with the
    * level chosen so the allocations sum to the budget).
    *
    * Exact-integer contract (both engines run the SAME algorithm, so
    * the oracle is cell-exact): sources sort by the saturation key
    * `(cap_i * 1e12) div w_i` (ties by source name); in that order a
    * source saturates iff `cap_i * W_rem <= B_rem * w_i`, where
    * `W_rem`/`B_rem` are the weight/budget left after the earlier
    * (smaller-key) sources saturate — the condition is monotone along
    * the key order, so the saturated set is the maximal all-true
    * prefix. Unsaturated sources get `(R * w_i) div Wr` (R = budget
    * minus saturated caps, Wr = unsaturated weight); the integer-
    * division crumbs (< one token per unsaturated source) stay
    * unallocated by contract — a mixture plan does not care about
    * sub-token dust, and exactness beats a largest-remainder pass that
    * could overshoot a cap by one.
    *
    * @param weightExpr SQL over the per-source frame (`source`,
    *                   `cap_tokens` visible) yielding a positive
    *                   BIGINT target weight; default uniform.
    * @return one row per source: (source, cap_tokens, weight,
    *         saturated, alloc_tokens, fill_micro), fill_micro =
    *         alloc*1e6 div cap.
    *
    * 100 TB shape: one source-keyed partial agg to O(sources) rows;
    * everything after (the sort, the prefix scan, the full-frame
    * totals) runs on that O(sources) frame — the single-partition
    * windows here are over tens of rows, not the corpus. */
  def waterfillBudget(docs: DataFrame, srcCol: String, textCol: String,
      budgetTokens: Long, weightExpr: String = "1L"): DataFrame = {
    val per = docs
      .selectExpr(s"$srcCol AS source",
        s"cast(size(filter(split($textCol, '[ ]+'), x -> x != '')) as bigint) AS n_tokens")
      .groupBy(col("source")).agg(sum(col("n_tokens")).as("cap_tokens"))
      .selectExpr("source", "cap_tokens",
        s"cast(($weightExpr) as bigint) AS weight")
    waterfillFrom(per, budgetTokens)
  }

  /** [[waterfillBudget]]'s core over a PRE-AGGREGATED per-source
    * frame (`source`, `cap_tokens`, `weight`) — the face a caller
    * uses when the availability caps are not raw token mass (e.g.
    * p63's SFT plan water-fills on TRAINABLE tokens from
    * [[Dialogue.sftTokenAccounting]]). Same exact-integer algorithm
    * and contracts as the scaladoc above; every row needs positive
    * cap and weight (eager require — a zero-cap source has nothing
    * to allocate to and would divide fill_micro by zero). */
  def waterfillFrom(per: DataFrame, budgetTokens: Long): DataFrame = {
    require(budgetTokens >= 0L, s"budgetTokens must be >= 0, got $budgetTokens")
    require(per.filter(col("weight") <= 0L || col("cap_tokens") <= 0L).isEmpty,
      "waterfill: every source needs positive weight and token mass")
    val keyed = per.selectExpr("source", "cap_tokens", "weight",
      "cast(cap_tokens as decimal(38,0)) * 1000000000000 div weight AS sat_key")
    val ord = Window.partitionBy(lit(1))
      .orderBy(col("sat_key").asc, col("source").asc)
    val pre = ord.rowsBetween(Window.unboundedPreceding, -1)
    val all = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    keyed
      .withColumn("cap_before", coalesce(sum(col("cap_tokens")).over(pre), lit(0L)))
      .withColumn("w_before", coalesce(sum(col("weight")).over(pre), lit(0L)))
      .withColumn("w_total", sum(col("weight")).over(all))
      .withColumn("cond", expr(
        s"cast(cap_tokens as decimal(38,0)) * (w_total - w_before) <= " +
          s"cast($budgetTokens - cap_before as decimal(38,0)) * weight"))
      .withColumn("saturated",
        min(expr("if(cond, 1, 0)")).over(
          ord.rowsBetween(Window.unboundedPreceding, 0)) === lit(1))
      .withColumn("r_budget", lit(budgetTokens) -
        sum(expr("if(saturated, cap_tokens, 0L)")).over(all))
      .withColumn("w_unsat",
        sum(expr("if(saturated, 0L, weight)")).over(all))
      .selectExpr("source", "cap_tokens", "weight", "saturated",
        "if(saturated, cap_tokens, least(cap_tokens, " +
          "cast(cast(r_budget as decimal(38,0)) * weight div w_unsat as bigint)))" +
          " AS alloc_tokens")
      .selectExpr("source", "cap_tokens", "weight", "saturated", "alloc_tokens",
        "cast(cast(alloc_tokens as decimal(38,0)) * 1000000 div cap_tokens as bigint)" +
          " AS fill_micro")
      .orderBy(col("source"))
  }

  /** The ACT face of [[waterfillBudget]]: realize the allocation by
    * SELECTING docs — per source, docs taken in salted-hash order
    * (deterministic, rerunnable, no RNG state — the
    * [[tokenBudgetSelect]] selection discipline) until the source's
    * water-filled allocation is exhausted. A doc is kept iff its
    * inclusive running token count fits the allocation, so each
    * source's realized take is within one doc of its plan.
    *
    * @return surviving docs: (id, source, n_tokens, cum_tokens,
    *         alloc_tokens).
    *
    * 100 TB shape: [[waterfillBudget]]'s O(sources) planning frame
    * broadcast back onto one source-partitioned window over the
    * corpus — the same single-shuffle shape as tokenBudgetSelect,
    * with the plan swapped. */
  def waterfillSelect(docs: DataFrame, idCol: String, srcCol: String,
      textCol: String, budgetTokens: Long, weightExpr: String = "1L",
      salt: String = "wf"): DataFrame = {
    require(!salt.contains("'"), "salt must not contain quotes")
    val quotas = waterfillBudget(docs, srcCol, textCol, budgetTokens,
      weightExpr).select(col("source"), col("alloc_tokens"))
    val sel = Window.partitionBy(col("source"))
      .orderBy(col("hkey"), col("id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val h = graft.operators.TextOps.strHash60(
      s"concat('$salt', ':', cast(id as string))")
    docs.selectExpr(s"$idCol AS id", s"$srcCol AS source",
        s"cast(size(filter(split($textCol, '[ ]+'), x -> x != '')) as bigint) AS n_tokens")
      .selectExpr("id", "source", "n_tokens", s"$h AS hkey")
      .withColumn("cum_tokens", sum(col("n_tokens")).over(sel))
      .join(broadcast(quotas), Seq("source"))
      .filter(col("cum_tokens") <= col("alloc_tokens"))
      .select(col("id"), col("source"), col("n_tokens"),
        col("cum_tokens"), col("alloc_tokens"))
  }
}
