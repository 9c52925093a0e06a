package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-prefiltered EXACT benchmark decontamination — the 100 TB
  * path for "drop every corpus document sharing an n-gram with the
  * eval set". The result is identical to the exact n-gram-overlap
  * anti-join ([[graft.queries.Pipeline]] t05's semantics): a Bloom
  * filter has no false NEGATIVES, so `probe = false` proves a
  * document shares no benchmark n-gram, and false POSITIVES are
  * removed by an exact verification join. The oracle therefore needs
  * no Bloom replay — it checks the exact semantics.
  *
  * Why not just broadcast the benchmark hash set (t05)? At real eval
  * scale the distinct-shingle set is O(10^8) longs — ~1 GB of
  * broadcast hash map vs a ~17-bits-per-element Bloom image (~200 MB
  * at the same scale, any FPP target sets the ratio). The corpus-side
  * plan becomes:
  *   1. probe pass: map-only — per-doc shingle hashes tested against
  *      the broadcast bit array; the overwhelmingly-clean corpus
  *      never reaches a join;
  *   2. verify join: ONLY probe-positive docs explode their shingles
  *      into a broadcast equi-join with the true benchmark set;
  *      confirmed hits are O(contamination + FPP * corpus) doc_ids;
  *   3. final map-side broadcast ANTI-join drops confirmed docs.
  * Driver state: the m/64-long bit image (built by a bounded
  * `bit_or` aggregation, never by collecting benchmark hashes).
  *
  * Probe hashes reuse [[TextOps.mhA]]/[[TextOps.mhB]] affine mixes
  * over the 60-bit shingle hash — deterministic, so a spec (not the
  * oracle) can replay bit images exactly.
  */
object Decontaminate {

  private val P = TextOps.P

  /** Bloom probe position i (0-based) for 60-bit hash expr `h`:
    * ((a_i * (h % P) + b_i) % P) % m. */
  private def posExpr(h: String, i: String, m: Int): String =
    s"(((${TextOps.mhA(i)} * ($h % $P) + ${TextOps.mhB(i)}) % $P) % $m)"

  /** The m-bit Bloom image of every 60-bit hash in `hashes.sgl` as a
    * packed long array: k probe positions per hash, OR-folded by a
    * `bit_or` aggregation over at most m/64 groups (the benchmark
    * hash set itself is never collected). */
  def bloomBits(hashes: DataFrame, m: Int, k: Int): Array[Long] = {
    require(m >= 64 && m % 64 == 0, s"m must be a positive multiple of 64, got $m")
    require(k >= 1, s"k must be >= 1, got $k")
    val words = hashes
      .selectExpr(s"explode(transform(sequence(0, ${k - 1}), " +
        s"i -> ${posExpr("sgl", "i", m)})) AS pos")
      .selectExpr("cast(pos div 64 as int) AS idx", "cast(pos % 64 as int) AS off")
      .groupBy(col("idx"))
      .agg(expr("bit_or(shiftleft(cast(1 as bigint), off))").as("word"))
      .collect()
    val bits = new Array[Long](m / 64)
    words.foreach(r => bits(r.getInt(0)) = r.getLong(1))
    bits
  }

  /** `true` iff ANY hash in the array column `hsCol` probes positive
    * in the `bits_arr` image column (all k positions set). */
  private def probeExpr(hsCol: String, m: Int, k: Int): String = {
    def pp(i: String) = posExpr("h", i, m)
    s"exists($hsCol, h -> forall(sequence(0, ${k - 1}), i -> " +
      s"((shiftright(element_at(bits_arr, cast(${pp("i")} div 64 as int) + 1), " +
      s"cast(${pp("i")} % 64 as int)) & 1) = 1)))"
  }

  /** corpus docs + `maybe` flag (probe-positive). package-private so
    * the spec can pin the no-false-negative invariant. */
  private[graft] def probed(corpus: DataFrame, textCol: String, n: Int,
      bits: Array[Long], k: Int): DataFrame = {
    val m = bits.length * 64
    Dedup.shingleHashSets(corpus, textCol, n)
      .withColumn("bits_arr", typedLit(bits.toSeq))
      .withColumn("maybe", expr(probeExpr("hs", m, k)))
  }

  /** Documents of `corpus` sharing NO n-token shingle with `bench`:
    * doc_id + n_shingles, exact semantics, Bloom-shaped plan (see
    * class doc). Lazy plan builder — the Bloom image build runs one
    * bounded aggregation job at call time; the returned frame is a
    * pure plan over it. */
  def cleanDocs(corpus: DataFrame, bench: DataFrame, textCol: String,
      n: Int, m: Int, k: Int): DataFrame = {
    val benchHashes = Dedup.shingleHashSets(bench, textCol, n)
      .selectExpr("explode(hs) AS sgl").distinct()
    val bits = bloomBits(benchHashes, m, k)
    val pr = probed(corpus, textCol, n, bits, k)
    val confirmed = pr.filter(col("maybe"))
      .selectExpr("doc_id", "explode(hs) AS sgl")
      .join(broadcast(benchHashes), Seq("sgl"))
      .select(col("doc_id")).distinct()
    pr.select(col("doc_id"), col("n_shingles").cast("long").as("n_shingles"))
      .join(broadcast(confirmed), Seq("doc_id"), "left_anti")
  }

  /** Per-eval-document contamination audit (the GPT-3 appendix-C /
    * PaLM "n-gram overlap with training data" measurement, inverted
    * to the eval side): for every document of `evalDocs`, the share
    * of its DISTINCT n-token shingles that also occur anywhere in
    * `trainDocs`, plus a verdict at `thresholdMicro`. Where
    * [[cleanDocs]] scrubs the corpus, this scores the BENCHMARK —
    * the number a lab reads before trusting an eval score.
    *
    * 100 TB shape: the eval set is a bounded input (hundreds of
    * tasks), so its exploded distinct shingles broadcast; the train
    * corpus streams map-side through `(distinct shingle)` partial
    * aggregation and ONE broadcast equi-join — the corpus is never
    * shuffled by doc and never collected. Docs with < n tokens have
    * zero shingles and score 0 by definition.
    *
    * Returns `doc_id, n_ngrams, n_hit, overlap_micro, contaminated`
    * (one row per eval doc, ordered). */
  def ngramOverlapAudit(evalDocs: DataFrame, trainDocs: DataFrame,
      textCol: String, n: Int, thresholdMicro: Long): DataFrame = {
    val ev = Dedup.shingleHashSets(evalDocs, textCol, n)
      .selectExpr("doc_id", "explode(hs) AS sgl")
    val trainSgl = Dedup.shingleHashSets(trainDocs, textCol, n)
      .selectExpr("explode(hs) AS sgl").distinct()
    val hits = trainSgl.join(broadcast(ev), Seq("sgl"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hit"))
    Dedup.shingleHashSets(evalDocs, textCol, n)
      .selectExpr("doc_id", "cast(n_shingles as bigint) AS n_ngrams")
      .join(hits, Seq("doc_id"), "left")
      .selectExpr("doc_id", "n_ngrams", "coalesce(n_hit, 0L) AS n_hit")
      .selectExpr("doc_id", "n_ngrams", "n_hit",
        "if(n_ngrams = 0, 0L, cast((cast(n_hit as decimal(38,0)) * 1000000) div n_ngrams as bigint)) AS overlap_micro")
      .withColumn("contaminated", col("overlap_micro") >= lit(thresholdMicro))
      .orderBy(col("doc_id"))
  }
}
