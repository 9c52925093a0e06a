package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale text corpora (SURVEY §7 M5
  * extended surface). All operators are shuffle-conscious:
  *
  *  - signatures (minhash/simhash/fingerprints) are pure projections —
  *    no shuffle, embarrassingly parallel, safe at 100 TB;
  *  - candidate generation always goes through an equi-join key
  *    (shingle, band hash, simhash band) so Spark plans a hash/SMJ
  *    shuffle join instead of a cartesian product;
  *  - `maxDocFreq` caps the blow-up from ultra-common shingles (the
  *    classic quadratic skew hazard in similarity self-joins).
  */
object Dedup {
  import TextOps.P

  /** Every observe metric emitted by a capped candidate-generation
    * path starts with this prefix (VERDICT r13 #2 — saturation
    * observability): a shingle/window whose doc frequency (or total
    * occurrence count) exceeds the cap is PRUNED from candidate
    * generation, trading recall for the O(cap²) fan-out bound. On a
    * df-saturated corpus (tiny vocabulary, heavy boilerplate) that
    * prune can silently collapse the candidate set to zero — an empty
    * result indistinguishable from "no duplicates". The metric makes
    * the trade operational: each capped aggregation rides an
    * `observe` node named `<prefix>_<seq>` carrying
    * `pruned_groups` (groups over the cap — candidates they would
    * have generated are LOST) and `total_groups`, surfaced on the
    * caller's action via `frame.queryExecution.observedMetrics`.
    *
    * CAVEAT (pinned by SaturationSpec): AQE's empty-relation
    * propagation prunes the whole subtree — observe node included —
    * from the final plan when a downstream join collapses to empty,
    * which is exactly the fully-saturated case. The observe is
    * therefore the cheap in-flight signal for the common
    * partially-pruned plans, NOT the ground truth. The EAGER capped
    * wrappers close that hole with an explicit probe over their
    * already-cached shingle sets (one map-side-combinable aggregate,
    * run only when a finite cap is set) that WARN-logs pruned counts
    * unconditionally — the A3 corrupt-file-counter idiom applied to
    * recall; and [[dfSaturationAudit]] is the registered first-class
    * audit query a curator runs before trusting a capped operator on
    * a new corpus. */
  val SaturationMetricPrefix = "graft_dedup_saturation"

  private val satSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  private def satMetricName(): String =
    s"${SaturationMetricPrefix}_${satSeq.incrementAndGet()}"

  /** The reliable eager-path saturation signal (see
    * [[SaturationMetricPrefix]]): one extra aggregate over the
    * operator's CACHED shingle sets — skipped entirely on uncapped
    * calls — warn-logging how many shingle groups the df cap prunes
    * and how many candidate pairs that declines to generate. */
  private def warnIfSaturated(sets: DataFrame, maxDocFreq: Int,
      op: String): Unit =
    if (maxDocFreq != Int.MaxValue) {
      val r = dfSaturationAuditFrom(sets, maxDocFreq).head()
      if (r.getLong(1) > 0L)
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"graft dedup saturation [$op]: ${r.getLong(1)} of " +
            s"${r.getLong(0)} distinct shingles exceed df cap " +
            s"$maxDocFreq (max df ${r.getLong(2)}); ~${r.getLong(4)} " +
            "same-shingle candidate pairs were NOT generated - recall " +
            "on this corpus is degraded; run Dedup.dfSaturationAudit " +
            "and consider the signature tiers (exact fp / MinHash-LSH " +
            "/ exact-substr)")
    }

  /** doc_id + distinct n-token shingle set (+ set size). */
  def shingleSets(docs: DataFrame, textCol: String, n: Int): DataFrame =
    Storage.parallelFloor(docs).selectExpr("doc_id", s"${TextOps.tokens(textCol)} AS t")
      .selectExpr("doc_id", s"array_distinct(${TextOps.shingles("t", n)}) AS s")
      .selectExpr("doc_id", "s", "size(s) AS n_shingles")

  /** doc_id + distinct 60-bit shingle-hash set: candidate generation
    * shuffles/joins 8-byte longs instead of multi-token strings (~4x
    * cheaper at bench scale, far more at 100 TB where shingle text
    * dominates shuffle bytes). Hashes are the exact-integer polynomial
    * twins of the DuckDB oracle, so both engines see identical sets
    * (collisions included — deterministic on both sides). */
  def shingleHashSets(docs: DataFrame, textCol: String, n: Int): DataFrame =
    docs.selectExpr("doc_id", s"graft_shingle_hashes($textCol, $n) AS hs")
      .selectExpr("doc_id", "hs", "size(hs) AS n_shingles")

  /** Exact duplicate groups by (optionally normalized) content. */
  def exactGroups(docs: DataFrame, textCol: String): DataFrame =
    docs.selectExpr(s"${TextOps.strHash60(textCol)} AS fp", "doc_id")
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))

  /** Exact n-gram Jaccard similarity pairs (d1 < d2) with
    * jaccard >= threshold. Candidates = docs sharing >= 1 shingle;
    * shingles with doc-frequency > maxDocFreq are dropped from
    * candidate generation only (both docs still count full set sizes)
    * — at web scale a handful of stop-shingles would otherwise
    * generate O(n^2) candidates. With a finite cap: count doc
    * frequencies (partial-agg pass), broadcast the tiny hot set for a
    * map-side anti-join, then group-collect per surviving shingle
    * (every group <= cap after the prune) and emit pairs from the
    * bounded group — no self-join, bounded executor memory.
    *
    * EAGER: executes and materializes at call time (the
    * [[Storage.withCached]] contract); free the returned frame's
    * blocks with [[Storage.release]] after the terminal action. */
  def ngramJaccardPairs(docs: DataFrame, textCol: String, n: Int,
      threshold: Double, maxDocFreq: Int = Int.MaxValue): DataFrame =
    // parallelFloor: tokenize+shingle+hash is this family's hot map;
    // a single-split bench scan pins it to one core otherwise
    // (measured d02 3.00->2.16 s, d08 2.81->2.09 s). Applied at the
    // eager pair wrappers, NOT inside shingleHashSets — audit-style
    // consumers (d20/d33, the decontamination family) are single
    // partial-agg passes where the extra exchange was measured as
    // pure overhead (d20 +0.31 s).
    Storage.withCached(shingleHashSets(Storage.parallelFloor(docs), textCol, n)) { s =>
      warnIfSaturated(s, maxDocFreq, "ngramJaccardPairs")
      ngramJaccardPairsFrom(s, threshold, maxDocFreq)
    }

  /** Candidate (d1 < d2, shared-shingle count) pairs over a shingle
    * set frame, plus each side's set size — the common core of
    * [[ngramJaccardPairsFrom]] (symmetric Jaccard) and
    * [[containmentPairsFrom]] (asymmetric containment); the two
    * operators differ only in the final metric. */
  private def sharedShingleCounts(sets: DataFrame, maxDocFreq: Int): DataFrame = {
    val ex = sets.selectExpr("doc_id", "explode(hs) AS sgl")
    val shared =
      if (maxDocFreq == Int.MaxValue) {
        // exact-recall path: per-shingle doc lists are unbounded, so
        // candidate generation must stay a self equi-join (spillable)
        ex.as("a")
          .join(ex.as("b"),
            col("a.sgl") === col("b.sgl") && col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
          .agg(count(lit(1)).as("shared"))
      } else {
        // capped path: ONE aggregation pass with the size-capped
        // collect ([[graft.functions.CollectCapped]]) — a group that
        // exceeds the cap collapses to null (releasing its buffer at
        // cap+1 elements), which IS the doc-frequency prune: "shingles
        // with df > cap generate no candidates". Replaces the earlier
        // three-pass shape (df count, broadcast-hot-set anti-join,
        // collect the survivors) with a single read of the exploded
        // corpus, while keeping the same bound: each live group
        // buffers <= cap+1 ids (~8B each) and fans out
        // <= cap*(cap-1)/2 pairs — 2016 at the registered cap=64 — so
        // executor memory and shuffle volume scale with the cap, not
        // the corpus. Oracle parity is untouched: overflow == df>cap.
        // saturation observability (VERDICT r13 #2): a null'd group IS
        // a pruned shingle — count them on the way past so cap-induced
        // recall collapse is a signal, not a silent empty result
        ex.groupBy(col("sgl"))
          .agg(expr(s"graft_collect_capped(doc_id, $maxDocFreq)").as("ds"))
          .observe(satMetricName(),
            sum(when(col("ds").isNull, 1L).otherwise(0L)).as("pruned_groups"),
            count(lit(1)).as("total_groups"))
          .filter(col("ds").isNotNull && size(col("ds")) >= 2)
          .selectExpr("explode(flatten(transform(sequence(1, size(ds) - 1), " +
            "i -> transform(sequence(i + 1, size(ds)), " +
            "j -> struct(element_at(ds, i) AS d1, element_at(ds, j) AS d2))))) AS pr")
          .select(col("pr.d1").as("d1"), col("pr.d2").as("d2"))
          .groupBy(col("d1"), col("d2"))
          .agg(count(lit(1)).as("shared"))
      }
    val sz = sets.select(col("doc_id"), col("n_shingles"))
    shared
      .join(sz.as("s1"), col("d1") === col("s1.doc_id"))
      .join(sz.as("s2"), col("d2") === col("s2.doc_id"))
      .select(col("d1"), col("d2"), col("shared"),
        col("s1.n_shingles").cast("long").as("n1"),
        col("s2.n_shingles").cast("long").as("n2"))
  }

  /** the [[ngramJaccardPairs]] plan over an already-available shingle
    * set frame — the lazy builder [[Storage.withCached]] wraps (and
    * PlanAuditSpec audits pre-checkpoint). */
  private[graft] def ngramJaccardPairsFrom(sets: DataFrame,
      threshold: Double, maxDocFreq: Int): DataFrame =
    sharedShingleCounts(sets, maxDocFreq)
      .withColumn("jaccard",
        col("shared").cast("double") /
          (col("n1") + col("n2") - col("shared")).cast("double"))
      .filter(col("jaccard") >= threshold)

  /** Doc-frequency SATURATION audit — the production-facing face of
    * the [[SaturationMetricPrefix]] counters (VERDICT r13 #2): how
    * much of this corpus's shingle mass does a df cap of `maxDocFreq`
    * prune from candidate generation, and how many candidate pairs
    * does the prune decline to enumerate? A curator runs this BEFORE
    * trusting a capped pair operator (d02/d08/d09) on a new corpus:
    * `saturated_micro` near 0 means the cap is a skew valve touching
    * only boilerplate; a large value means the corpus's vocabulary is
    * too small for shingle-inverted-index candidate generation and
    * the signature tiers (d01/d03/d29) are the right operators — the
    * BENCH_SCALE Finding-2 division of labor as a 1-row query.
    *
    * Returns one row: `n_shingles` (distinct shingle hashes),
    * `n_pruned` (df > cap), `max_df`, `pruned_occurrences` (postings
    * the prune drops), `pruned_pairs` (Σ C(df,2) over pruned shingles
    * — same-shingle candidate pairs NOT generated; an upper bound on
    * lost candidates since a pair may share several shingles), and
    * `saturated_micro` (n_pruned / n_shingles in micro units).
    *
    * 100 TB shape: one map-side-combinable (hash → df) aggregation
    * over the exploded corpus + a 1-row fold — strictly cheaper than
    * any capped pair operator it gates. */
  def dfSaturationAudit(docs: DataFrame, textCol: String, n: Int,
      maxDocFreq: Int): DataFrame =
    dfSaturationAuditFrom(shingleHashSets(docs, textCol, n), maxDocFreq)

  /** the [[dfSaturationAudit]] plan over an already-available shingle
    * set frame — shared with [[warnIfSaturated]] so the eager capped
    * wrappers probe their cached intermediate instead of re-reading
    * the corpus. */
  private[graft] def dfSaturationAuditFrom(sets: DataFrame,
      maxDocFreq: Int): DataFrame = {
    require(maxDocFreq >= 1, s"df cap must be >= 1, got $maxDocFreq")
    sets
      .selectExpr("doc_id", "explode(hs) AS sgl")
      .groupBy(col("sgl")).agg(count(lit(1)).as("df"))
      .agg(count(lit(1)).as("n_shingles"),
        coalesce(sum(when(col("df") > maxDocFreq, 1L).otherwise(0L)), lit(0L))
          .as("n_pruned"),
        coalesce(max(col("df")), lit(0L)).as("max_df"),
        coalesce(sum(when(col("df") > maxDocFreq, col("df")).otherwise(0L)),
          lit(0L)).as("pruned_occurrences"),
        coalesce(sum(when(col("df") > maxDocFreq,
            expr("df * (df - 1) div 2")).otherwise(0L)), lit(0L))
          .as("pruned_pairs"))
      .selectExpr("n_shingles", "n_pruned", "max_df", "pruned_occurrences",
        "pruned_pairs",
        "if(n_shingles = 0, 0L, n_pruned * 1000000 div n_shingles)" +
          " AS saturated_micro")
  }

  /** Asymmetric CONTAINMENT pairs: C = shared / min(|S1|, |S2|) —
    * the doc-inside-doc signal symmetric Jaccard misses (a short doc
    * quoted verbatim inside a long one has high containment but near
    * zero Jaccard, because the union is dominated by the long doc).
    * Candidate generation, the doc-frequency cap, and the 100 TB
    * memory/fan-out bounds are exactly [[ngramJaccardPairs]]'s
    * ([[sharedShingleCounts]]); only the final per-pair metric
    * differs, so the operator inherits the audited plan shape.
    *
    * EAGER ([[Storage.withCached]]); release the result's blocks via
    * [[Storage.release]] after the terminal action. */
  def containmentPairs(docs: DataFrame, textCol: String, n: Int,
      threshold: Double, maxDocFreq: Int = Int.MaxValue): DataFrame =
    Storage.withCached(shingleHashSets(Storage.parallelFloor(docs), textCol, n)) { s =>
      warnIfSaturated(s, maxDocFreq, "containmentPairs")
      containmentPairsFrom(s, threshold, maxDocFreq)
    }

  private[graft] def containmentPairsFrom(sets: DataFrame,
      threshold: Double, maxDocFreq: Int): DataFrame =
    sharedShingleCounts(sets, maxDocFreq)
      .withColumn("containment",
        col("shared").cast("double") / least(col("n1"), col("n2")).cast("double"))
      .filter(col("containment") >= threshold)

  /** Weighted (multiset) Jaccard pairs: J_w = Σ min(c1,c2) / Σ max(c1,c2)
    * over per-doc TOKEN COUNTS — the repetition-aware similarity that
    * set Jaccard flattens (a doc that repeats one paragraph 50 times
    * has near-1 set overlap with one copy of the paragraph but low
    * weighted overlap, and vice versa). Identity used:
    * Σ max = T1 + T2 − Σ min, so only the shared-term min-sum and the
    * two total token counts are needed — never a full outer join on
    * the union vocabulary.
    *
    * Candidate pairs come from [[sharedShingleCounts]]'s audited
    * capped machinery (same df-cap bound as [[ngramJaccardPairs]]);
    * the min-sum pass is candidate⋈counts equi-joins bounded by
    * candidates × per-doc vocabulary. EAGER ([[Storage.withCached]]);
    * release the result via [[Storage.release]]. */
  def weightedJaccardPairs(docs: DataFrame, textCol: String, n: Int,
      threshold: Double, maxDocFreq: Int = Int.MaxValue): DataFrame = {
    // two shared intermediates (the shingle sets feeding candidate
    // generation, and the token-count table joined on BOTH pair
    // sides), so the withCached lifecycle is hand-rolled for a pair
    // of caches: cache → build → materialize → release both
    val fdocs = Storage.parallelFloor(docs)
    val sets = shingleHashSets(fdocs, textCol, n)
    val tc = fdocs
      .selectExpr("doc_id", s"explode(${TextOps.tokens(textCol)}) AS term")
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("c"))
    sets.cache(); tc.cache()
    try {
      // NO fill-first count() ladder (r17, VERDICT r16 #1): the r16
      // double count() regressed the driver sheet 2.31→3.08 s and the
      // r17 quiet-box re-measure agreed (quick n=8 min 2.43 without
      // vs 2.69–2.93 with) — two serialized fill jobs cost more than
      // the racing-consumer recompute they avoid on this line. The
      // floors (the d02/d08-proven part) stay.
      warnIfSaturated(sets, maxDocFreq, "weightedJaccardPairs")
      Storage.checkpointed(weightedJaccardPairsFrom(sets, tc, threshold, maxDocFreq))
    }
    finally {
      sets.unpersist(blocking = false); tc.unpersist(blocking = false)
    }
  }

  /** the [[weightedJaccardPairs]] plan over already-available shingle
    * sets + token counts (the lazy builder PlanAuditSpec audits
    * pre-checkpoint). */
  private[graft] def weightedJaccardPairsFrom(sets: DataFrame, tc: DataFrame,
      threshold: Double, maxDocFreq: Int): DataFrame = {
    val cand = sharedShingleCounts(sets, maxDocFreq).select(col("d1"), col("d2"))
    val tot = tc.groupBy(col("doc_id")).agg(sum(col("c")).as("t"))
    val minsum = cand
      .join(tc.select(col("doc_id").as("d1"), col("term"), col("c").as("c1")), Seq("d1"))
      .join(tc.select(col("doc_id").as("d2"), col("term"), col("c").as("c2")),
        Seq("d2", "term"))
      .groupBy(col("d1"), col("d2"))
      .agg(sum(least(col("c1"), col("c2"))).as("minsum"))
    minsum
      .join(tot.select(col("doc_id").as("d1"), col("t").as("t1")), Seq("d1"))
      .join(tot.select(col("doc_id").as("d2"), col("t").as("t2")), Seq("d2"))
      .withColumn("wjaccard",
        col("minsum").cast("double") /
          (col("t1") + col("t2") - col("minsum")).cast("double"))
      .filter(col("wjaccard") >= threshold)
      .select(col("d1"), col("d2"), col("minsum"), col("t1"), col("t2"),
        col("wjaccard"))
  }

  /** MinHash-LSH banding planner (driver-side pure math — standard
    * S-curve analysis, Leskovec/Rajaraman/Ullman "Mining of Massive
    * Datasets" ch. 3, public method): candidate probability for a pair
    * at Jaccard s under b bands of r rows is `1 − (1 − s^r)^b`. Picks
    * the (bands, rows) split of a signature budget `k = b·r` that
    * catches pairs at `threshold` with at least `minRecall` while
    * MINIMIZING the false-candidate probability at `noiseSim` (the
    * similarity level the corpus's bulk sits at) — the tradeoff every
    * LSH deployment hand-tunes. Throws if no split of the budget
    * reaches the recall target (gives the caller the largest
    * achievable recall in the message instead of silently
    * under-recalling). */
  def planLshBands(signatureSize: Int, threshold: Double, minRecall: Double,
      noiseSim: Double): (Int, Int) = {
    require(signatureSize >= 1, s"signatureSize must be >= 1, got $signatureSize")
    require(threshold > 0 && threshold < 1, s"threshold must be in (0,1), got $threshold")
    require(minRecall > 0 && minRecall < 1, s"minRecall must be in (0,1), got $minRecall")
    require(noiseSim >= 0 && noiseSim < threshold,
      s"noiseSim must be in [0, threshold), got $noiseSim")
    def pCandidate(s: Double, b: Int, r: Int): Double =
      1.0 - math.pow(1.0 - math.pow(s, r), b)
    val splits = (1 to signatureSize)
      .filter(signatureSize % _ == 0)
      .map(r => (signatureSize / r, r)) // (bands, rows)
    val viable = splits.filter { case (b, r) => pCandidate(threshold, b, r) >= minRecall }
    if (viable.isEmpty) {
      val best = splits.map { case (b, r) => pCandidate(threshold, b, r) }.max
      throw new IllegalArgumentException(
        f"no (bands, rows) split of $signatureSize reaches recall $minRecall%.3f at " +
          f"threshold $threshold%.2f (best achievable: $best%.3f); grow the signature")
    }
    viable.minBy { case (b, r) => pCandidate(noiseSim, b, r) }
  }

  /** Per-doc n-gram novelty: the fraction of a doc's distinct shingles
    * that appear NOWHERE else in the corpus (df = 1), in exact integer
    * micro units — the inverse-duplication quality signal a curation
    * pipeline thresholds on (a doc whose every shingle recurs
    * elsewhere is boilerplate even if no single pair-dedup fires).
    * 100 TB shape: one explode + one shingle-keyed partial-agg shuffle
    * for df, one doc-keyed partial-agg back — linear, no pair
    * generation at all. Docs with no shingles (< n tokens) are
    * excluded (novelty is undefined). */
  def noveltyScores(docs: DataFrame, textCol: String, n: Int): DataFrame = {
    val ex = shingleHashSets(docs, textCol, n)
      .selectExpr("doc_id", "explode(hs) AS sgl")
    val df = ex.groupBy(col("sgl")).agg(count(lit(1)).as("df"))
    ex.join(df, Seq("sgl"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") === 1L, 1L).otherwise(0L)).as("n_unique"))
      .selectExpr("doc_id", "n_shingles", "n_unique",
        "(n_unique * 1000000) div n_shingles AS novelty_micro")
  }

  /** Prefix-filtered variant (ppjoin family), exact for Jaccard >= t:
    * with canonically sorted sets, a qualifying pair must share an
    * element within the first |X| - ceil(t*|X|) + 1 elements of BOTH
    * sets, so candidate generation joins only prefixes, then reranks
    * with an exact set intersection. Wins when near-dup pairs dominate
    * hot-shingle fan-out; measured SLOWER than [[ngramJaccardPairs]]
    * on the synthetic word-soup corpus (prefixes still carry the hot
    * shingles: 10.7s vs 7.3s at sf0.1) — kept as the alternative for
    * skew-heavy real-text corpora. EAGER ([[Storage.withCached]]);
    * release the result via [[Storage.release]]. */
  def ngramJaccardPairsPrefix(docs: DataFrame, textCol: String, n: Int,
      threshold: Double): DataFrame =
    Storage.withCached(shingleSets(docs, textCol, n)
      .selectExpr("doc_id", "array_sort(s) AS s", "n_shingles",
        s"slice(array_sort(s), 1, greatest(0, size(s) - cast(ceil($threshold * size(s)) as int) + 1)) AS prefix"))(
      ngramJaccardPairsPrefixFrom(_, threshold))

  private[graft] def ngramJaccardPairsPrefixFrom(sets: DataFrame,
      threshold: Double): DataFrame = {
    val ex = sets.selectExpr("doc_id", "explode(prefix) AS sgl")
    val cands = ex.as("a")
      .join(ex.as("b"),
        col("a.sgl") === col("b.sgl") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
    val s1 = sets.select(col("doc_id").as("d1"), col("s").as("s1"), col("n_shingles").as("n1"))
    val s2 = sets.select(col("doc_id").as("d2"), col("s").as("s2"), col("n_shingles").as("n2"))
    cands.join(s1, "d1").join(s2, "d2")
      .selectExpr("d1", "d2",
        "cast(size(array_intersect(s1, s2)) as bigint) AS shared",
        "cast(n1 as bigint) AS n1", "cast(n2 as bigint) AS n2")
      .withColumn("jaccard",
        col("shared").cast("double") / (col("n1") + col("n2") - col("shared")).cast("double"))
      .filter(col("jaccard") >= threshold)
  }

  /** doc_id + k-perm MinHash signature (pure projection; shingle
    * hashes come from the one-pass native expression). */
  def minhashSignatures(docs: DataFrame, textCol: String, n: Int, k: Int): DataFrame =
    // NO parallelFloor here (round 17): the floor sat inside this
    // shared projection in round 16 and taxed the signature-REUSE
    // consumers that don't fan pairs out of it (d07 -11% on the
    // driver sheet, +0.28 s on the closing sheets) — the same lesson
    // as shingleHashSets (d20). The floor lives at the PAIR-building
    // call sites ([[minhashLshPairs]], [[lshBandStats]]), which are
    // the per-row hot maps that measured the win (d03/d11/d16/d21).
    docs
      .selectExpr("doc_id", s"graft_shingle_hashes($textCol, $n) AS hs")
      .selectExpr("doc_id", s"${TextOps.minhashSig("hs", k)} AS sig")

  /** LSH banding health diagnostic: per band the bucket count, the
    * banded doc count, the fattest bucket, and the candidate-pair
    * mass `Σ sz·(sz−1)/2` — the numbers that say whether a band
    * degenerated into one mega-bucket (quadratic candidates) before
    * a pair join is attempted. Two partial aggs over the banded
    * frame; nothing joins. */
  def lshBandStats(docs: DataFrame, textCol: String, n: Int, k: Int,
      bands: Int): DataFrame = {
    val r = k / bands
    require(bands * r == k, s"bands $bands must divide k $k")
    // parallelFloor at the call site (round 17, relocated from
    // minhashSignatures — see its scaladoc): the signature + band
    // fan-out is this diagnostic's per-row hot map
    minhashSignatures(Storage.parallelFloor(docs), textCol, n, k)
      .selectExpr("doc_id",
        s"explode(transform(sequence(0, ${bands - 1}), " +
          s"b -> struct(b AS band, ${TextOps.foldHash(s"slice(sig, b * $r + 1, $r)")} AS bucket))) AS bb")
      .selectExpr("cast(bb.band as bigint) AS band", "bb.bucket AS bucket")
      .groupBy(col("band"), col("bucket")).agg(count(lit(1)).as("sz"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_buckets"), sum(col("sz")).as("n_docs"),
        max(col("sz")).as("max_bucket"),
        sum(expr("sz * (sz - 1) div 2")).as("cand_pairs"))
  }

  /** Fit-once MinHash signature ARTIFACT: the (doc_id, sig) frame
    * materialized ONCE (lineage-truncated checkpoint) for any number
    * of downstream consumers — pair generation
    * ([[minhashLshPairsFrom]]), keep-first filtering, accuracy
    * audits. The signature pass is the dominant cost of every
    * MinHash consumer (VERDICT r8: d03/d05/d06 each re-paid it);
    * fitting once makes the second consumer's marginal signature
    * cost zero. The CALLER owns the artifact's blocks: free them
    * with [[Storage.release]] once every consumer's result is
    * materialized (consumers that need to outlive the artifact must
    * checkpoint their own results first — [[Storage.checkpointed]]). */
  def fitMinhashSignatures(docs: DataFrame, textCol: String, n: Int, k: Int): DataFrame =
    Storage.checkpointed(minhashSignatures(docs, textCol, n, k))

  /** MinHash-LSH near-dup pairs: band the signature (bands × rowsPerBand
    * = k), bucket-join on (band, bucketHash), then estimate Jaccard as
    * the fraction of agreeing signature positions. Deterministic given
    * (n, k, bands) — the oracle replicates it exactly.
    *
    * Scale note: all EMPTY/trivial docs share one sentinel signature,
    * so they land in the same band buckets and pair quadratically —
    * semantically sound (empty docs ARE exact dups; d05's keep-first
    * collapses them) but O(empties^2) in candidates. At corpus scale,
    * run exact dedup (d01) or a length floor (t06's gate) FIRST — the
    * standard pipeline ordering — so at most one representative of
    * any trivial class reaches LSH.
    *
    * EAGER: executes and materializes at call time (the
    * [[Storage.withCached]] contract); free the returned frame's
    * blocks with [[Storage.release]] after the terminal action. To
    * share one signature pass across several consumers, fit the
    * artifact once via [[fitMinhashSignatures]] and feed
    * [[minhashLshPairsFrom]]. */
  def minhashLshPairs(docs: DataFrame, textCol: String, n: Int, k: Int,
      bands: Int, threshold: Double): DataFrame = {
    val r = k / bands
    require(bands * r == k, s"bands $bands must divide k $k")
    // parallelFloor at the call site (round 17, relocated from
    // minhashSignatures — see its scaladoc): the signature build is
    // the pair generator's per-row hot map (d03/d11/d21 each
    // -0.1..-0.2 s at bench scale; no-op on a multi-split scan)
    Storage.withCached(minhashSignatures(Storage.parallelFloor(docs), textCol, n, k))(
      minhashLshPairsFrom(_, k, bands, threshold))
  }

  /** Exact edit-distance re-rank of an LSH candidate pair frame: join
    * the texts back by id, compute Levenshtein distance over the first
    * `prefixLen` chars (the cost valve — full-document O(n·m) DP on
    * multi-KB docs is the quadratic the prefix bounds), keep pairs at
    * `<= maxDist`. Levenshtein is exact integer and engine-portable
    * (both Spark and the oracle implement the classic unit-cost DP),
    * so the result hashes deterministically — no float similarity
    * anywhere.
    *
    * 100 TB shape: candidates are already bounded by the LSH banding;
    * this adds two id-keyed equi-joins against the corpus and a
    * map-side O(prefixLen²) scorer — never an all-pairs plan. */
  def editRerank(docs: DataFrame, idCol: String, textCol: String,
      pairs: DataFrame, prefixLen: Int, maxDist: Long): DataFrame = {
    require(prefixLen >= 1, s"prefixLen must be >= 1, got $prefixLen")
    require(maxDist >= 0L, s"maxDist must be >= 0, got $maxDist")
    pairs.select(col("d1"), col("d2"))
      .join(docs.selectExpr(s"$idCol AS d1",
        s"substring($textCol, 1, $prefixLen) AS t1"), Seq("d1"))
      .join(docs.selectExpr(s"$idCol AS d2",
        s"substring($textCol, 1, $prefixLen) AS t2"), Seq("d2"))
      // the cheap length-difference lower bound first (|len1−len2| > d
      // implies dist > d), then the THRESHOLDED levenshtein — Spark's
      // 3-arg form runs the Ukkonen band (O(prefixLen·maxDist) cells,
      // early exit, returns -1 past the threshold) instead of the full
      // O(prefixLen²) DP; on the dup-saturated 10× slice this is the
      // difference between 44 s and ~4 s of pair scoring. Same result
      // set: -1 rows are exactly the dist > maxDist rows the filter
      // dropped before.
      .filter(expr(s"abs(length(t1) - length(t2)) <= $maxDist"))
      .selectExpr("d1", "d2",
        s"cast(levenshtein(t1, t2, ${maxDist}L) as bigint) AS edit_d")
      .filter(col("edit_d") >= 0L && col("edit_d") <= maxDist)
  }

  /** the [[minhashLshPairs]] plan over an already-available signature
    * frame — LAZY (no caching, no materialization): feed it the
    * [[fitMinhashSignatures]] artifact to share one signature pass
    * across several consumers, or any (doc_id, sig) projection. */
  def minhashLshPairsFrom(sigs: DataFrame, k: Int,
      bands: Int, threshold: Double): DataFrame = {
    val r = k / bands
    val bandRows = sigs.selectExpr("doc_id",
        s"explode(transform(sequence(0, ${bands - 1}), " +
        s"b -> struct(b AS band, ${TextOps.foldHash(s"slice(sig, b * $r + 1, $r)")} AS bucket))) AS bb")
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val cands = bandRows.as("a")
      .join(bandRows.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
    cands
      .join(sigs.as("s1"), col("d1") === col("s1.doc_id"))
      .join(sigs.as("s2"), col("d2") === col("s2.doc_id"))
      .selectExpr("d1", "d2",
        s"aggregate(zip_with(s1.sig, s2.sig, (x, y) -> if(x = y, 1, 0)), 0, (a, v) -> a + v) AS matches")
      .select(col("d1"), col("d2"), col("matches").cast("long").as("matches"),
        (col("matches").cast("double") / k).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  /** doc_id + 60-bit SimHash (pure projection; one-pass token hashes
    * keep duplicates so frequency votes count). */
  def simhashes(docs: DataFrame, textCol: String): DataFrame =
    docs.selectExpr("doc_id", s"graft_token_hashes($textCol) AS hs")
      .selectExpr("doc_id", s"if(size(hs) = 0, cast(0 as bigint), ${TextOps.simhash60("hs")}) AS simhash")

  /** Exact repeated-passage removal (the exact-substring-dedup
    * curation step): every n-token window that occurs more than once
    * in the corpus is scrubbed from all but its first occurrence
    * (first = lowest (doc_id, position)), and each doc's text is
    * rebuilt from the surviving tokens. Matches the reference
    * literature's "remove duplicated spans, keep one canonical copy"
    * semantics; overlapping repeated windows union their covered
    * token ranges.
    *
    * 100 TB shape — four linear passes, nothing quadratic:
    *  1. positional shingle hashes are a pure projection (8-byte longs,
    *     not shingle text, go into the shuffle);
    *  2. occurrence ranking is ONE window shuffle partitioned by the
    *     60-bit shingle hash (millions of fine-grained keys — no
    *     skew beyond genuinely hot passages, whose groups sort
    *     independently); every occurrence ranked >= 2 is a removal,
    *     so no separate doc-frequency pass or hot-set join is needed;
    *  3. removal starts aggregate per doc (map-side combined — output
    *     is bounded by tokens, typically a tiny fraction of them);
    *  4. one equi-join back to the tokenized docs rebuilds the text;
    *     docs with no repeated passage pass through the left join
    *     untouched. The per-token coverage test scans the doc's own
    *     sorted removal-start list (bounded by doc length).
    *
    * "Exact" is modulo the 60-bit shingle hash: two DIFFERENT n-token
    * windows colliding (p ≈ 2^-60 per pair) would scrub a
    * non-duplicate passage. Oracle parity is unaffected (DuckDB
    * replays the same hash); confirm equality on shingle text within
    * hash groups if true exactness is ever required.
    */
  def scrubRepeatedPassages(docs: DataFrame, textCol: String, n: Int): DataFrame = {
    val tk = docs.selectExpr("doc_id", s"${TextOps.tokens(textCol)} AS t")
    val occ = tk
      .selectExpr("doc_id",
        s"transform(${TextOps.shingles("t", n)}, s -> ${TextOps.strHash60("s")}) AS hs")
      .selectExpr("doc_id", "posexplode(hs) AS (pos0, sgl)")
      .selectExpr("doc_id", "cast(pos0 + 1 as bigint) AS pos", "sgl")
    val removals = occ
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("sgl")).orderBy(col("doc_id"), col("pos"))))
      .filter(col("rn") >= 2)
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("pos"))).as("cov"))
    tk.join(removals, Seq("doc_id"), "left")
      .selectExpr("doc_id", "t",
        "coalesce(cov, cast(array() as array<bigint>)) AS cov")
      .selectExpr("doc_id", "t",
        // kept token positions: 1-based j survives iff no removal
        // window starting in (j-n, j] covers it. The native
        // [[graft.functions.ScrubKeep]] two-pointer merge is
        // O(len + |cov|) where the earlier
        // filter(sequence(...), j -> exists(cov, ...)) form re-scanned
        // the whole removal list per token — quadratic exactly on the
        // long highly-duplicated docs this operator exists to scrub.
        // cov is sorted ascending by construction (sort_array above);
        // the expression validates that contract at runtime.
        s"graft_scrub_keep(cov, $n, size(t)) AS kept")
      .selectExpr("doc_id",
        "cast(size(t) as bigint) AS n_before",
        "cast(size(kept) as bigint) AS n_after",
        "concat_ws(' ', transform(kept, j -> element_at(t, j))) AS text_scrubbed")
  }

  /** Cross-document EXACT-SUBSTRING duplicated spans — the Lee et al.
    * 2021 "Deduplicating Training Data Makes Language Models Better"
    * ExactSubstr face (arXiv:2107.06499, the suffix-array method):
    * every MAXIMAL token span of length ≥ k that appears verbatim in
    * at least one OTHER document, at ANY offset on either side. This
    * is the dup tier the 40-token-prefix fingerprint family
    * (d27/p45) provably cannot see — a shared boilerplate paragraph
    * in the MIDDLE of two otherwise-distinct documents — and it
    * differs from [[scrubRepeatedPassages]] in both universe
    * (cross-document only; within-doc-only repeats are NOT spans
    * here) and output (a span INVENTORY per document, not a
    * rewritten text).
    *
    * Semantics, pinned: a k-token window is a *duplicated seed* iff
    * its 60-bit hash occurs in ≥ 2 DISTINCT documents (so every
    * occurrence in every holder is a seed — including the "first"
    * one, unlike the scrub's keep-first rule). Seeds of one document
    * whose token intervals [pos, pos+k−1] touch or overlap (start
    * gap ≤ k) merge transitively into one maximal span — exactly the
    * byte-range union of the public method lifted to tokens. Output:
    * one row per (doc, span): `doc_id, span_start` (1-based token
    * position), `span_tokens` (merged length ≥ k), `n_windows`
    * (seed windows merged into it). "Exact" is modulo the 60-bit
    * hash (p ≈ 2⁻⁶⁰ per colliding window pair — the corpus-wide
    * false-span risk at 10¹² windows is ≈ 10⁻⁶; confirm on shingle
    * text within hash groups if true exactness is ever required).
    *
    * 100 TB shape — all equi-shuffles, no pair join, no collect:
    * seed emission is map-only (per-doc window hashes posexploded);
    * the cross-doc test is a (hash → min/max doc) partial agg —
    * map-side combinable, and min≠max needs no DISTINCT machinery —
    * plus one hash-keyed equi-join back onto occurrences, so a hot
    * boilerplate shingle costs O(its occurrences), never
    * O(occurrences²); span assembly is a per-document window (state
    * bounded by document length — the A1 sorted-run merge expressed
    * as lag + running sum over one (doc, pos) sort). */
  def exactSubstrSpans(docs: DataFrame, textCol: String, k: Int,
      idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 2, s"span seed width must be >= 2 tokens, got $k")
    // the native rolling window hasher — value-identical to
    // transform(shingles(tokens, k), strHash60) (ShingleHashesSpec),
    // but O(tokens·k) long arithmetic with no shingle-string
    // materialization: measured 3.5× cheaper end-to-end at sf0.1
    val occ = docs.selectExpr(s"$idCol AS doc_id",
        s"graft_shingle_hashes_all($textCol, $k) AS hs")
      .selectExpr("doc_id", "posexplode(hs) AS (pos0, h)")
      .selectExpr("doc_id", "cast(pos0 + 1 as bigint) AS pos", "h")
    val crossDoc = occ.groupBy(col("h"))
      .agg(min(col("doc_id")).as("dmin"), max(col("doc_id")).as("dmax"))
      .filter(col("dmin") =!= col("dmax"))
      .select(col("h"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    occ.join(crossDoc, Seq("h"))
      .select(col("doc_id"), col("pos"))
      .withColumn("brk",
        when(col("pos") - lag(col("pos"), 1).over(w) <= k, 0L).otherwise(1L))
      .withColumn("grp", sum(col("brk")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + lit(k - 1).cast("long")).as("span_end"),
        count(lit(1)).as("n_windows"))
      .selectExpr("doc_id", "span_start",
        "span_end - span_start + 1 AS span_tokens", "n_windows")
  }

  /** PAIR-attributed exact-substring spans — the face of the Lee et
    * al. ExactSubstr method that names the copying partner: for each
    * ordered document pair (d1 < d2), the maximal ALIGNED verbatim
    * token spans they share. Two occurrences of one k-window align on
    * the diagonal `diag = pos1 − pos2`; consecutive (gap ≤ k) matches
    * on one diagonal merge into a span, exactly the suffix-array
    * match extension. Repeated text matching at several alignments
    * yields one span per diagonal — the method's semantics, pinned.
    * Returns per pair: `d1, d2, n_spans, max_span_tokens,
    * span_tokens` (sum over aligned spans; alignments may overlap in
    * either document).
    *
    * The pair join is the one place a hot boilerplate shingle would
    * go quadratic, so hashes with more than `maxOcc` TOTAL
    * occurrences are dropped from pair generation (the t31/d02 df-cap
    * valve, mirrored in the oracle): every surviving hash fans out
    * ≤ maxOcc² position pairs. [[exactSubstrSpans]] keeps the uncapped
    * per-document truth; this operator names partners under the cap.
    *
    * 100 TB shape: seed emission map-only; the eligibility agg is
    * map-side combinable; pair generation is a hash-keyed self
    * equi-join with cap-bounded fan-out; span assembly is a
    * (d1, d2, diag)-partitioned window — state bounded by the shorter
    * document. */
  def exactSubstrPairSpans(docs: DataFrame, textCol: String, k: Int,
      maxOcc: Int, idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 2, s"span seed width must be >= 2 tokens, got $k")
    require(maxOcc >= 2, s"occurrence cap must be >= 2, got $maxOcc")
    val occ = docs.selectExpr(s"$idCol AS doc_id",
        s"graft_shingle_hashes_all($textCol, $k) AS hs")
      .selectExpr("doc_id", "posexplode(hs) AS (pos0, h)")
      .selectExpr("doc_id", "cast(pos0 + 1 as bigint) AS pos", "h")
    // saturation observability (VERDICT r13 #2): a cross-document hash
    // over the occurrence cap loses ALL its aligned-span partners —
    // count the pruned hashes so occ-cap recall collapse is a signal
    val eligible = occ.groupBy(col("h"))
      .agg(count(lit(1)).as("n_occ"),
        min(col("doc_id")).as("dmin"), max(col("doc_id")).as("dmax"))
      .observe(satMetricName(),
        sum(when(col("n_occ") > maxOcc && col("dmin") =!= col("dmax"), 1L)
          .otherwise(0L)).as("pruned_groups"),
        count(lit(1)).as("total_groups"))
      .filter(col("n_occ") <= maxOcc && col("dmin") =!= col("dmax"))
      .select(col("h"))
    val oc = occ.join(eligible, Seq("h"))
    val pr = oc.as("a").join(oc.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        col("a.pos").as("p1"), (col("a.pos") - col("b.pos")).as("diag"))
    val w = Window.partitionBy(col("d1"), col("d2"), col("diag")).orderBy(col("p1"))
    pr
      .withColumn("brk",
        when(col("p1") - lag(col("p1"), 1).over(w) <= k, 0L).otherwise(1L))
      .withColumn("grp", sum(col("brk")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("d1"), col("d2"), col("diag"), col("grp"))
      .agg((max(col("p1")) - min(col("p1")) + lit(k).cast("long")).as("span"))
      .groupBy(col("d1"), col("d2"))
      .agg(count(lit(1)).as("n_spans"),
        max(col("span")).as("max_span_tokens"),
        sum(col("span")).as("span_tokens"))
  }

  /** Train→eval SPAN CONTAMINATION — the n-gram-overlap train/test
    * leakage audit (the published GPT-3/PaLM contamination method:
    * flag evaluation text whose ≥k-token windows appear verbatim in
    * the training split): rows matching `evalPred` are the eval set,
    * everything else the train set, and each eval document reports
    * the maximal spans (gap-≤k island merge, as [[exactSubstrSpans]])
    * of windows that also occur ANYWHERE in train. Eval↔eval and
    * train↔train overlap deliberately does not count — only
    * train-side presence contaminates. Every eval document emits a
    * row (zero-filled when clean) — the audit table a release gate
    * reads top to bottom.
    *
    * Returns `doc_id, n_tokens, n_spans, contaminated_tokens,
    * contamination_micro` for eval documents.
    *
    * 100 TB shape: one window-hash emission pass over the whole
    * corpus (map-only, eval flag carried); the train-hash set is a
    * map-side-combinable hash agg; ONE hash-keyed equi-join flags
    * eval occurrences (hot hashes cost O(their eval occurrences));
    * island merge per eval doc; one left join zero-fills clean eval
    * docs. No pair join, no collect. */
  def spanContamination(docs: DataFrame, textCol: String, k: Int,
      evalPred: String, idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 2, s"span seed width must be >= 2 tokens, got $k")
    // evalPred is evaluated over the CALLER's columns (so it may
    // reference idCol by its original name); outputs are normalized
    // to doc_id like the rest of the ExactSubstr family (ADVICE r12).
    // NULL predicates coalesce to false = TRAIN — the CONSERVATIVE
    // side for an audit: an unknown-provenance row's windows count as
    // train presence (contamination is over-reported, never silently
    // under-reported by rows vanishing from both splits — the
    // [[decontaminationScrub]] rule, same direction).
    val base = docs.selectExpr(s"$idCol AS doc_id",
      s"coalesce(($evalPred), false) AS is_eval",
      s"graft_shingle_hashes_all($textCol, $k) AS hs",
      s"cast(size(${TextOps.tokens(textCol)}) as bigint) AS n_tokens")
    val occ = base
      .selectExpr("doc_id", "is_eval", "posexplode(hs) AS (pos0, h)")
      .selectExpr("doc_id", "is_eval", "cast(pos0 + 1 as bigint) AS pos", "h")
    val trainH = occ.filter(!col("is_eval"))
      .groupBy(col("h")).agg(count(lit(1)).as("__n")).select(col("h"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val spans = occ.filter(col("is_eval"))
      .join(trainH, Seq("h"))
      .select(col("doc_id"), col("pos"))
      .withColumn("brk",
        when(col("pos") - lag(col("pos"), 1).over(w) <= k, 0L).otherwise(1L))
      .withColumn("grp", sum(col("brk")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("grp"))
      .agg((max(col("pos")) - min(col("pos")) + lit(k).cast("long")).as("span"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"), sum(col("span")).as("contaminated_tokens"))
    base.filter(col("is_eval")).select(col("doc_id"), col("n_tokens"))
      .join(spans, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_spans", "contaminated_tokens"))
      .selectExpr("doc_id", "n_tokens", "n_spans", "contaminated_tokens",
        "cast(if(n_tokens = 0, 0, (cast(contaminated_tokens as decimal(38,0))" +
          " * 1000000) div n_tokens) as bigint) AS contamination_micro")
  }

  /** Cross-document exact-substring SCRUB — the removal face of the
    * Lee et al. 2021 ExactSubstr method (arXiv:2107.06499) that acts
    * on [[exactSubstrSpans]]' inventory: every k-token window whose
    * 60-bit hash occurs in ≥ 2 DISTINCT documents keeps exactly ONE
    * canonical copy corpus-wide (the lowest (doc_id, pos) occurrence)
    * and is scrubbed everywhere else; each document's text is rebuilt
    * from the surviving tokens. Overlapping removal windows union
    * their covered ranges (the [[scrubRepeatedPassages]] coverage
    * rule, via the same native [[graft.functions.ScrubKeep]]
    * two-pointer merge). Differs from [[scrubRepeatedPassages]] in
    * universe only: within-document-ONLY repeats are untouched here
    * (they are not cross-document duplication) — but later
    * occurrences of a cross-document-duplicated window inside the
    * canonical document itself ARE scrubbed, because only the single
    * (doc_id, pos)-minimal copy is canonical. Returns one row per
    * input document: `doc_id, n_before, n_after, text_scrubbed`
    * (documents with nothing to scrub pass through, n_after =
    * n_before).
    *
    * "Exact" is modulo the 60-bit window hash (p ≈ 2⁻⁶⁰ per
    * colliding pair); the oracle replays the same hash, and the
    * differential fuzz in ScrubSpec checks against a shingle-TEXT
    * reference, so a collision would surface there.
    *
    * 100 TB shape — linear passes, nothing quadratic, no collect:
    * window hashing is map-only (8-byte longs into the shuffle, via
    * the native rolling hasher); canonical election + the cross-doc
    * test ride ONE hash-partitioned window shuffle (row_number for
    * rank, whole-partition min/max doc_id for the ≥2-distinct-docs
    * test — same partitioning, no second exchange; millions of
    * fine-grained 60-bit keys, skew only on genuinely hot passages
    * whose groups still sort independently); removal starts aggregate
    * per doc (map-side combined, output bounded by tokens); one
    * doc-keyed equi-join rebuilds the text with the O(len + |cov|)
    * two-pointer keep merge. */
  def exactSubstrScrub(docs: DataFrame, textCol: String, k: Int,
      idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 2, s"span seed width must be >= 2 tokens, got $k")
    val tk = docs.selectExpr(s"$idCol AS doc_id", s"${TextOps.tokens(textCol)} AS t")
    val occ = docs.selectExpr(s"$idCol AS doc_id",
        s"graft_shingle_hashes_all($textCol, $k) AS hs")
      .selectExpr("doc_id", "posexplode(hs) AS (pos0, h)")
      .selectExpr("doc_id", "cast(pos0 + 1 as bigint) AS pos", "h")
    val part = Window.partitionBy(col("h"))
    val removals = occ
      .withColumn("rn", row_number().over(part.orderBy(col("doc_id"), col("pos"))))
      .withColumn("dmin", min(col("doc_id")).over(part))
      .withColumn("dmax", max(col("doc_id")).over(part))
      .filter(col("rn") >= 2 && col("dmin") =!= col("dmax"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("pos"))).as("cov"))
    tk.join(removals, Seq("doc_id"), "left")
      .selectExpr("doc_id", "t",
        "coalesce(cov, cast(array() as array<bigint>)) AS cov")
      .selectExpr("doc_id", "t", s"graft_scrub_keep(cov, $k, size(t)) AS kept")
      .selectExpr("doc_id",
        "cast(size(t) as bigint) AS n_before",
        "cast(size(kept) as bigint) AS n_after",
        "concat_ws(' ', transform(kept, j -> element_at(t, j))) AS text_scrubbed")
  }

  /** Per-document rollup of [[exactSubstrSpans]] — the curation
    * dashboard face: how many maximal cross-document verbatim spans
    * each document carries, their total token mass (spans are
    * disjoint by construction, so the sum IS the union coverage),
    * and the longest one. Documents with no span are absent. */
  def exactSubstrStats(docs: DataFrame, textCol: String, k: Int,
      idCol: String = "doc_id"): DataFrame =
    exactSubstrSpans(docs, textCol, k, idCol)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("span_tokens")).as("dup_tokens"),
        max(col("span_tokens")).as("max_span_tokens"))

  /** Train-side DECONTAMINATION SCRUB — the action half of the
    * contamination audits (n-gram spans [[spanContamination]]/p46,
    * fingerprints t05/t37, embeddings s39 — which FIND leakage but
    * whose only removal so far was document-level): every k-token
    * window of a TRAIN document whose 60-bit hash occurs ANYWHERE in
    * the eval set is scrubbed from the train document and the text
    * rebuilt from the surviving tokens — the surgical alternative to
    * dropping whole documents that the published decontamination
    * recipes apply (the GPT-3 appendix-C / PaLM method removes the
    * overlapping spans, not the documents). Rows matching `evalPred`
    * are the eval set; they are NOT rewritten (they are the
    * benchmark) and do not appear in the output. A row whose
    * `evalPred` evaluates to NULL counts as TRAIN (the predicate is
    * coalesced to false): it is scrubbed and kept, never silently
    * dropped. Train↔train overlap
    * deliberately survives — only eval-side presence contaminates
    * (the [[spanContamination]] direction, reversed onto the train
    * side: p46 reports how much eval text leaked; this removes that
    * text FROM train). Overlapping removal windows union their
    * covered ranges (the shared [[graft.functions.ScrubKeep]]
    * two-pointer merge). Returns one row per TRAIN document:
    * `doc_id, n_before, n_after, text_scrubbed` (clean docs pass
    * through, n_after = n_before).
    *
    * "Exact" is modulo the 60-bit window hash (p ≈ 2⁻⁶⁰ per
    * colliding pair); the oracle replays the same hash and the
    * ScrubSpec differential fuzz checks against a window-TEXT
    * reference, so a collision would surface there.
    *
    * 100 TB shape: window hashing is map-only (native rolling
    * hasher, 8-byte longs); the eval-hash set is bounded by the
    * benchmark (the s39 size-class contract) and BROADCAST after one
    * small distinct; coverage is one broadcast-joined scan of the
    * train occurrences + a per-doc map-side-combinable collect
    * (bounded by doc length); one doc-keyed equi-join rebuilds the
    * text with the O(len + |cov|) keep merge. No pair join, no
    * window shuffle, no collect. */
  def decontaminationScrub(docs: DataFrame, textCol: String, k: Int,
      evalPred: String, idCol: String = "doc_id"): DataFrame = {
    require(k >= 2, s"span seed width must be >= 2 tokens, got $k")
    // NULL-valued predicates (e.g. over a nullable metadata column)
    // coalesce to false = TRAIN: under three-valued logic a NULL row
    // would fail BOTH is_eval and NOT is_eval and silently vanish
    // from the scrubbed corpus — silent train-data loss, the worst
    // failure mode a rewrite can have. Unknown provenance is treated
    // as train (it gets scrubbed, never dropped).
    // `base` is referenced by three branches below (eval-hash
    // distinct, coverage join, train-side rebuild); Catalyst prunes
    // `hs` out of the rebuild branch and pushes the is_eval filters
    // below the projection ONLY while the predicate is deterministic
    // — keep `evalPred` deterministic, or cache `base` before a
    // nondeterministic predicate triples the corpus hash pass.
    val base = docs.selectExpr(s"$idCol AS doc_id",
      s"coalesce(($evalPred), false) AS is_eval",
      s"${TextOps.tokens(textCol)} AS t",
      s"graft_shingle_hashes_all($textCol, $k) AS hs")
    val occ = base
      .selectExpr("doc_id", "is_eval", "posexplode(hs) AS (pos0, h)")
      .selectExpr("doc_id", "is_eval", "cast(pos0 + 1 as bigint) AS pos", "h")
    val evalH = occ.filter(col("is_eval")).select(col("h")).distinct()
    val cov = occ.filter(!col("is_eval"))
      .join(broadcast(evalH), Seq("h"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("pos"))).as("cov"))
    base.filter(!col("is_eval")).select(col("doc_id"), col("t"))
      .join(cov, Seq("doc_id"), "left")
      .selectExpr("doc_id", "t",
        "coalesce(cov, cast(array() as array<bigint>)) AS cov")
      .selectExpr("doc_id", "t", s"graft_scrub_keep(cov, $k, size(t)) AS kept")
      .selectExpr("doc_id",
        "cast(size(t) as bigint) AS n_before",
        "cast(size(kept) as bigint) AS n_after",
        "concat_ws(' ', transform(kept, j -> element_at(t, j))) AS text_scrubbed")
  }

  /** SimHash near-dup pairs with Hamming distance <= maxHamming,
    * candidate-generated by 4 bands of 15 bits. Pigeonhole: for
    * maxHamming <= 3, at most 3 of the 4 bands can differ, so every
    * true pair shares >= 1 exact band — full recall, so a brute-force
    * oracle matches exactly. EAGER ([[Storage.withCached]]); release
    * the result via [[Storage.release]]. */
  def simhashPairs(docs: DataFrame, textCol: String, maxHamming: Int): DataFrame = {
    require(maxHamming <= 3, "4-band LSH guarantees recall only for hamming <= 3")
    Storage.withCached(simhashes(docs, textCol))(simhashPairsFrom(_, maxHamming))
  }

  private[graft] def simhashPairsFrom(sh: DataFrame, maxHamming: Int): DataFrame = {
    val bandRows = sh.selectExpr("doc_id", "simhash",
        "explode(transform(sequence(0, 3), b -> struct(b AS band, (shiftright(simhash, b * 15) % 32768) AS bucket))) AS bb")
      .select(col("doc_id"), col("simhash"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    bandRows.as("a")
      .join(bandRows.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        col("a.simhash").as("sh1"), col("b.simhash").as("sh2"))
      .distinct()
      .selectExpr("d1", "d2", "cast(bit_count(sh1 ^ sh2) as bigint) AS hamming")
      .filter(col("hamming") <= maxHamming)
  }

  /** Band-SKEW saturation audit over a banded candidate frame — the
    * hot-BUCKET analog of [[dfSaturationAudit]] (which audits shingle
    * df, the other way a capped/banded candidate generator degrades):
    * an adversarial corpus that funnels documents into one band
    * bucket turns the banded equi-join ([[minhashLshPairsFrom]],
    * [[simhashPairsFrom]]) quadratic with NO df-side signal, because
    * band buckets hash whole signature slices, not shingles. This
    * 1-row audit is the pre-join gate: the candidate-pair mass the
    * banding will emit (`Σ C(sz,2)` over buckets), the fattest single
    * bucket anywhere, the band carrying the most pair mass, and the
    * share of all candidate pairs owned by the single hottest bucket
    * (`hot_bucket_pairs / cand_pairs`, micro units) — read
    * `skew_micro` near 1e6 as "one mega-bucket owns the join".
    *
    * Input: one row per (doc, band) with its bucket key — the exact
    * frame the pair joins bucket on. Returns one row: `n_buckets`
    * (occupied (band, bucket) cells), `max_bucket` (fattest bucket
    * membership), `cand_pairs`, `hot_bucket_pairs` (pair mass of that
    * fattest bucket; ties resolved by the mass itself — C(sz,2) is
    * monotone in sz), `top_band` (band with the largest pair mass,
    * ties → lowest band), `top_band_pairs`, `skew_micro`.
    *
    * 100 TB shape: one map-side-combinable ((band, bucket) → sz)
    * aggregation over the banded frame — the same exchange key the
    * pair join itself would use — a ≤`bands`-row per-band fold, and a
    * 1-row fold; strictly cheaper than the banded join it gates. */
  def bandSkewAuditFrom(bandRows: DataFrame): DataFrame = {
    val perBand = bandRows
      .groupBy(col("band"), col("bucket")).agg(count(lit(1)).as("sz"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_buckets"), max(col("sz")).as("max_bucket"),
        sum(expr("sz * (sz - 1) div 2")).as("band_pairs"))
    perBand
      // struct max = (band_pairs DESC, band ASC) argmax: field-wise
      // struct ordering, band negated so ties elect the LOWEST band
      .agg(coalesce(sum(col("n_buckets")), lit(0L)).as("n_buckets"),
        coalesce(max(col("max_bucket")), lit(0L)).as("max_bucket"),
        coalesce(sum(col("band_pairs")), lit(0L)).as("cand_pairs"),
        max(expr("named_struct('p', band_pairs, 'nb', -band)")).as("top"))
      .selectExpr("n_buckets", "max_bucket", "cand_pairs",
        "max_bucket * (max_bucket - 1) div 2 AS hot_bucket_pairs",
        "cast(coalesce(-top.nb, 0) as bigint) AS top_band",
        "coalesce(top.p, 0L) AS top_band_pairs",
        "if(cand_pairs = 0, 0L, (max_bucket * (max_bucket - 1) div 2)" +
          " * 1000000 div cand_pairs) AS skew_micro")
  }

  /** [[bandSkewAuditFrom]] over [[simhashPairsFrom]]'s exact banding
    * (4 bands × 15 bits of the 60-bit SimHash) — the previously
    * unaudited banded join (MinHash banding has [[lshBandStats]];
    * SimHash's 4×15-bit buckets had no hot-bucket signal at all). */
  def simhashBandSkewAudit(docs: DataFrame, textCol: String): DataFrame =
    bandSkewAuditFrom(simhashes(docs, textCol)
      .selectExpr("doc_id",
        "explode(transform(sequence(0, 3), b -> struct(cast(b as bigint) AS band, (shiftright(simhash, b * 15) % 32768) AS bucket))) AS bb")
      .select(col("bb.band").as("band"), col("bb.bucket").as("bucket")))

  /** [[bandSkewAuditFrom]] over [[minhashLshPairsFrom]]'s exact
    * banding (k-perm signature, `bands` slices folded to a bucket
    * key) — the 1-row companion to [[lshBandStats]]'s per-band rows,
    * directly comparable with [[dfSaturationAudit]]'s shape. */
  def minhashBandSkewAudit(docs: DataFrame, textCol: String, n: Int,
      k: Int, bands: Int): DataFrame = {
    val r = k / bands
    require(bands * r == k, s"bands $bands must divide k $k")
    bandSkewAuditFrom(minhashSignatures(docs, textCol, n, k)
      .selectExpr("doc_id",
        s"explode(transform(sequence(0, ${bands - 1}), " +
          s"b -> struct(cast(b as bigint) AS band, ${TextOps.foldHash(s"slice(sig, b * $r + 1, $r)")} AS bucket))) AS bb")
      .select(col("bb.band").as("band"), col("bb.bucket").as("bucket")))
  }

  /** Paragraph-granularity duplication accounting (the Lee et al.
    * "Deduplicating Training Data Makes Language Models Better"
    * audit, arXiv:2107.06499, at fixed segment width): each doc is
    * cut into NON-overlapping `width`-token segments (the tail
    * shorter than `width` is ignored — a pinned, replayable rule), a
    * segment instance is *duplicated* when the same token run occurs
    * in at least one OTHER document, and the per-source report is the
    * corpus-curation number: what fraction of a source's training
    * segments is boilerplate shared across documents.
    *
    * 100 TB shape: tokens are hashed once (map-only), segment keys
    * are 8-byte rolling folds of the hash slices — never segment
    * text — so the only shuffles are a (seg_hash, doc_id)-distinct
    * partial agg, the seg-level doc-frequency agg, and one equi-join
    * back onto instances; all key-bucketed, no self-join, no
    * collect. Segment doc-frequency is capped by dup-group size and
    * every group key is a long.
    *
    * Returns one row per source:
    * `source, n_docs_segmented, n_segments, n_dup_segments,
    * dup_micro` (micro-share of duplicated instances). */
  def segmentDupStats(docs: DataFrame, textCol: String, width: Int): DataFrame = {
    require(width >= 1, s"segment width must be >= 1, got $width")
    val toks = TextOps.tokens(textCol)
    val th = TextOps.hashAll("t")
    val seg = TextOps.foldHash(s"slice(th, (i - 1) * $width + 1, $width)")
    val inst = docs
      .selectExpr("doc_id", "source", s"$toks AS t")
      .where(s"size(t) >= $width") // Spark sequence(1,0) is DESCENDING — guard it out
      .selectExpr("doc_id", "source", s"$th AS th")
      .selectExpr("doc_id", "source",
        s"explode(transform(sequence(1, size(th) div $width), i -> $seg)) AS seg")
    val docFreq = inst.select(col("seg"), col("doc_id")).distinct()
      .groupBy(col("seg")).agg(count(lit(1)).as("seg_docs"))
    inst.join(docFreq, Seq("seg"))
      .selectExpr("source", "doc_id", "cast(seg_docs >= 2 as bigint) AS is_dup")
      .groupBy(col("source"))
      .agg(countDistinct(col("doc_id")).as("n_docs_segmented"),
        count(lit(1)).as("n_segments"),
        coalesce(sum(col("is_dup")), lit(0L)).as("n_dup_segments"))
      .selectExpr("source", "n_docs_segmented", "n_segments", "n_dup_segments",
        "cast((cast(n_dup_segments as decimal(38,0)) * 1000000) div n_segments as bigint) AS dup_micro")
      .orderBy(col("source"))
  }

  /** Token savings under exact segment dedup — the "how much smaller
    * does this source get if we keep ONE copy of every repeated
    * `width`-token run" planning number ([[segmentDupStats]] tells
    * you dup MASS; this prices the CUT). The keeper of each segment
    * group is pinned (smallest (doc_id, position) — a total order
    * both engines replay); every other instance is redundant and its
    * `width` tokens count as savings against the source holding it.
    *
    * 100 TB shape: same keys as [[segmentDupStats]] — one
    * (seg → min packed position) partial agg, one equi-join back,
    * plus a map-only per-source token total; positions pack into one
    * BIGINT (doc_id · 2^20 + idx, idx < 2^20 — a corpus doc is
    * capped far below a million segments by the oversize-row guards).
    *
    * Returns one row per source: `source, n_tokens, n_segments,
    * n_redundant_segments, effective_tokens, savings_micro`. */
  def segmentDedupSavings(docs: DataFrame, textCol: String, width: Int): DataFrame = {
    require(width >= 1, s"segment width must be >= 1, got $width")
    val toks = TextOps.tokens(textCol)
    val th = TextOps.hashAll("t")
    val seg = TextOps.foldHash(s"slice(th, (i - 1) * $width + 1, $width)")
    val inst = docs
      .selectExpr("doc_id", "source", s"$toks AS t")
      .where(s"size(t) >= $width") // Spark sequence(1,0) is DESCENDING — guard it out
      .selectExpr("doc_id", "source", s"$th AS th")
      .selectExpr("doc_id", "source",
        s"posexplode(transform(sequence(1, size(th) div $width), i -> $seg)) AS (idx, seg)")
      .selectExpr("doc_id", "source", "idx", "seg",
        "doc_id * 1048576 + idx AS packed")
    val keeper = inst.groupBy(col("seg")).agg(min(col("packed")).as("keep_packed"))
    val red = inst.join(keeper, Seq("seg"))
      .selectExpr("source", "cast(packed != keep_packed as bigint) AS is_red")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_segments"),
        coalesce(sum(col("is_red")), lit(0L)).as("n_redundant_segments"))
    val tok = docs.selectExpr("source", s"cast(size($toks) as bigint) AS nt")
      .groupBy(col("source")).agg(coalesce(sum(col("nt")), lit(0L)).as("n_tokens"))
    tok.join(red, Seq("source"), "left")
      .na.fill(0L, Seq("n_segments", "n_redundant_segments"))
      .selectExpr("source", "n_tokens", "n_segments", "n_redundant_segments",
        s"n_tokens - n_redundant_segments * $width AS effective_tokens",
        s"cast((cast(n_redundant_segments as decimal(38,0)) * $width * 1000000) div n_tokens as bigint) AS savings_micro")
      .orderBy(col("source"))
  }

  /** Memorization-risk (k-anonymity) window audit — the INVERSE of
    * the dedup family's question: instead of windows that occur too
    * OFTEN (exact-substring dedup, df saturation), this counts
    * windows that occur too RARELY. An n-token window with corpus
    * frequency below `kAnon` is a rare span — the class of sequence a
    * model can only reproduce by memorizing its single source (the
    * "secret sharer" / canary-extraction risk surface), and the
    * k-anonymity bar privacy-reviewed corpora are held to. Per
    * source: window mass, rare-window mass and share, how many docs
    * carry any rare window, and the worst doc (most rare windows,
    * ties to the lowest doc_id) — the row a privacy pass reads to
    * decide where to point a targeted scrub.
    *
    * Frequency is per OCCURRENCE (a window repeated inside one doc
    * counts each time) over the 60-bit shingle hash — a collision
    * (p ≈ 2^-60 per pair) can only UNDER-count rarity, the safe
    * direction for an alarm that fires on rare spans. Docs shorter
    * than n tokens carry no windows and are invisible to the audit;
    * sources whose every doc is short are absent from the output.
    *
    * 100 TB shape: one (hash)-keyed map-side-combinable count agg,
    * one hash equi-join back to the occurrences (both sides already
    * hash-partitioned — no broadcast of the rare set, which at real
    * scale is MOST windows), then two keyed aggs down to
    * O(docs) and O(sources) rows. The worst-doc argmax is a
    * max(struct) fold, not a window. */
  def rareWindowAudit(docs: DataFrame, textCol: String, n: Int,
      kAnon: Int, srcCol: String = "source"): DataFrame =
    rareWindowPerDoc(docs, textCol, n, kAnon, srcCol).groupBy(col("source"))
      .agg(sum(col("w_all")).as("n_windows"),
        sum(col("w_rare")).as("n_rare"),
        sum(expr("if(w_rare > 0, 1L, 0L)")).as("n_docs_rare"),
        max(struct(col("w_rare"), (-col("doc_id")).as("nd"))).as("m"))
      .selectExpr("source", "n_windows", "n_rare",
        "cast((cast(n_rare as decimal(38,0)) * 1000000) div n_windows as bigint)" +
          " AS rare_share_micro",
        "n_docs_rare", "-m.nd AS top_doc_id", "m.w_rare AS top_doc_rare")
      .orderBy(col("source"))

  /** [[rareWindowAudit]]'s per-doc frame — (source, doc_id, w_all,
    * w_rare, rare_share_micro); docs shorter than n carry no windows
    * and are absent. The share divides by the doc's OWN window count,
    * so a one-window doc whose window is rare reads 1e6. Shared by
    * the audit (aggregates it per source) and the privacy GATE
    * (filters on it per doc). */
  def rareWindowPerDoc(docs: DataFrame, textCol: String, n: Int,
      kAnon: Int, srcCol: String = "source"): DataFrame = {
    require(n >= 1, s"rareWindowPerDoc needs n >= 1, got $n")
    require(kAnon >= 2, s"rareWindowPerDoc needs kAnon >= 2, got $kAnon")
    val occ = docs.selectExpr(s"$srcCol AS source", "doc_id",
      s"explode(graft_shingle_hashes_all($textCol, $n)) AS sgl")
    val df = occ.groupBy(col("sgl")).agg(count(lit(1)).as("c"))
    occ.join(df, Seq("sgl"))
      .groupBy(col("source"), col("doc_id"))
      .agg(count(lit(1)).as("w_all"),
        sum(expr(s"if(c < $kAnon, 1L, 0L)")).as("w_rare"))
      .selectExpr("source", "doc_id", "w_all", "w_rare",
        "cast((cast(w_rare as decimal(38,0)) * 1000000) div w_all as bigint)" +
          " AS rare_share_micro")
  }

  /** The ACT face of [[rareWindowAudit]]: drop every doc whose
    * rare-window share exceeds `maxShareMicro` — the doc-level
    * mitigation for memorization risk (a doc made mostly of
    * corpus-unique n-grams is the serial-number/PII-dump shape; a
    * doc with a few rare windows is just original text, which is why
    * the gate is a SHARE threshold, not a count). Docs shorter than
    * n tokens carry no windows, cannot leak an n-token span, and
    * pass with zeros.
    *
    * @return surviving docs: (doc_id, source, w_all, w_rare,
    *         rare_share_micro).
    *
    * 100 TB shape: [[rareWindowPerDoc]]'s two linear passes + one
    * doc-keyed equi-join back to the corpus — the gate adds no new
    * shuffle class. */
  def privacyGate(docs: DataFrame, textCol: String, n: Int, kAnon: Int,
      maxShareMicro: Long, srcCol: String = "source"): DataFrame = {
    require(maxShareMicro >= 0L && maxShareMicro <= 1000000L,
      s"maxShareMicro must be in [0, 1e6], got $maxShareMicro")
    val pd = rareWindowPerDoc(docs, textCol, n, kAnon, srcCol)
      .select(col("doc_id"), col("w_all"), col("w_rare"),
        col("rare_share_micro"))
    docs.selectExpr("doc_id", s"$srcCol AS source")
      .join(pd, Seq("doc_id"), "left")
      .selectExpr("doc_id", "source",
        "coalesce(w_all, 0L) AS w_all", "coalesce(w_rare, 0L) AS w_rare",
        "coalesce(rare_share_micro, 0L) AS rare_share_micro")
      .filter(col("rare_share_micro") <= maxShareMicro)
  }

  /** Source×source shingle-overlap matrix from UNION MinHash sketches
    * — the corpus-level "which of my sources are secretly the same
    * crawl?" diagnostic. t42's exact vocab Jaccard answers it at
    * unigram granularity by materializing vocabularies; this answers
    * it at n-gram granularity in one bounded sketch pass: MinHash is
    * mergeable (the sketch of a UNION is the element-wise min of the
    * sketches), so per-source signatures fold from the per-doc native
    * signatures without ever materializing a source's shingle set,
    * and each pair's slot-match rate estimates the n-gram Jaccard
    * between the FULL sources.
    *
    * @return one row per source pair s1 < s2: (s1, s2, matches,
    *         est_jaccard_micro = matches·1e6 div k).
    *
    * 100 TB shape: per-doc signatures are a map-only projection
    * (O(len·k) each); the union fold is one (source, slot)-keyed
    * partial-aggregable min over docs×k 8-byte rows; the pair matrix
    * is a broadcast self-join of the O(sources · k) frame. Nothing
    * scales with shingle cardinality past the map stage. */
  /** Per-source UNION MinHash signatures (the mergeable-sketch fold
    * shared by [[sourceOverlapSketch]] and
    * [[sourceContainmentSketch]]): per-doc native signatures folded
    * element-wise by a (source, slot)-keyed min. */
  private def sourceSketches(docs: DataFrame, textCol: String, n: Int,
      k: Int, srcCol: String): DataFrame =
    docs.selectExpr(s"$srcCol AS source",
        s"graft_shingle_hashes($textCol, $n) AS hs")
      .selectExpr("source", s"${TextOps.minhashSig("hs", k)} AS sig")
      .selectExpr("source", "posexplode(sig) AS (i, v)")
      .groupBy(col("source"), col("i")).agg(min(col("v")).as("v"))
      .groupBy(col("source"))
      .agg(sort_array(collect_list(struct(col("i"), col("v")))).as("sv"))
      .selectExpr("source", "transform(sv, x -> x.v) AS sig")

  def sourceOverlapSketch(docs: DataFrame, textCol: String, n: Int,
      k: Int, srcCol: String = "source"): DataFrame = {
    require(k >= 1, s"sourceOverlapSketch needs k >= 1, got $k")
    val srcSigs = sourceSketches(docs, textCol, n, k, srcCol)
    srcSigs.as("a")
      .join(broadcast(srcSigs.as("b")), col("a.source") < col("b.source"))
      .selectExpr("a.source AS s1", "b.source AS s2",
        s"cast(size(filter(sequence(1, $k)," +
          " i -> element_at(a.sig, i) = element_at(b.sig, i))) as bigint)" +
          " AS matches")
      .selectExpr("s1", "s2", "matches",
        s"cast(matches * 1000000 div $k as bigint) AS est_jaccard_micro")
      .orderBy(col("s1"), col("s2"))
  }

  /** Asymmetric source CONTAINMENT estimates — [[sourceOverlapSketch]]
    * answers "how similar are two sources"; this answers "is source A
    * INSIDE source B" (the re-crawl / re-release detector: a 1%-sized
    * subset crawl has tiny Jaccard but containment ≈ 1). From the
    * same union sketches plus each source's EXACT distinct n-gram
    * count: with est J = m/(k) slot matches, |A∩B| ≈ (m/(k+m))·
    * (|A|+|B|) (the standard J→intersection identity), so
    * containment(A in B) = |A∩B|/|A| lands as the exact-integer
    * expression `m·(n1+n2)·1e6 div ((k+m)·n1)` — both engines
    * replay it, so the estimate itself is cell-exact.
    *
    * @return one row per ordered-free pair s1 < s2: (s1, s2, matches,
    *         n1, n2, cont_1in2_micro, cont_2in1_micro).
    *
    * 100 TB shape: [[sourceSketches]]'s fold + one (source,hash)
    * distinct count (two-stage keyed agg, map-side combinable) + the
    * O(sources·k) broadcast self-join — shingle cardinality never
    * survives past the two keyed aggs. */
  def sourceContainmentSketch(docs: DataFrame, textCol: String, n: Int,
      k: Int, srcCol: String = "source"): DataFrame = {
    require(k >= 1, s"sourceContainmentSketch needs k >= 1, got $k")
    val srcSigs = sourceSketches(docs, textCol, n, k, srcCol)
    val sizes = docs.selectExpr(s"$srcCol AS source",
        s"explode(graft_shingle_hashes($textCol, $n)) AS sgl")
      .groupBy(col("source"), col("sgl")).agg(count(lit(1)).as("c"))
      .groupBy(col("source")).agg(count(lit(1)).as("nsz"))
    val sized = srcSigs.join(sizes, Seq("source"))
    sized.as("a")
      .join(broadcast(sized.as("b")), col("a.source") < col("b.source"))
      .selectExpr("a.source AS s1", "b.source AS s2",
        s"cast(size(filter(sequence(1, $k)," +
          " i -> element_at(a.sig, i) = element_at(b.sig, i))) as bigint)" +
          " AS matches",
        "a.nsz AS n1", "b.nsz AS n2")
      .selectExpr("s1", "s2", "matches", "n1", "n2",
        s"cast((cast(matches as decimal(38,0)) * (n1 + n2) * 1000000)" +
          s" div ((cast($k as decimal(38,0)) + matches) * n1) as bigint)" +
          " AS cont_1in2_micro",
        s"cast((cast(matches as decimal(38,0)) * (n1 + n2) * 1000000)" +
          s" div ((cast($k as decimal(38,0)) + matches) * n2) as bigint)" +
          " AS cont_2in1_micro")
      .orderBy(col("s1"), col("s2"))
  }
}
