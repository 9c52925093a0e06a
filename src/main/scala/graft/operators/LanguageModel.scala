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
  *  - [[bigramSurprisal]] is a pure plan builder — lazy, no action,
  *    no driver state. To score many batches (or held-out corpora)
  *    under one model, fit the [[BigramModel]] artifact ONCE
  *    ([[fitBigramModel]]: a single corpus pass producing BOTH count
  *    tables) and feed [[bigramSurprisalWith]] — the
  *    [[Dedup.fitMinhashSignatures]] / [[Bpe.fit]] fit-once
  *    discipline; at 100 TB the model fit dwarfs any scoring batch.
  */
object LanguageModel {

  /** The fitted model — ONE checkpointed O(2B) table
    * (`kind`, `bucket`, `n`): kind 0 rows are context-bucket counts
    * c(w1 ·), kind 1 rows bigram-bucket counts c(w1 w2). Built by a
    * single corpus pass in [[fitBigramModel]]; consumed lazily (and
    * broadcast) by any number of [[bigramSurprisalWith]] calls.
    * Caller owns the blocks: materialize every consumer result
    * BEFORE [[release]] (the [[Storage]] ownership contract). */
  final case class BigramModel private[graft] (buckets: Int, counts: DataFrame) {
    /** context-bucket counts (`ctx_b`, `cc`) — lazy view over the
      * checkpoint. */
    def cc: DataFrame =
      counts.filter(col("kind") === 0)
        .select(col("bucket").as("ctx_b"), col("n").as("cc"))
    /** bigram-bucket counts (`big_b`, `cb`) — lazy view over the
      * checkpoint. */
    def cb: DataFrame =
      counts.filter(col("kind") === 1)
        .select(col("bucket").as("big_b"), col("n").as("cb"))
    /** free the model's checkpoint blocks; consumers must not run
      * afterwards. */
    def release(): Unit = Storage.release(counts)
  }

  /** Fit ONCE: both count tables in a SINGLE corpus pass — each gram
    * explodes to its (context, bigram) bucket pair and one
    * (kind, bucket)-keyed map-side-combined aggregation produces the
    * O(2B) table, checkpointed. ([[bigramSurprisal]]'s inline lazy
    * plan walks the corpus once per count table; the artifact halves
    * that AND amortizes it across every scoring batch.) */
  def fitBigramModel(corpus: DataFrame, textCol: String, buckets: Int): BigramModel = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val counts = Storage.checkpointed(
      gramsPlan(corpus, textCol, buckets)
        .selectExpr("explode(array(named_struct('kind', 0, 'bucket', ctx_b), " +
          "named_struct('kind', 1, 'bucket', big_b))) AS e")
        .selectExpr("e.kind AS kind", "e.bucket AS bucket")
        .groupBy(col("kind"), col("bucket")).agg(count(lit(1)).as("n")))
    BigramModel(buckets, counts)
  }

  /** Per-document fluency: (`doc_id`, `n_bigrams`,
    * `surprisal_micro` = Σ micro(1/p), `mean_inv_micro` =
    * surprisal_micro div n_bigrams). Docs with fewer than 2 tokens
    * have no bigrams and score 0. Fits the model on `corpus` itself
    * (lazy, self-contained); to reuse one model across batches, see
    * [[fitBigramModel]] + [[bigramSurprisalWith]]. */
  def bigramSurprisal(corpus: DataFrame, textCol: String, buckets: Int): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val grams = gramsPlan(corpus, textCol, buckets)
    val cc = grams.groupBy(col("ctx_b")).agg(count(lit(1)).as("cc"))
    val cb = grams.groupBy(col("big_b")).agg(count(lit(1)).as("cb"))
    scoreTail(corpus, grams, cc, cb, buckets)
  }

  /** The [[bigramSurprisal]] scoring plan for `corpus` under an
    * ALREADY-FITTED model — LAZY, no corpus pass beyond the scoring
    * read itself. The scored corpus need not be the fitted corpus
    * (held-out batches score under the training distribution);
    * buckets the fit never saw take c = 0 via the left joins —
    * add-one smoothing handles them by construction
    * (1/p = (0 + B) / (0 + 1)). Materialize the result before
    * [[BigramModel.release]]. */
  def bigramSurprisalWith(model: BigramModel, corpus: DataFrame,
      textCol: String): DataFrame = {
    val grams = gramsPlan(corpus, textCol, model.buckets)
    scoreTail(corpus, grams, model.cc, model.cb, model.buckets)
  }

  /** hashed (doc_id, ctx_b, big_b) gram stream.
    * explode_outer + post-Generate filter: a plain explode makes the
    * optimizer infer a size(...)>0 PRE-filter duplicating the whole
    * tokenize+shingle expression below the Generate (the t05
    * lesson). */
  /** Collocation mining: adjacent token pairs ranked by association
    * LIFT — observed bigram count vs the count independence predicts,
    * `lift_micro = floor(c_xy · T · 1e6 / (c_x · c_y))` with T = total
    * tokens (PMI's argument scaled by the constant T_bigrams/T, which
    * preserves the ranking; no log, so the score stays exact-integer
    * and hash-comparable across engines). `minCount` suppresses the
    * noise floor (a pair seen twice can have huge lift by luck);
    * `topK` with a total ORDER BY (lift desc, x, y) makes the result
    * deterministic.
    *
    * 100 TB shape: one corpus pass to bigram counts (partial-agg
    * shuffle), unigram counts likewise, two equi-joins on the small
    * post-minCount survivor set, one top-K sort of that survivor set.
    * Overflow contract: `c_xy · T` and `lift · c_x · c_y` must stay in
    * Int64 — require'd on the actual aggregates before scoring
    * (max(c_xy) · T < 2^63; at larger T rescale via minCount or
    * sampling first). */
  def pmiCollocations(corpus: DataFrame, textCol: String, minCount: Long,
      topK: Int): DataFrame = {
    require(minCount >= 1L, s"minCount must be >= 1, got $minCount")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val toks = corpus.selectExpr(s"${TextOps.tokens(textCol)} AS t")
      .filter(size(col("t")) >= 2)
    val bi = Storage.checkpointed(toks
      .selectExpr("explode(zip_with(slice(t, 1, size(t) - 1), " +
        "slice(t, 2, size(t) - 1), (x, y) -> struct(x AS x, y AS y))) AS b")
      .select(col("b.x").as("x"), col("b.y").as("y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("cxy"))
      .filter(col("cxy") >= minCount))
    try {
      val uni = corpus.selectExpr(s"explode(${TextOps.tokens(textCol)}) AS w")
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
      val t = uni.agg(sum(col("c"))).head.getLong(0)
      val maxCxy = bi.agg(max(col("cxy"))).head.
        // empty survivor set: nothing to score, nothing to overflow
        getAs[Any](0) match { case null => 0L; case v: Long => v }
      require(BigInt(maxCxy) * BigInt(t) * BigInt(1000000L) < BigInt(Long.MaxValue),
        s"pmiCollocations exact-integer contract: max(cxy)($maxCxy) * T($t) * 1e6 " +
          "must stay below 2^63; raise minCount or pre-sample")
      // EAGER (the withCached lifecycle): materialize the top-K before
      // releasing the bigram checkpoint it reads — the caller owns and
      // releases the O(topK) result blocks
      Storage.checkpointed(bi
        .join(uni.select(col("w").as("x"), col("c").as("cx")), Seq("x"))
        .join(uni.select(col("w").as("y"), col("c").as("cy")), Seq("y"))
        .selectExpr("x", "y", "cxy", "cx", "cy",
          s"(cxy * ${t}L * 1000000L) div (cx * cy) AS lift_micro")
        .orderBy(col("lift_micro").desc, col("x"), col("y"))
        .limit(topK))
    } finally Storage.release(bi)
  }

  /** CCNet's actual bucketing step (Wenzek et al. 2019 §4.3, public
    * method): fit a PER-LANGUAGE model, score every document under its
    * own language's model, and split each language into head / middle
    * / tail thirds by fluency — head is what CCNet keeps by default.
    * This operator realizes it with the house bigram surrogate: the
    * count tables are keyed by (lang, bucket) so each language gets
    * its own add-one-smoothed conditional distribution, and the cuts
    * are TYPE-1 discrete tertiles of `mean_inv_micro` per language
    * (the value at rank ⌈n/3⌉ / ⌈2n/3⌉ of the scored docs). Bucket
    * assignment is BY VALUE against the cuts (head ≤ cut1 < middle ≤
    * cut2 < tail), so tie groups never straddle a boundary and the
    * assignment replays engine-independently. Docs with < 2 tokens
    * have no bigrams, score under no model, and land in 'unscored'.
    *
    * Returns one row per document: (doc_id, lang, n_bigrams,
    * mean_inv_micro, cut1_micro, cut2_micro, bucket) — cuts NULL for
    * unscored docs.
    *
    * 100 TB shape: ONE fit pass to both (lang, bucket)-keyed count
    * tables (kind-exploded single aggregation, map-side combinable,
    * checkpointed O(2·L·B) rows, broadcast back); ONE scoring pass
    * (map-side count joins + a doc-keyed partial-agg shuffle) whose
    * O(docs) result is cached across its two consumers; the tertile
    * lookup rides the grouped value-range bucketed cumsum
    * ((lang, range-bucket) window keys — no language ever rides a
    * single-partition window, the q88/groupedMedian discipline); doc
    * assignment joins the broadcast O(L)-row cut frame. EAGER (the
    * [[Storage.withCached]] contract): executes at call time; call
    * [[Storage.release]] on the result after the terminal action. */
  def ccnetBuckets(corpus: DataFrame, textCol: String, langCol: String,
      buckets: Int): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    // EAGER (the Storage.withCached lifecycle): exactly TWO gram-level
    // corpus passes — one fit (both per-language count tables from a
    // single kind-exploded aggregation, the fitBigramModel idiom,
    // checkpointed O(2·L·B)) and one scoring pass whose per-doc result
    // is cached while the tertile cuts AND the final assignment both
    // read it (the lazy form re-tokenized the corpus up to six times:
    // cc, cb, and twice-consumed scored each re-derived the gram
    // stream). Caller owns the result's checkpoint blocks
    // (Storage.release after the terminal action).
    val grams = gramsPlanLang(Storage.parallelFloor(corpus), textCol,
      langCol, buckets)
    val counts = Storage.checkpointed(countsPlanLang(grams))
    // fill-first ladder (r16): the scored frame is consumed by the
    // tertile cuts, the per-lang counts AND the assignment join in
    // ONE job — three racing stages each stall on the others' cache
    // fills. Materialize the cache with a single count() first, so
    // the gram scoring runs exactly once and the consumers read
    // cached rows.
    val scored = scoredPlanLang(grams, counts, buckets)
    scored.cache()
    // fill-first KEPT for p50 (r17 re-measure, VERDICT r16 #1: quick
    // n=8 min 3.98 without the count() vs 3.71 with — one cache with
    // three racing consumers is the case the ladder pays for; d09's
    // two-cache double-count() variant measured the opposite and was
    // reverted, see weightedJaccardPairs)
    try Storage.checkpointed({ scored.count(): Unit
      assignPlanLang(corpus, langCol, scored) })
    finally {
      scored.unpersist(blocking = false); Storage.release(counts)
    }
  }

  /** hashed (doc_id, lang, ctx_b, big_b) gram stream — [[gramsPlan]]
    * with the language key carried. */
  private[graft] def gramsPlanLang(corpus: DataFrame, textCol: String,
      langCol: String, buckets: Int): DataFrame =
    corpus
      .selectExpr("doc_id", s"$langCol AS lang", s"${TextOps.tokens(textCol)} AS t")
      .selectExpr("doc_id", "lang",
        s"explode_outer(${TextOps.shingles("t", 2)}) AS s")
      .filter(col("s").isNotNull)
      .selectExpr("doc_id", "lang",
        s"${TextOps.strHash("substring_index(s, ' ', 1)")} % $buckets AS ctx_b",
        s"${TextOps.strHash("s")} % $buckets AS big_b")

  /** both (lang, bucket)-keyed count tables from ONE pass over the
    * gram stream (kind 0 = context, kind 1 = bigram) — the
    * [[fitBigramModel]] single-pass idiom with the language key. */
  private[graft] def countsPlanLang(grams: DataFrame): DataFrame =
    grams
      .selectExpr("lang",
        "explode(array(named_struct('kind', 0, 'bucket', ctx_b), " +
          "named_struct('kind', 1, 'bucket', big_b))) AS e")
      .selectExpr("lang", "e.kind AS kind", "e.bucket AS bucket")
      .groupBy(col("lang"), col("kind"), col("bucket")).agg(count(lit(1)).as("n"))

  /** per-doc fluency under the per-language model: (doc_id, lang,
    * n_bigrams, mean_inv_micro). Fit corpus == scored corpus, so both
    * joins always hit; left + coalesce keeps [[scoreTail]]'s
    * unseen-bucket contract anyway. */
  private[graft] def scoredPlanLang(grams: DataFrame, counts: DataFrame,
      buckets: Int): DataFrame = {
    val cc = counts.filter(col("kind") === 0)
      .select(col("lang"), col("bucket").as("ctx_b"), col("n").as("cc"))
    val cb = counts.filter(col("kind") === 1)
      .select(col("lang"), col("bucket").as("big_b"), col("n").as("cb"))
    grams
      .join(broadcast(cc), Seq("lang", "ctx_b"), "left")
      .join(broadcast(cb), Seq("lang", "big_b"), "left")
      .selectExpr("doc_id", "lang",
        s"cast(round(cast(coalesce(cc, cast(0 as bigint)) + $buckets as double) " +
          "/ cast(coalesce(cb, cast(0 as bigint)) + 1 as double) " +
          "* 1000000) as bigint) AS inv_micro")
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("inv_micro")).as("s"))
      .selectExpr("doc_id", "lang", "n_bigrams",
        "s div n_bigrams AS mean_inv_micro")
  }

  /** tertile cuts + value-based assignment over an (ideally cached)
    * per-doc score frame; see [[ccnetBuckets]] for semantics. */
  private[graft] def assignPlanLang(corpus: DataFrame, langCol: String,
      scored: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // type-1 tertile cuts per language via the grouped value-range
    // bucketed rank lookup (the Pipeline81.groupedMedianFromCounts
    // machinery with TWO target ranks)
    val gcnt = scored.groupBy(col("lang"), col("mean_inv_micro").as("c"))
      .agg(count(lit(1)).as("cnt"))
    val mx = gcnt.groupBy(col("lang"))
      .agg(max(col("c")).as("mx"), sum(col("cnt")).as("n"))
    val gb = gcnt.join(broadcast(mx.select(col("lang"), col("mx"))), Seq("lang"))
      .withColumn("rb", expr("c div greatest(1L, (mx div 64) + 1L)"))
    val offs = gb.groupBy(col("lang"), col("rb")).agg(sum(col("cnt")).as("bcnt"))
      .withColumn("off", coalesce(sum(col("bcnt")).over(
        Window.partitionBy(col("lang")).orderBy(col("rb"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val win = Window.partitionBy(col("lang"), col("rb")).orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = gb
      .join(broadcast(offs.select(col("lang"), col("rb"), col("off"))),
        Seq("lang", "rb"))
      .withColumn("before", col("off") + coalesce(sum(col("cnt")).over(win), lit(0L)))
    val rks = mx.selectExpr("lang",
      "stack(2, 1, (n + 2) div 3, 2, (2 * n + 2) div 3) AS (which, rk)")
    val cuts = ranked.join(broadcast(rks), Seq("lang"))
      .filter(col("before") < col("rk") && col("before") + col("cnt") >= col("rk"))
      .groupBy(col("lang"))
      .agg(max(when(col("which") === 1, col("c"))).as("cut1_micro"),
        max(when(col("which") === 2, col("c"))).as("cut2_micro"))
    corpus.selectExpr("doc_id", s"$langCol AS lang")
      .join(scored.select("doc_id", "n_bigrams", "mean_inv_micro"), Seq("doc_id"), "left")
      .join(broadcast(cuts), Seq("lang"), "left")
      .selectExpr("doc_id", "lang",
        "coalesce(n_bigrams, cast(0 as bigint)) AS n_bigrams",
        "coalesce(mean_inv_micro, cast(0 as bigint)) AS mean_inv_micro",
        "if(n_bigrams is null, cast(null as bigint), cut1_micro) AS cut1_micro",
        "if(n_bigrams is null, cast(null as bigint), cut2_micro) AS cut2_micro",
        """case when n_bigrams is null then 'unscored'
              when mean_inv_micro <= cut1_micro then 'head'
              when mean_inv_micro <= cut2_micro then 'middle'
              else 'tail' end AS bucket""")
  }

  private def gramsPlan(corpus: DataFrame, textCol: String, buckets: Int): DataFrame =
    Storage.parallelFloor(corpus)
      .selectExpr("doc_id", s"${TextOps.tokens(textCol)} AS t")
      .selectExpr("doc_id",
        s"explode_outer(${TextOps.shingles("t", 2)}) AS s")
      .filter(col("s").isNotNull)
      .selectExpr("doc_id",
        s"${TextOps.strHash("substring_index(s, ' ', 1)")} % $buckets AS ctx_b",
        s"${TextOps.strHash("s")} % $buckets AS big_b")

  /** the shared scoring tail: broadcast count joins (LEFT — unseen
    * buckets count 0), IEEE-exact inverse-probability division,
    * micro-quantize, doc-keyed exact sums, 0-fill for bigram-less
    * docs. */
  private def scoreTail(corpus: DataFrame, grams: DataFrame,
      cc: DataFrame, cb: DataFrame, buckets: Int): DataFrame = {
    val perDoc = grams
      .join(broadcast(cc), Seq("ctx_b"), "left")
      .join(broadcast(cb), Seq("big_b"), "left")
      .selectExpr("doc_id",
        s"cast(round(cast(coalesce(cc, cast(0 as bigint)) + $buckets as double) " +
          "/ cast(coalesce(cb, cast(0 as bigint)) + 1 as double) " +
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
