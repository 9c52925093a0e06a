package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dialogue-aware (multi-turn) curation — dedup and decontamination
  * over ROLE-TAGGED conversation data, where only ASSISTANT-authored
  * text participates in the hashing and user turns are preserved
  * verbatim. This is the shape conversation-data curation actually
  * needs: two SFT conversations whose assistant responses are
  * identical are duplicates even when every user prompt differs
  * (prompts are paraphrased, templated, or user-specific), and a
  * decontamination scrub must never rewrite what a USER said — only
  * what the model would be trained to SAY.
  *
  * Input contract (both operators): a TURNS frame with one row per
  * turn — `conv_id` (BIGINT conversation key), `turn_idx` (BIGINT
  * position within the conversation, unique per conv), `role`
  * (STRING), `text` (STRING). Rows whose role is not `assistantRole`
  * (user turns, system prompts, tool results) are protected: they
  * never contribute hashes and are never rewritten.
  *
  * 100 TB shape: both operators are the turn-keyed instances of the
  * audited corpus plans ([[Dedup.decontaminationScrub]]'s broadcast
  * eval set + per-key bounded collect; d01's fingerprint groupBy) —
  * one map-only hash pass, one (conv or (conv, turn))-keyed exchange,
  * no pair join, no collect.
  */
object Dialogue {

  /** One shared rule for the whole family: `assistantRole` is
    * interpolated into SQL fragments by two of the four operators,
    * so a role containing a quote would break (or alter) the
    * predicate. All four operators enforce the same guard so the
    * family has one contract, not two. */
  private def requireSafeRole(assistantRole: String): Unit =
    require(!assistantRole.contains("'"),
      s"assistantRole must not contain quotes, got '$assistantRole'")

  /** Second-track fold constants for the 60-bit conversation
    * fingerprint: an independent multiplier/seed pair (999983 prime
    * < P, seed 13) over 131-mult token hashes, so the two ~2^30
    * tracks combine into a genuinely ~2^60 key the strHash60 way. */
  private val MultB = 999983L
  private val SeedB = 13L

  /** The empty-assistant fingerprint: both tracks' bare seeds packed
    * (7 * 2^30 + 13). */
  val EmptyAssistantFp: Long = 7L * 1073741824L + SeedB

  /** Exact dialogue dedup: per conversation, an ORDER-SENSITIVE
    * 60-bit fingerprint of the assistant turns only — per-turn token
    * hashes folded within the turn, per-turn folds folded again in
    * `turn_idx` order — then fingerprint groups resolved keep-first.
    * The fingerprint is TWO independent mod-P fold tracks (token
    * hashes mult 31 folded with 1000003/seed 7; token hashes mult
    * 131 folded with 999983/seed 13) packed as
    * `fa * 2^30 + fb % 2^30` — a single mod-P fold carries only
    * ~2^30 states, so birthday collisions start near ~50k
    * conversations; the packed pair pushes that to ~2^30
    * conversations (the strHash60 rule at conversation grain).
    * Two conversations collide iff their assistant text (token
    * stream AND turn segmentation) is identical; user/system/tool
    * turns are invisible to the fingerprint, so a templated prompt
    * rewrite cannot hide a duplicated response set. A conversation
    * with NO assistant turns fingerprints as the empty fold (seed 7)
    * — all such conversations group together, which is the honest
    * answer (there is nothing trainable to distinguish them).
    *
    * Returns one row per conversation: `conv_id, asst_fp, group_size,
    * canonical_conv` (lowest conv_id in the group), `is_canonical`.
    *
    * 100 TB shape: one map-only tokenize+hash, one conv-keyed
    * partial-aggregable fold (per-turn 8-byte longs into the
    * shuffle, collect bounded by turns-per-conversation), one
    * fingerprint-keyed window over fine-grained 60-bit keys — d01's
    * exact plan at conversation granularity. */
  def dialogueExactDedup(turns: DataFrame,
      assistantRole: String = "assistant"): DataFrame = {
    requireSafeRole(assistantRole)
    val perTurn = turns
      .filter(col("role") === lit(assistantRole))
      .selectExpr("conv_id", "turn_idx",
        s"${TextOps.foldHash(TextOps.hashAll(TextOps.tokens("text"), 31))} AS tha",
        s"${TextOps.foldHashWith(TextOps.hashAll(TextOps.tokens("text"), 131), MultB, SeedB)} AS thb")
    val perConv = perTurn.groupBy(col("conv_id"))
      .agg(sort_array(collect_list(
        struct(col("turn_idx"), col("tha"), col("thb")))).as("fs"))
      .selectExpr("conv_id",
        s"${TextOps.foldHash("transform(fs, f -> f.tha)")} AS fa",
        s"${TextOps.foldHashWith("transform(fs, f -> f.thb)", MultB, SeedB)} AS fb")
    val fp = turns.select(col("conv_id")).distinct()
      .join(perConv, Seq("conv_id"), "left")
      // a conversation with NO assistant turns packs the two bare
      // seeds (7, 13); one with only zero-token assistant turns
      // folds the per-turn seeds in — the two stay distinguishable
      .selectExpr("conv_id",
        s"coalesce(fa * 1073741824 + fb % 1073741824," +
          s" ${EmptyAssistantFp}L) AS asst_fp")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("asst_fp"))
    fp.withColumn("group_size", count(lit(1)).over(w))
      .withColumn("canonical_conv", min(col("conv_id")).over(w))
      .selectExpr("conv_id", "asst_fp", "group_size", "canonical_conv",
        "conv_id = canonical_conv AS is_canonical")
  }

  /** Dialogue contamination AUDIT — [[Dedup.spanContamination]] at
    * TURN granularity with role awareness: the read-only half of
    * [[dialogueScrub]] (audit first, scrub when the number is
    * nonzero — the p46/p52 pairing at conversation grain). For each
    * EVAL conversation, the maximal spans (gap-≤k island merge,
    * per-turn — windows and spans never cross turn boundaries) of
    * its ASSISTANT-turn windows that also occur in any TRAIN
    * conversation's assistant turn. User/system/tool text
    * contributes nothing on either side: a user prompt quoting a
    * benchmark question is not trainable leakage — only what the
    * model would learn to SAY is. Every eval conversation emits a
    * row (zero-filled when clean); `contamination_micro` is over the
    * conversation's assistant-token mass. A conversation whose
    * `evalPred` is NULL counts as TRAIN (the conservative audit
    * side: its windows count as train presence).
    *
    * Returns one row per EVAL conversation: `conv_id, asst_tokens,
    * n_spans, contaminated_tokens, contamination_micro`.
    *
    * 100 TB shape: [[Dedup.spanContamination]]'s — one map-only
    * window-hash pass, a map-side-combinable train-hash agg, ONE
    * hash-keyed equi-join, per-(conv, turn) island merge on one
    * window shuffle, one zero-fill left join. No pair join. */
  def dialogueContamination(turns: DataFrame, k: Int, evalPred: String,
      assistantRole: String = "assistant"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 2, s"span seed width must be >= 2 tokens, got $k")
    requireSafeRole(assistantRole)
    val base = turns.selectExpr("conv_id", "turn_idx",
      s"coalesce(($evalPred), false) AS is_eval",
      s"(role = '$assistantRole') AS is_asst",
      s"graft_shingle_hashes_all(text, $k) AS hs",
      s"cast(size(${TextOps.tokens("text")}) as bigint) AS n_tokens")
    val occ = base.filter(col("is_asst"))
      .selectExpr("conv_id", "turn_idx", "is_eval",
        "posexplode(hs) AS (pos0, h)")
      .selectExpr("conv_id", "turn_idx", "is_eval",
        "cast(pos0 + 1 as bigint) AS pos", "h")
    val trainH = occ.filter(!col("is_eval"))
      .groupBy(col("h")).agg(count(lit(1)).as("__n")).select(col("h"))
    val w = Window.partitionBy(col("conv_id"), col("turn_idx"))
      .orderBy(col("pos"))
    val spans = occ.filter(col("is_eval"))
      .join(trainH, Seq("h"))
      .select(col("conv_id"), col("turn_idx"), col("pos"))
      .withColumn("brk",
        when(col("pos") - lag(col("pos"), 1).over(w) <= k, 0L).otherwise(1L))
      .withColumn("grp", sum(col("brk")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("conv_id"), col("turn_idx"), col("grp"))
      .agg((max(col("pos")) - min(col("pos")) + lit(k).cast("long")).as("span"))
      .groupBy(col("conv_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("span")).as("contaminated_tokens"))
    base.filter(col("is_eval")).groupBy(col("conv_id"))
      .agg(sum(expr("if(is_asst, n_tokens, 0L)")).as("asst_tokens"))
      .join(spans, Seq("conv_id"), "left")
      .na.fill(0L, Seq("n_spans", "contaminated_tokens"))
      .selectExpr("conv_id", "asst_tokens", "n_spans", "contaminated_tokens",
        "cast(if(asst_tokens = 0, 0, (cast(contaminated_tokens as" +
          " decimal(38,0)) * 1000000) div asst_tokens) as bigint)" +
          " AS contamination_micro")
  }

  /** Dialogue decontamination scrub — [[Dedup.decontaminationScrub]]
    * at TURN granularity with role awareness: every ≥k-token window
    * of a train conversation's ASSISTANT turn whose hash occurs in
    * any eval conversation's ASSISTANT turn is scrubbed (windows
    * never cross turn boundaries — a span interrupted by a user turn
    * is not a contiguous training span); user/system/tool turns pass
    * through VERBATIM (original casing, punctuation, whitespace),
    * and eval conversations do not appear in the output. A
    * conversation whose `evalPred` evaluates to NULL counts as TRAIN
    * (coalesced to false — scrubbed and kept, never silently
    * dropped; the [[Dedup.decontaminationScrub]] rule).
    *
    * Returns one row per TRAIN turn: `conv_id, turn_idx, role,
    * n_before, n_after, text_out` — for protected roles
    * `n_after = n_before` and `text_out` is the raw input text; for
    * assistant turns `text_out` is rebuilt from surviving tokens.
    *
    * 100 TB shape: identical to [[Dedup.decontaminationScrub]] with
    * (conv_id, turn_idx) as the document key — map-only window
    * hashing, one small eval distinct BROADCAST, one turn-keyed
    * bounded coverage collect, one turn-keyed rebuild join with the
    * shared O(len + |cov|) `graft_scrub_keep` two-pointer. */
  def dialogueScrub(turns: DataFrame, k: Int, evalPred: String,
      assistantRole: String = "assistant"): DataFrame = {
    require(k >= 2, s"span seed width must be >= 2 tokens, got $k")
    requireSafeRole(assistantRole)
    val base = turns.selectExpr("conv_id", "turn_idx", "role", "text",
      s"coalesce(($evalPred), false) AS is_eval",
      s"(role = '$assistantRole') AS is_asst",
      s"${TextOps.tokens("text")} AS t",
      s"graft_shingle_hashes_all(text, $k) AS hs")
    val evalH = base.filter(col("is_eval") && col("is_asst"))
      .selectExpr("explode(hs) AS h").distinct()
    val cov = base.filter(!col("is_eval") && col("is_asst"))
      .selectExpr("conv_id", "turn_idx", "posexplode(hs) AS (pos0, h)")
      .selectExpr("conv_id", "turn_idx",
        "cast(pos0 + 1 as bigint) AS pos", "h")
      .join(broadcast(evalH), Seq("h"))
      .groupBy(col("conv_id"), col("turn_idx"))
      .agg(sort_array(collect_list(col("pos"))).as("cov"))
    base.filter(!col("is_eval"))
      .select(col("conv_id"), col("turn_idx"), col("role"), col("text"),
        col("t"), col("is_asst"))
      .join(cov, Seq("conv_id", "turn_idx"), "left")
      .selectExpr("conv_id", "turn_idx", "role", "text", "t", "is_asst",
        "coalesce(cov, cast(array() as array<bigint>)) AS cov")
      .selectExpr("conv_id", "turn_idx", "role", "text", "t", "is_asst",
        s"graft_scrub_keep(cov, $k, size(t)) AS kept")
      .selectExpr("conv_id", "turn_idx", "role",
        "cast(size(t) as bigint) AS n_before",
        "if(is_asst, cast(size(kept) as bigint)," +
          " cast(size(t) as bigint)) AS n_after",
        "if(is_asst, concat_ws(' ', transform(kept," +
          " j -> element_at(t, j))), text) AS text_out")
  }

  /** NEAR-dup dialogue pairs — [[dialogueExactDedup]]'s MinHash-LSH
    * sibling: conversations whose ASSISTANT token streams are nearly
    * (not exactly) identical, with user/system/tool turns invisible
    * on both sides. The assistant turns are concatenated in
    * `turn_idx` order into one stream and shingled ACROSS turn
    * boundaries — deliberately the opposite segmentation stance from
    * the exact fingerprint: a near-dup detector must be robust to
    * re-segmentation (the same response split into two turns, or a
    * sentence moved across a turn break), which is exactly what
    * defeats d35's order-and-segmentation-sensitive fold. Two
    * conversations pair iff their assistant streams' estimated
    * n-gram Jaccard clears `threshold` under the audited
    * [[Dedup.minhashLshPairs]] machinery (signature banding, never
    * an all-pairs join).
    *
    * Returns [[Dedup.minhashLshPairs]]'s frame at conversation
    * grain: `d1, d2, matches, est_jaccard` (d1 < d2 conv ids).
    * Conversations with no assistant turns have no signature mass
    * (empty shingle set → sentinel signature) and group only with
    * each other — same honest answer as the exact fingerprint.
    *
    * 100 TB shape: one conv-keyed sort-collect (bounded by
    * turns-per-conversation) to build the stream, then the audited
    * banded-LSH plan — band-bucket equi-joins over 8-byte keys,
    * fan-out bounded by bucket sizes (gate with
    * [[Dedup.minhashBandSkewAudit]] as d36 does). */
  def dialogueMinhashPairs(turns: DataFrame, n: Int, k: Int, bands: Int,
      threshold: Double, assistantRole: String = "assistant"): DataFrame = {
    requireSafeRole(assistantRole)
    val convDocs = turns.filter(col("role") === lit(assistantRole))
      .groupBy(col("conv_id"))
      .agg(sort_array(collect_list(struct(col("turn_idx"), col("text"))))
        .as("ts"))
      .selectExpr("conv_id AS doc_id",
        "concat_ws(' ', transform(ts, x -> x.text)) AS text")
    Dedup.minhashLshPairs(convDocs, "text", n, k, bands, threshold)
  }

  /** SFT loss-mask token accounting: per conversation, total tokens,
    * TRAINABLE tokens (assistant turns — the only ones that take loss
    * under the standard SFT mask), masked tokens (everything else:
    * user/system/tool turns, present in the context window but
    * loss-free), and the trainable share. This is the number an SFT
    * packing or budget pass actually optimizes for — two
    * conversations of equal length can differ 10x in gradient signal,
    * and a packer that bins on raw length systematically under-fills
    * assistant-heavy bins' loss mass.
    *
    * A conversation with zero tokens reports share 0 (nothing
    * trainable, nothing to divide by).
    *
    * 100 TB shape: one map-only tokenize + ONE conv-keyed map-side-
    * combinable aggregation — nothing else. */
  def sftTokenAccounting(turns: DataFrame,
      assistantRole: String = "assistant"): DataFrame = {
    requireSafeRole(assistantRole)
    turns.selectExpr("conv_id",
        s"cast(size(${TextOps.tokens("text")}) as bigint) AS nt",
        s"(role = '$assistantRole') AS tr")
      .groupBy(col("conv_id"))
      .agg(sum(col("nt")).as("n_tokens"),
        sum(expr("if(tr, nt, 0L)")).as("n_trainable"))
      .selectExpr("conv_id", "n_tokens", "n_trainable",
        "n_tokens - n_trainable AS n_masked",
        "if(n_tokens = 0, 0L, (n_trainable * 1000000) div n_tokens)" +
          " AS trainable_share_micro")
  }
}
