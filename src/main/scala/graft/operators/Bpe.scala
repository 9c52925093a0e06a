package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterated byte-pair-encoding vocabulary training — the tokenizer-
  * training loop t12's single pair-count step feeds (Sennrich et al.,
  * "Neural Machine Translation of Rare Words with Subword Units",
  * ACL 2016: repeatedly merge the most frequent adjacent symbol
  * pair).
  *
  * 100 TB shape: the corpus is touched ONCE — a single aggregation to
  * the distinct-token FREQUENCY table (the classic BPE word-count
  * preprocessing) — and every training round then runs over that
  * vocabulary-bounded table: one weighted adjacent-pair aggregation
  * (map-side combined over the bounded live-pair key space) + one
  * driver-side top-1 + one pure-projection merge apply (a greedy
  * left-to-right fold per distinct token). Pair counts weighted by
  * token frequency equal the per-instance counts exactly, because
  * merges depend only on the symbols, never on which document they
  * came from. The driver holds ONLY the O(steps) merge table — the
  * c01 loop discipline: per-round `localCheckpoint` truncates lineage
  * so round k costs one apply, not k, and the previous round's blocks
  * are released as soon as the new round is materialized.
  *
  * Determinism: ties rank (count DESC, left ASC, right ASC); the
  * greedy fold is the canonical BPE apply (merged symbols never
  * re-match inside the same pass), so a DuckDB oracle replays the
  * whole loop exactly.
  */
object Bpe {

  /** escape a corpus-derived symbol for splicing into a SQL string
    * literal (tokens are lowercase alnum today; stay safe anyway). */
  private def strLit(s: String): String = "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

  /** adjacent symbol pairs of a `syms` array column — empty for
    * single-symbol tokens (a raw `sequence(1, size-1)` would run
    * DESCENDING when size = 1 and fabricate pairs). */
  private val pairsExpr: String =
    "if(size(syms) < 2, cast(array() as array<struct<l:string,r:string>>), " +
      "transform(sequence(1, size(syms) - 1), " +
      "i -> struct(element_at(syms, i) AS l, element_at(syms, i + 1) AS r)))"

  /** greedy left-to-right merge of the (l, r) pair in a `syms` array:
    * fold each symbol onto the accumulator, collapsing when the
    * accumulator's tail is `l` and the incoming symbol is `r`. The
    * freshly merged `lr` symbol differs from `l` as a string, so it
    * never chains into an overlapping second merge — canonical BPE
    * apply semantics. */
  private def mergeExpr(l: String, r: String): String = {
    val (ll, rl) = (strLit(l), strLit(r))
    val merged = strLit(l + r)
    s"aggregate(syms, cast(array() as array<string>), (acc, x) -> " +
      s"if(size(acc) > 0 AND element_at(acc, -1) = $ll AND x = $rl, " +
      s"concat(slice(acc, 1, size(acc) - 1), array($merged)), " +
      s"concat(acc, array(x))))"
  }

  /** the distinct-token frequency table (syms: one single-char symbol
    * per character, freq: instance count) — the ONE corpus-wide pass
    * everything else trains/encodes against. Tokens shorter than
    * 2 chars carry no pairs and are excluded up front, matching
    * t12. */
  private def freqTable(docs: DataFrame, textCol: String): DataFrame =
    Storage.parallelFloor(docs)
      .selectExpr(s"explode(${TextOps.tokens(textCol)}) AS t")
      .filter(length(col("t")) >= 2)
      .groupBy(col("t")).agg(count(lit(1)).as("freq"))
      .selectExpr(
        "transform(sequence(1, length(t)), i -> substring(t, i, 1)) AS syms", "freq")

  /** The training loop. Returns the merge list and the UNMERGED
    * frequency-table checkpoint it trained from — still live, so a
    * caller that re-consumes the table (the encode path) does not pay
    * a second corpus-wide aggregation; the caller owns its release.
    * Intermediate (per-round) checkpoints are released as each round
    * materializes, and EVERYTHING — base included — is released if
    * the loop dies mid-training (the round-7 leak contract). */
  /** lazy-checkpoint-then-force with failure-path block release —
    * the shared [[Storage.checkpointed]] lifecycle. */
  private def checkpointed(df: DataFrame): DataFrame = Storage.checkpointed(df)

  /** The training loop. `onRound` fires before each round's pair
    * aggregation (round index 1-based) — a production no-op that the
    * chaos spec uses to kill the loop mid-training and assert the
    * failure-release contract below actually releases every block. */
  private[graft] def trainLoop(docs: DataFrame, textCol: String,
      steps: Int, onRound: Int => Unit = _ => ())
      : (Seq[(Long, String, String, Long)], DataFrame) = {
    require(steps >= 1, s"BPE training needs steps >= 1, got $steps")
    val base = checkpointed(freqTable(docs, textCol))
    var cur = base
    var stale: Seq[RDD[_]] = Nil // merged-round checkpoints only, never base's
    val merges = ArrayBuffer.empty[(Long, String, String, Long)]
    try {
      var step = 1
      var exhausted = false
      while (step <= steps && !exhausted) {
        onRound(step)
        val top = cur.selectExpr(s"explode($pairsExpr) AS pr", "freq")
          .select(col("pr.l").as("l"), col("pr.r").as("r"), col("freq"))
          .groupBy(col("l"), col("r")).agg(sum(col("freq")).as("n"))
          .orderBy(col("n").desc, col("l"), col("r"))
          .limit(1)
          .collect()
        if (top.isEmpty) exhausted = true
        else {
          val (l, r, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
          merges += ((step.toLong, l, r, n))
          if (step < steps) {
            cur = checkpointed(cur.selectExpr(s"${mergeExpr(l, r)} AS syms", "freq"))
            stale.foreach(_.unpersist(blocking = false))
            stale = Storage.checkpointRdds(cur)
          }
          step += 1
        }
      }
    } catch {
      case t: Throwable => Storage.release(base); throw t
    } finally stale.foreach(_.unpersist(blocking = false))
    (merges.toSeq, base)
  }

  /** A trained tokenizer ARTIFACT — "fit once, transform many": the
    * merge table (the tokenizer itself, O(steps) driver state) plus
    * the live frequency-table checkpoint it trained from, so apply-
    * side consumers ([[vocabOf]] over the vocabulary, [[encodeWith]]
    * over any corpus) never re-pay training or the corpus-wide
    * frequency aggregation. The CALLER owns [[release]]: call it
    * once every consumer's result is materialized (results that must
    * outlive the artifact go through [[Storage.checkpointed]]
    * first). */
  final case class BpeTokenizer(
      merges: Seq[(Long, String, String, Long)],
      private[graft] val freq: DataFrame) {
    /** free the frequency-table checkpoint blocks; the merge table
      * (plain driver data) stays usable forever. */
    def release(): Unit = Storage.release(freq)
  }

  /** Fit ONCE: train `steps` merges and hand back the reusable
    * [[BpeTokenizer]] artifact. One corpus pass total, regardless of
    * how many consumers apply the tokenizer afterwards. */
  def fit(docs: DataFrame, textCol: String, steps: Int): BpeTokenizer = {
    val (merges, base) = trainLoop(docs, textCol, steps)
    BpeTokenizer(merges, base)
  }

  /** Train `steps` BPE merges over the corpus' token instances.
    * Returns the merge table (step, l, r, n) — merge `step` fused
    * symbols `l`+`r`, which occurred adjacently `n` times at that
    * point of training. Stops early if the corpus runs out of
    * pairs. */
  def trainMerges(docs: DataFrame, textCol: String, steps: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val tok = fit(docs, textCol, steps)
    tok.release()
    tok.merges.toDF("step", "l", "r", "n")
  }

  /** The tokenizer-APPLY step: encode the corpus under the merge
    * table [[trainMerges]] produces and return the top-`topK`
    * vocabulary occupancy — (sym, n) where `n` counts the symbol's
    * occurrences across every encoded token instance. This is the
    * table a tokenizer-training pipeline actually ships next to the
    * merge list: which learned units carry the token mass.
    *
    * 100 TB shape: training reads the corpus once (inside
    * [[trainLoop]]) and the encode is ONE `graft_bpe_apply`
    * projection over the SAME frequency-table checkpoint the training
    * started from (no second corpus pass) — the native expression
    * runs every merge pass as a single O(steps · len) JVM loop per
    * token, so there is no chained plan to analyze (Catalyst's
    * planning of 8 chained lambda folds measured ~9 s on a 30-row
    * table). The returned frame reads the O(vocabulary) checkpoint
    * blocks it rides on — freed via [[Storage.release]] after the
    * terminal action, per the [[Storage]] contract. */
  def vocabAfterTraining(docs: DataFrame, textCol: String, steps: Int,
      topK: Int): DataFrame =
    vocabOf(fit(docs, textCol, steps), topK)

  /** Vocabulary-occupancy consumer over a fitted [[BpeTokenizer]]:
    * applies the merge table to the artifact's frequency-table
    * checkpoint — NO training, NO corpus pass. The returned frame
    * rides the artifact's checkpoint blocks: materialize (or
    * [[Storage.checkpointed]]) before [[BpeTokenizer.release]]. */
  def vocabOf(tok: BpeTokenizer, topK: Int): DataFrame =
    tok.freq
      .select(call_function("graft_bpe_apply", col("syms"), mergesLit(tok.merges)).as("syms"),
        col("freq"))
      .selectExpr("explode(syms) AS sym", "freq")
      .groupBy(col("sym")).agg(sum(col("freq")).as("n"))
      .orderBy(col("n").desc, col("sym"))
      .limit(topK)

  /** Encode every document under the trained merge table: `outCol`
    * is the document's subword sequence — its tokens in order, each
    * token split to characters and run through every merge (1-char
    * tokens pass through unchanged; training never saw them, no merge
    * matches them). This is the corpus-scale tokenizer-apply a
    * packing/token-budget stage consumes downstream.
    *
    * 100 TB shape: pure map — one projection, zero shuffles; the
    * merge table rides the plan as an O(steps) literal. */
  def encodeDocs(docs: DataFrame, textCol: String, steps: Int,
      outCol: String = "subwords"): DataFrame = {
    val tok = fit(docs, textCol, steps)
    tok.release() // the encode reads docs, not the freq table
    encodeWith(tok, docs, textCol, outCol)
  }

  /** Corpus-encode consumer over a fitted [[BpeTokenizer]]: pure map
    * — one projection, zero shuffles, the merge table riding the
    * plan as an O(steps) literal. Does NOT touch the artifact's
    * frequency checkpoint (any corpus, released artifacts included,
    * encodes fine — the merge table is plain driver data). */
  def encodeWith(tok: BpeTokenizer, docs: DataFrame, textCol: String,
      outCol: String = "subwords"): DataFrame =
    docs.withColumn(outCol,
      flatten(transform(
        expr(TextOps.tokens(textCol)),
        t => call_function("graft_bpe_apply",
          transform(sequence(lit(1), length(t)), i => t.substr(i, lit(1))),
          mergesLit(tok.merges)))))

  /** the trained merge table as the ARRAY<ARRAY<STRING>> plan literal
    * `graft_bpe_apply` consumes (training order). */
  private def mergesLit(merges: Seq[(Long, String, String, Long)]): Column =
    typedlit(merges.sortBy(_._1).map { case (_, l, r, _) => Seq(l, r) })
}
