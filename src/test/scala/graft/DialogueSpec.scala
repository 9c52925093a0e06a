package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dialogue

/** Role-aware multi-turn dedup/scrub: assistant-only fingerprints
  * (user-turn invariance, turn-order sensitivity, empty-assistant
  * seed), verbatim user-turn preservation through the scrub,
  * turn-bounded windows, NULL evalPred handling, and a differential
  * fuzz against an in-memory reference. */
class DialogueSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.functions.CassFunctions.registerAll(s)
    s
  }

  private def turnsDf(rows: Seq[(Long, Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("conv_id", "turn_idx", "role", "text")
  }

  // ------------------------------------------ dialogueExactDedup

  private def dedup(rows: Seq[(Long, Long, String, String)]): Map[Long, (Long, Long, Boolean)] =
    Dialogue.dialogueExactDedup(turnsDf(rows)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap

  test("identical assistant streams group despite entirely different user turns") {
    val rows = Seq(
      (0L, 1L, "user", "how do i sort a list"),
      (0L, 2L, "assistant", "use the built in sorted function"),
      (1L, 1L, "user", "completely different question text here"),
      (1L, 2L, "assistant", "use the built in sorted function"),
      (2L, 1L, "user", "how do i sort a list"),
      (2L, 2L, "assistant", "a totally different answer"))
    val out = dedup(rows)
    assert(out(0L) == ((2L, 0L, true)), s"canonical keeps lowest conv: ${out(0L)}")
    assert(out(1L) == ((2L, 0L, false)), "same assistant text = duplicate")
    assert(out(2L)._1 == 1L, "same USER text alone never groups")
  }

  test("fingerprint is turn-ORDER sensitive and segmentation sensitive") {
    val rows = Seq(
      (0L, 1L, "assistant", "alpha beta"), (0L, 2L, "assistant", "gamma"),
      (1L, 1L, "assistant", "gamma"), (1L, 2L, "assistant", "alpha beta"),
      (2L, 1L, "assistant", "alpha"), (2L, 2L, "assistant", "beta gamma"))
    val out = dedup(rows)
    assert(Set(out(0L)._1, out(1L)._1, out(2L)._1) == Set(1L),
      s"reordered or resegmented assistant turns are NOT duplicates: $out")
  }

  test("conversations with no assistant turns fingerprint together (empty seed)") {
    val rows = Seq(
      (0L, 1L, "user", "hello"),
      (1L, 1L, "user", "entirely different"),
      (2L, 1L, "assistant", "hi"))
    val out = dedup(rows)
    assert(out(0L) == ((2L, 0L, true)) && out(1L) == ((2L, 0L, false)),
      s"no-assistant convs group on the bare seed: $out")
    assert(out(2L)._1 == 1L)
  }

  // ------------------------------------------------ dialogueScrub

  private def scrub(rows: Seq[(Long, Long, String, String)], k: Int,
      pred: String = "conv_id % 2 = 1"): Map[(Long, Long), (String, Long, Long, String)] =
    Dialogue.dialogueScrub(turnsDf(rows), k, pred).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getLong(3), r.getLong(4), r.getString(5))))
      .toMap

  test("eval assistant spans are scrubbed from train assistant turns; user turns verbatim") {
    val rows = Seq(
      (0L, 1L, "user", "Tell me: what is The Answer?!"), // punctuation survives
      (0L, 2L, "assistant", "well alpha beta gamma indeed"),
      (1L, 1L, "user", "irrelevant"),
      (1L, 2L, "assistant", "alpha beta gamma"))          // eval (odd conv)
    val out = scrub(rows, 3)
    assert(!out.contains((1L, 1L)) && !out.contains((1L, 2L)),
      "eval conversations never appear in the output")
    assert(out((0L, 1L)) == (("user", 6L, 6L, "Tell me: what is The Answer?!")),
      s"user turn preserved VERBATIM (case + punctuation): ${out((0L, 1L))}")
    assert(out((0L, 2L)) == (("assistant", 5L, 2L, "well indeed")),
      s"eval span scrubbed from the assistant turn: ${out((0L, 2L))}")
  }

  test("user-turn text never contributes eval hashes") {
    val rows = Seq(
      (0L, 1L, "assistant", "alpha beta gamma"),
      (1L, 1L, "user", "alpha beta gamma")) // eval conv, but USER text
    val out = scrub(rows, 3)
    assert(out((0L, 1L)) == (("assistant", 3L, 3L, "alpha beta gamma")),
      s"eval USER text must not scrub train: ${out((0L, 1L))}")
  }

  test("windows never cross turn boundaries") {
    // eval assistant has "alpha beta gamma"; the train conv holds
    // "alpha beta" | "gamma" split across two turns — no 3-token
    // window exists in either train turn, so nothing is scrubbed
    val rows = Seq(
      (0L, 1L, "assistant", "alpha beta"),
      (0L, 2L, "assistant", "gamma delta epsilon"),
      (1L, 1L, "assistant", "alpha beta gamma"))
    val out = scrub(rows, 3)
    assert(out((0L, 1L))._4 == "alpha beta" &&
      out((0L, 2L))._4 == "gamma delta epsilon",
      s"a span interrupted by a turn boundary is not contiguous: $out")
  }

  test("NULL evalPred counts as train (scrubbed, never dropped)") {
    import spark.implicits._
    val df = Seq(
      (0L, 1L, "assistant", "alpha beta gamma tail", Some(false)),
      (1L, 1L, "assistant", "alpha beta gamma", Some(true)),
      (2L, 1L, "assistant", "pre alpha beta gamma", None))
      .toDF("conv_id", "turn_idx", "role", "text", "flag")
    val out = Dialogue.dialogueScrub(df, 3, "flag").collect()
      .map(r => r.getLong(0) -> ((r.getLong(4), r.getString(5)))).toMap
    assert(out.keySet == Set(0L, 2L), s"NULL-flag conv survives as train: ${out.keySet}")
    assert(out(2L) == ((1L, "pre")), s"NULL-flag conv is scrubbed like train: ${out(2L)}")
  }

  test("differential fuzz vs an in-memory reference") {
    val rnd = new scala.util.Random(0xD1A)
    val vocab = Vector("a", "b", "c", "d", "e")
    val K = 3
    for (trial <- 0 until 5) {
      val rows = for {
        conv <- 0L until 16L
        turn <- 1L to (1 + rnd.nextInt(4)).toLong
      } yield (conv, turn, if (rnd.nextBoolean()) "assistant" else "user",
        Seq.fill(1 + rnd.nextInt(9))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      // reference: eval = odd convs; collect K-gram TEXT of eval
      // assistant turns; scrub train assistant turns, user verbatim
      val toks = rows.map { case (c, t, r, x) =>
        (c, t, r, x, x.split(" ").filter(_.nonEmpty).toSeq)
      }
      def grams(t: Seq[String]) =
        (0 to t.length - K).map(i => t.slice(i, i + K).mkString(" "))
      val evalG = toks.collect {
        case (c, _, "assistant", _, t) if c % 2 == 1 => grams(t)
      }.flatten.toSet
      val expect = toks.collect { case (c, ti, r, x, t) if c % 2 == 0 =>
        if (r != "assistant") (c, ti) -> ((r, t.length.toLong, t.length.toLong, x))
        else {
          val cov = (0 to t.length - K).filter(i => evalG(grams(t)(i)))
            .flatMap(i => i until i + K).toSet
          val kept = t.indices.filterNot(cov).map(t)
          (c, ti) -> ((r, t.length.toLong, kept.length.toLong, kept.mkString(" ")))
        }
      }.toMap
      assert(scrub(rows, K) == expect, s"trial $trial")
    }
  }
}
