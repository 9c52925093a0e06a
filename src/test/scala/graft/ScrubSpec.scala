package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** Exact repeated-passage removal: first-occurrence retention,
  * overlapping-window coverage union, within-doc repeats, short-doc
  * passthrough, and a differential fuzz against an in-memory
  * reference implementation. */
class ScrubSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.functions.CassFunctions.registerAll(s)
    s
  }

  private val N = 3 // small window so fixtures stay readable

  private def scrub(docs: Seq[(Long, String)]): Map[Long, (Long, Long, String)] = {
    import spark.implicits._
    Dedup.scrubRepeatedPassages(docs.toDF("doc_id", "text"), "text", N)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
  }

  /** In-memory reference: rank every n-gram occurrence by (doc, pos),
    * remove token spans of every occurrence ranked >= 2. */
  private def reference(docs: Seq[(Long, String)]): Map[Long, (Long, Long, String)] = {
    val toks = docs.map { case (id, t) =>
      id -> t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    }
    val occ = for {
      (id, t) <- toks
      i <- 0 to t.length - N
    } yield (t.slice(i, i + N).mkString(" "), id, i)
    val removed = occ.groupBy(_._1).values.flatMap { os =>
      os.sortBy(o => (o._2, o._3)).drop(1)
    }.toSeq
    val covByDoc = removed.groupBy(_._2).view
      .mapValues(_.flatMap(o => o._3 until o._3 + N).toSet).toMap
    toks.map { case (id, t) =>
      val cov = covByDoc.getOrElse(id, Set.empty)
      val kept = t.indices.filterNot(cov).map(t)
      id -> ((t.length.toLong, kept.length.toLong, kept.mkString(" ")))
    }.toMap
  }

  test("first occurrence is kept, later copies scrubbed") {
    val docs = Seq(
      0L -> "alpha beta gamma delta",
      1L -> "zzz alpha beta gamma yyy")
    val out = scrub(docs)
    assert(out(0L) == ((4L, 4L, "alpha beta gamma delta")))
    assert(out(1L) == ((5L, 2L, "zzz yyy")))
  }

  test("within-doc repeat scrubs the second copy only") {
    val out = scrub(Seq(0L -> "a b c x y a b c"))
    assert(out(0L) == ((8L, 5L, "a b c x y")))
  }

  test("overlapping repeated windows union their covered spans") {
    // "a b c d" repeated: windows (a b c) and (b c d) both rank 2 in
    // doc 1 — the union covers all four tokens exactly once
    val out = scrub(Seq(0L -> "a b c d", 1L -> "q a b c d r"))
    assert(out(1L) == ((6L, 2L, "q r")))
  }

  test("docs shorter than the window pass through untouched") {
    val out = scrub(Seq(0L -> "one two", 1L -> "one two"))
    assert(out(0L) == ((2L, 2L, "one two")))
    assert(out(1L) == ((2L, 2L, "one two")))
  }

  test("differential fuzz vs the in-memory reference") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "d", "e")
    val docs = (0L until 40L).map { id =>
      id -> Seq.fill(2 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    assert(scrub(docs) == reference(docs))
  }

  test("scrub result is partition-count independent") {
    import spark.implicits._
    val docs = Seq(0L -> "a b c d e", 1L -> "x a b c y", 2L -> "z b c d w")
    val one = Dedup.scrubRepeatedPassages(
      docs.toDF("doc_id", "text").repartition(1), "text", N).collect().toSet
    val many = Dedup.scrubRepeatedPassages(
      docs.toDF("doc_id", "text").repartition(7), "text", N).collect().toSet
    assert(one == many)
  }
}
