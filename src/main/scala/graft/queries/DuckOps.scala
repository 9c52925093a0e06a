package graft.queries

import graft.operators.TextOps

/** DuckDB-SQL twins of [[graft.operators.TextOps]] fragments. Each
  * builder produces the same exact-integer result as its Spark twin:
  * DuckDB's `list_reduce` has no initial accumulator (it folds from
  * the first element), which matches a 0-seeded polynomial fold; for
  * non-zero seeds the seed is prepended via `list_concat`.
  */
object DuckOps {
  val P: Long = TextOps.P

  def tokens(col: String): String =
    s"list_filter(regexp_split_to_array(lower($col), '[^a-z0-9]+'), x -> x <> '')"

  def shingles(t: String, n: Int): String = {
    val concat = (0 until n).map(j => s"$t[i + $j]").mkString(" || ' ' || ")
    s"CASE WHEN len($t) < $n THEN $t[1:0] " +
      s"ELSE list_transform(range(1, len($t) - ${n - 2}), i -> $concat) END"
  }

  def strHash(e: String, mult: Int = 31): String =
    s"list_reduce(list_concat([0::BIGINT], list_transform(range(1, length($e) + 1), " +
      s"j -> ord(substr($e, j, 1))::BIGINT)), (a, b) -> (a * $mult + b) % $P)"

  def strHash60(e: String): String =
    s"(${strHash(e, 31)} * 1073741824 + ${strHash(e, 131)} % 1073741824)"

  def hashAll(arr: String, mult: Int = 31): String =
    s"list_transform($arr, s -> ${strHash("s", mult)})"

  def mhA(i: String): String = s"((($i + 1) * 1103515245 + 12345) % $P)"
  def mhB(i: String): String = s"((($i + 1) * 69069 + 7) % $P)"

  def minhashSig(hs: String, k: Int): String =
    s"list_transform(range(0, $k), i -> " +
      s"CASE WHEN len($hs) = 0 THEN $P " +
      s"ELSE list_min(list_transform($hs, h -> (${mhA("i")} * (h % $P) + ${mhB("i")}) % $P)) END)"

  def simhash60(hs: String): String =
    s"list_reduce(list_concat([0::BIGINT], list_transform(range(0, 60), b -> " +
      s"CASE WHEN list_sum(list_transform($hs, h -> " +
      s"CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END)) > 0 " +
      s"THEN (1::BIGINT << b) ELSE 0::BIGINT END)), (a, x) -> a + x)"

  def foldHash(arr: String): String = foldHashWith(arr, 1000003L, 7L)

  def foldHashWith(arr: String, mult: Long, seed: Long): String =
    s"list_reduce(list_concat([$seed::BIGINT], $arr), (acc, x) -> (acc * $mult + x) % $P)"

  def arrayLit(xs: Seq[String]): String = xs.mkString("['", "', '", "']")

  def stopHits(toks: String, stop: Seq[String]): String =
    s"len(list_filter($toks, t -> list_contains(${arrayLit(stop)}, t)))"

  /** left-fold sum of element-wise products of two DOUBLE lists —
    * same addition order as Spark's aggregate(zip_with(...)). */
  def dot(a: String, b: String): String =
    s"list_reduce(list_concat([0.0::DOUBLE], list_transform(range(1, len($a) + 1), " +
      s"i -> $a[i] * $b[i])), (x, y) -> x + y)"

  def norm2(a: String): String =
    s"list_reduce(list_concat([0.0::DOUBLE], list_transform($a, x -> x * x)), (p, q) -> p + q)"
}
