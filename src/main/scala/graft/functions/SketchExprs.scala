package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native sketch expressions for the dedup pipeline: tight JVM loops
  * instead of nested interpreted higher-order functions, computing the
  * exact same integer arithmetic as the SQL fragments in
  * [[graft.operators.TextOps]] (and therefore the DuckDB oracles).
  */
object SketchExprs {
  val P = 1000000007L

  /** 60-bit SimHash over token hashes (see TextOps.simhash60). */
  def simhash60(hashes: ArrayData): Long = {
    val n = hashes.numElements()
    var result = 0L
    var b = 0
    while (b < 60) {
      var vote = 0
      var i = 0
      while (i < n) {
        val h = hashes.getLong(i)
        vote += (if (((h >> b) & 1L) == 1L) 1 else -1)
        i += 1
      }
      if (vote > 0) result += (1L << b)
      b += 1
    }
    result
  }

  /** Distinct 60-bit n-token shingle hashes in ONE pass over the
    * lowercased text — no token strings, no shingle strings, no
    * intermediate arrays. Produces bit-identical values to
    * `array_distinct(transform(shingles(tokens(text), n), strHash60))`
    * (proven element-wise by ShingleHashesSpec): per-token polynomial
    * prefix hashes (mults 31/131) are combined across each n-window
    * with the `h(a ++ " " ++ b) = h(a)*31^(len(b)+1) + h(" " ++ b)`
    * identity, so the window hash equals hashing the joined string. */
  def shingleHashes(s: String, n: Int): Array[Long] =
    shingleHashes(s, n, distinct = true)

  def shingleHashes(s: String, n: Int, distinct: Boolean): Array[Long] = {
    require(n >= 1, s"shingle width must be >= 1, got $n")
    def isTok(c: Char): Boolean = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
    // token scan: per-token (hash31, hash131, 31^len, 131^len)
    val h31 = new scala.collection.mutable.ArrayBuffer[Long]
    val h131 = new scala.collection.mutable.ArrayBuffer[Long]
    val p31 = new scala.collection.mutable.ArrayBuffer[Long]
    val p131 = new scala.collection.mutable.ArrayBuffer[Long]
    var i = 0
    while (i < s.length) {
      if (isTok(s.charAt(i))) {
        var a31 = 0L; var a131 = 0L; var w31 = 1L; var w131 = 1L
        while (i < s.length && isTok(s.charAt(i))) {
          val ch = s.charAt(i).toLong
          a31 = (a31 * 31 + ch) % P
          a131 = (a131 * 131 + ch) % P
          w31 = w31 * 31 % P
          w131 = w131 * 131 % P
          i += 1
        }
        h31 += a31; h131 += a131; p31 += w31; p131 += w131
      } else i += 1
    }
    val m = h31.length
    if (m < n) return Array.emptyLongArray
    // first-occurrence distinct mirrors array_distinct; non-distinct
    // keeps every window in order (e.g. SimHash frequency votes)
    val seen = if (distinct) new java.util.LinkedHashSet[java.lang.Long] else null
    val all = if (distinct) null else new Array[Long](m - n + 1)
    var start = 0
    while (start + n <= m) {
      var acc31 = h31(start)
      var acc131 = h131(start)
      var j = start + 1
      while (j < start + n) {
        acc31 = (acc31 * (31L * p31(j) % P) + (32L * p31(j) + h31(j)) % P) % P
        acc131 = (acc131 * (131L * p131(j) % P) + (32L * p131(j) + h131(j)) % P) % P
        j += 1
      }
      val h60 = acc31 * 1073741824L + acc131 % 1073741824L
      if (distinct) seen.add(h60) else all(start) = h60
      start += 1
    }
    if (!distinct) return all
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    out
  }

  /** k-perm MinHash signature (see TextOps.minhashSig). */
  def minhashSig(hashes: ArrayData, k: Int): Array[Long] = {
    val n = hashes.numElements()
    val sig = new Array[Long](k)
    var i = 0
    while (i < k) {
      val a = ((i + 1).toLong * 1103515245L + 12345L) % P
      val b = ((i + 1).toLong * 69069L + 7L) % P
      var min = P
      var j = 0
      while (j < n) {
        // reduce h mod P first: identity for the legacy 30-bit token
        // hashes, and keeps a*h inside Int64 for 60-bit shingle hashes
        val v = (a * (hashes.getLong(j) % P) + b) % P
        if (v < min) min = v
        j += 1
      }
      sig(i) = min
      i += 1
    }
    sig
  }
}

/** `graft_dot(a, b)`: left-fold dot product of two DOUBLE arrays —
  * bit-identical to `aggregate(zip_with(a, b, (x, y) -> x * y),
  * cast(0 as double), (acc, p) -> acc + p)` (same element order, same
  * IEEE addition sequence) and to the DuckDB oracle's `list_reduce`
  * fold, but a single while-loop instead of two interpreted
  * higher-order lambdas with per-element closure dispatch — the
  * similarity re-rank's hot inner loop. `graft_dot(v, v)` is the
  * squared-norm fold (x*x accumulated in element order). Arrays of
  * different lengths fold over the shorter prefix (the zip_with form
  * would null out instead; all engine vectors are fixed-width so the
  * case is unreachable in registered queries). A null ELEMENT yields
  * a null result — matching the fold this expression replaces, where
  * `x * y` with a null operand nulls the whole accumulation. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  // NOT nullIntolerant and always nullable: a null array ELEMENT makes
  // the fold null even when both array inputs are non-null, so the
  // optimizer must not rewrite IsNotNull(graft_dot(a,b)) into
  // IsNotNull(a) AND IsNotNull(b) or mark the output non-nullable
  override def nullIntolerant: Boolean = false
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_dot expects (ARRAY<DOUBLE>, ARRAY<DOUBLE>), got $t")
  }
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `graft_dot_long(a, b)`: exact-integer dot product of two INT or
  * BIGINT arrays, accumulated in BIGINT — value-identical to
  * `aggregate(zip_with(a, b, (x, y) -> cast(x as bigint) * y),
  * cast(0 as bigint), (acc, p) -> acc + p)` (integer addition is
  * associative, so the fold order cannot matter), but one while-loop
  * instead of two interpreted higher-order lambdas with per-element
  * closure dispatch — the int8/sketch scoring hot loop (s28, s37,
  * s24's projection scoring). Null handling matches the lambda form:
  * a null array yields null (BinaryExpression default) and a null
  * ELEMENT nulls the whole fold, so like [[DotProduct]] this is
  * neither nullIntolerant nor non-nullable. Arrays of different
  * lengths fold over the shorter prefix (unreachable in registered
  * queries — all engine vectors are fixed-width). */
case class DotProductLong(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = false
  override def nullable: Boolean = true
  private def ok(t: DataType) = t match {
    case ArrayType(IntegerType, _) | ArrayType(LongType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot_long expects (ARRAY<INT|BIGINT>, ARRAY<INT|BIGINT>), " +
        s"got (${left.dataType}, ${right.dataType})")
  private def isLong(t: DataType) =
    t.asInstanceOf[ArrayType].elementType == LongType
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val xl = isLong(left.dataType)
    val yl = isLong(right.dataType)
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (xl) x.getLong(i) else x.getInt(i).toLong
      val yv = if (yl) y.getLong(i) else y.getInt(i).toLong
      acc += xv * yv
      i += 1
    }
    acc
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Hyperplane-LSH bucket id over a DOUBLE vector (same deterministic
  * integer plane weights and left-fold dot order as
  * [[graft.operators.Similarity.lshBucketExpr]]'s SQL form and the
  * DuckDB oracle). */
case class LshBucket(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_lsh_bucket expects (ARRAY<DOUBLE>, INT), got $t")
  }
  override protected def nullSafeEval(arr: Any, planes: Any): Any = {
    val v = arr.asInstanceOf[ArrayData]
    val nPlanes = planes.asInstanceOf[Int]
    val dims = v.numElements()
    var bucket = 0L
    var p = 0
    while (p < nPlanes) {
      var dot = 0.0
      var d = 1
      while (d <= dims) {
        val w = ((p.toLong * 64 + d) * 2654435761L) % 1000000007L - 500000000L
        dot += v.getDouble(d - 1) * w.toDouble
        d += 1
      }
      if (dot > 0) bucket += (1L << p)
      p += 1
    }
    bucket
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class SimHash60(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_simhash60 expects ARRAY<BIGINT>, got $t")
  }
  override protected def nullSafeEval(arr: Any): Any =
    SketchExprs.simhash60(arr.asInstanceOf[ArrayData])
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `graft_shingle_hashes(text, n)`: distinct 60-bit n-token shingle
  * hashes straight from the text ([[SketchExprs.shingleHashes]]). */
case class ShingleHashes(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_shingle_hashes expects (STRING, INT), got $t")
  }
  override protected def nullSafeEval(str: Any, n: Any): Any =
    new GenericArrayData(SketchExprs.shingleHashes(
      // UTF8String.toLowerCase == SQL lower(): locale-independent
      // (String.toLowerCase would diverge under e.g. a Turkish
      // default locale and break oracle parity)
      str.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toLowerCase.toString,
      n.asInstanceOf[Int]))
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `graft_shingle_hashes_all(text, n)`: ALL 60-bit n-token shingle
  * hashes IN ORDER, with duplicates — the positional face of
  * [[ShingleHashes]] (element i is the hash of the window starting
  * at 1-based token position i+1), for operators that need (pos,
  * hash) occurrences rather than the distinct set (exact-substring
  * span dedup). Value-identical to
  * `transform(shingles(tokens(text), n), strHash60)` without ever
  * materializing the shingle strings. */
case class ShingleHashesAll(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_shingle_hashes_all expects (STRING, INT), got $t")
  }
  override protected def nullSafeEval(str: Any, n: Any): Any =
    new GenericArrayData(SketchExprs.shingleHashes(
      str.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toLowerCase.toString,
      n.asInstanceOf[Int], distinct = false))
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `graft_token_hashes(text)`: per-token 60-bit hashes IN ORDER, with
  * duplicates (width-1 non-distinct windows) — the SimHash input,
  * bit-identical to `transform(tokens(text), strHash60)`. */
case class TokenHashes(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_token_hashes expects STRING, got $t")
  }
  override protected def nullSafeEval(str: Any): Any =
    new GenericArrayData(SketchExprs.shingleHashes(
      str.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toLowerCase.toString,
      1, distinct = false))
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `graft_scrub_keep(cov, n, len)` — the kept-token positions for
  * [[graft.operators.Dedup.scrubRepeatedPassages]]: 1-based position
  * `j` in `1..len` survives iff no removal-window start `i` in the
  * SORTED-ascending `cov` satisfies `i <= j AND i > j - n` (i.e. no
  * n-token removal window covers token j). A linear two-pointer merge
  * over (positions, cov) — O(len + |cov|) — replacing the
  * `filter(sequence(1, len), j -> exists(cov, ...))` form whose
  * re-scan of the whole removal list per token was O(len·|cov|):
  * quadratic exactly on the long highly-duplicated documents this
  * operator exists to scrub. */
case class ScrubKeep(first: Expression, second: Expression, third: Expression)
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(first, second, third)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(LongType, _), IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_scrub_keep expects (ARRAY<BIGINT>, INT, INT), got $t")
    }

  override def eval(input: InternalRow): Any = {
    val covAny = first.eval(input)
    val nAny = second.eval(input)
    val lenAny = third.eval(input)
    if (covAny == null || nAny == null || lenAny == null) return null
    val cov = covAny.asInstanceOf[ArrayData]
    val n = nAny.asInstanceOf[Int]
    val len = lenAny.asInstanceOf[Int]
    val nCov = cov.numElements()
    // the two-pointer merge is only correct on ascending cov — the
    // function is in the general SQL registry, so enforce the contract
    // over the WHOLE array up front (a consumed-elements-only check
    // would miss an out-of-order witness parked behind an entry > len,
    // which the merge below never advances past)
    var p = 1
    while (p < nCov) {
      if (cov.getLong(p) < cov.getLong(p - 1)) throw new IllegalArgumentException(
        s"graft_scrub_keep: cov must be sorted ascending " +
          s"(saw ${cov.getLong(p)} after ${cov.getLong(p - 1)})")
      p += 1
    }
    val out = new ArrayBuffer[Int](len)
    var ptr = 0
    var last = Long.MinValue // greatest removal start <= j so far
    var j = 1
    while (j <= len) {
      while (ptr < nCov && cov.getLong(ptr) <= j) {
        last = cov.getLong(ptr); ptr += 1
      }
      if (last <= j - n) out += j
      j += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(first = newChildren(0), second = newChildren(1), third = newChildren(2))
}

case class MinHashSig(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_minhash expects (ARRAY<BIGINT>, INT), got $t")
  }
  override protected def nullSafeEval(arr: Any, k: Any): Any =
    new GenericArrayData(SketchExprs.minhashSig(arr.asInstanceOf[ArrayData], k.asInstanceOf[Int]))
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
