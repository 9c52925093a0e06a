package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
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
  * different lengths yield NULL — exactly the zip_with form, which
  * null-pads the shorter array so the fold nulls out (r16 ADVICE:
  * the former shorter-prefix fold was a silent divergence waiting
  * for a malformed vector; unreachable for fixed-width engine
  * vectors either way). A null ELEMENT yields a null result —
  * matching the fold this expression replaces, where `x * y` with a
  * null operand nulls the whole accumulation.
  *
  * Whole-stage-codegen native (round 17, guide §1.2 "per-task work"):
  * `doGenCode` emits the same while-loop inline, so the scoring
  * projection stays inside the stage's generated code instead of
  * falling back to interpreted per-row eval (CodegenFallback hid an
  * InternalRow round-trip per candidate pair). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
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
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }
  // The loop lives in its OWN generated method (ctx.addNewFunction),
  // never inline in the consume path: inlined, a fused
  // join+projection span with this loop exceeds the JVM's
  // 8000-bytecode huge-method JIT limit, and the whole stage silently
  // runs in the bytecode interpreter (measured: s37 2.2 s inline vs
  // 1.45 s with -XX:-DontCompileHugeMethods; the split gets the same
  // JIT without JVM flags). The null flag rides a mutable field —
  // codegen evaluates one row at a time per instance, so this is
  // race-free.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ad = classOf[ArrayData].getName
    val nullFlag = ctx.addMutableState("boolean", "dotNull")
    val fn = ctx.freshName("dotDouble")
    val fnDecl = ctx.addNewFunction(fn,
      s"""
         |private double $fn($ad x, $ad y) {
         |  $nullFlag = false;
         |  final int n = x.numElements();
         |  if (n != y.numElements()) { $nullFlag = true; return 0.0; }
         |  double acc = 0.0;
         |  for (int i = 0; i < n; i++) {
         |    if (x.isNullAt(i) || y.isNullAt(i)) { $nullFlag = true; return 0.0; }
         |    acc += x.getDouble(i) * y.getDouble(i);
         |  }
         |  return acc;
         |}
       """.stripMargin)
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"""
         |${ev.value} = $fnDecl($x, $y);
         |${ev.isNull} = $nullFlag;
       """.stripMargin)
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
  * lengths yield NULL — exactly the zip_with form, which null-pads
  * the shorter array so the fold nulls out (r16 ADVICE; unreachable
  * for fixed-width engine vectors either way).
  *
  * Whole-stage-codegen native (round 17, guide §1.2 "per-task work"):
  * `doGenCode` emits the same while-loop inline — the r16 version was
  * CodegenFallback, i.e. still interpreted per candidate pair. */
case class DotProductLong(left: Expression, right: Expression)
    extends BinaryExpression {
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
    val n = x.numElements()
    if (n != y.numElements()) return null
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
  // loop in its OWN generated method — see [[DotProduct.doGenCode]]'s
  // huge-method-JIT note (s37's fused join+projection span measured
  // 2.2 s with the loop inlined vs 1.45 s once the stage JITs)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getX = if (isLong(left.dataType)) "getLong" else "getInt"
    val getY = if (isLong(right.dataType)) "getLong" else "getInt"
    val ad = classOf[ArrayData].getName
    val nullFlag = ctx.addMutableState("boolean", "dotLongNull")
    val fn = ctx.freshName("dotLong")
    val fnDecl = ctx.addNewFunction(fn,
      s"""
         |private long $fn($ad x, $ad y) {
         |  $nullFlag = false;
         |  final int n = x.numElements();
         |  if (n != y.numElements()) { $nullFlag = true; return 0L; }
         |  long acc = 0L;
         |  for (int i = 0; i < n; i++) {
         |    if (x.isNullAt(i) || y.isNullAt(i)) { $nullFlag = true; return 0L; }
         |    acc += (long) x.$getX(i) * (long) y.$getY(i);
         |  }
         |  return acc;
         |}
       """.stripMargin)
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"""
         |${ev.value} = $fnDecl($x, $y);
         |${ev.isNull} = $nullFlag;
       """.stripMargin)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `graft_rp_sketch(q, dims)`: signed random-projection sketch of an
  * INT/BIGINT vector — `sk[j] = Σ_d q[d] · (1 − 2·((d·31 + j·17) mod 2))`
  * for j in 0..dims−1 (the Achlioptas ±1 scheme under the engine's
  * deterministic sign matrix; d is the 0-based element index).
  * Value-identical to the former
  * `transform(sequence(0, dims−1), j -> aggregate(sequence(0, size(q)−1),
  * 0L, (a, d) -> a + q[d] * (1 − 2·((d·31 + j·17) % 2))))` — exact
  * integer arithmetic, so fold order cannot matter — but one doubly
  * nested while-loop instead of dims × D interpreted lambda
  * dispatches per row (s20's projection hot map). Null semantics
  * mirror the lambda form: a NULL input array or any NULL element
  * yields an array of `dims` NULLs (each sk_j folds over every d, so
  * one null element nulls every coordinate; the outer transform runs
  * over the literal dims-sequence, so the ARRAY itself is never
  * null). `dims` must be a foldable non-null INT >= 1 — it is a
  * shape constant, never data.
  *
  * Whole-stage-codegen native (round 17): `doGenCode` emits the same
  * nested loop inline, no CodegenFallback in the s20 plan. */
case class RpSketch(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  // never null: null/null-element inputs produce an array of nulls
  // (the lambda form's behavior), not a null array
  override def nullable: Boolean = false
  override def nullIntolerant: Boolean = false
  private def okElem(t: DataType) = t match {
    case ArrayType(IntegerType, _) | ArrayType(LongType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (!okElem(left.dataType) || right.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_rp_sketch expects (ARRAY<INT|BIGINT>, INT), " +
          s"got (${left.dataType}, ${right.dataType})")
    else if (!right.foldable || right.eval() == null)
      TypeCheckResult.TypeCheckFailure(
        "graft_rp_sketch: dims must be a non-null INT literal")
    else if (right.eval().asInstanceOf[Int] < 1)
      TypeCheckResult.TypeCheckFailure(
        s"graft_rp_sketch: dims must be >= 1, got ${right.eval()}")
    else TypeCheckResult.TypeCheckSuccess
  private lazy val dims: Int = right.eval().asInstanceOf[Int]
  private def isLong = left.dataType.asInstanceOf[ArrayType].elementType == LongType
  override def eval(input: InternalRow): Any = {
    val qAny = left.eval(input)
    val q = if (qAny == null) null else qAny.asInstanceOf[ArrayData]
    val n = if (q == null) 0 else q.numElements()
    var anyNull = q == null
    var d = 0
    while (!anyNull && d < n) { anyNull = q.isNullAt(d); d += 1 }
    if (anyNull) return new GenericArrayData(new Array[Any](dims))
    val longIn = isLong
    val out = new Array[Long](dims)
    var j = 0
    while (j < dims) {
      var acc = 0L
      d = 0
      while (d < n) {
        val v = if (longIn) q.getLong(d) else q.getInt(d).toLong
        acc += v * (1 - 2 * ((d * 31 + j * 17) % 2))
        d += 1
      }
      out(j) = acc
      j += 1
    }
    new GenericArrayData(out)
  }
  // nested loop in its OWN generated method — see
  // [[DotProduct.doGenCode]]'s huge-method-JIT note (inlined loops in
  // a fused span push the consume method past the JVM's 8000-bytecode
  // JIT limit and the whole stage runs interpreted)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val q = left.genCode(ctx)
    val getQ = if (isLong) "getLong" else "getInt"
    val gad = classOf[GenericArrayData].getName
    val ad = classOf[ArrayData].getName
    val fn = ctx.freshName("rpSketch")
    val fnDecl = ctx.addNewFunction(fn,
      s"""
         |private $ad $fn($ad q) {
         |  boolean anyNull = (q == null);
         |  final int n = anyNull ? 0 : q.numElements();
         |  for (int d = 0; !anyNull && d < n; d++) anyNull = q.isNullAt(d);
         |  if (anyNull) return new $gad(new Object[$dims]);
         |  long[] out = new long[$dims];
         |  for (int j = 0; j < $dims; j++) {
         |    long acc = 0L;
         |    for (int d = 0; d < n; d++) {
         |      acc += (long) q.$getQ(d) * (long) (1 - 2 * ((d * 31 + j * 17) % 2));
         |    }
         |    out[j] = acc;
         |  }
         |  return new $gad(out);
         |}
       """.stripMargin)
    val resultCode =
      code"""
        ${q.code}
        $ad ${ev.value} = $fnDecl(${q.isNull} ? null : ${q.value});
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
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
