package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native coarse-quantization expressions: the centroid-assignment and
  * product-quantization inner loops as tight JVM loops over a FOLDABLE
  * broadcast-sized codebook literal, replacing the typed-lambda
  * `Dataset.map` passes that round-tripped every corpus vector through
  * Tungsten→JVM objects→Tungsten (the round-6 advisory). The codebook
  * rides the plan as a literal (O(k·D) — constant in corpus size, the
  * same state the old closures broadcast), is unpacked ONCE at plan
  * time, and the full-corpus pass stays in columnar execution with no
  * Serialize/DeserializeToObject barrier.
  *
  * All arithmetic is the exact fold-order IEEE the DuckDB oracles
  * replay: dot products accumulate in element order ([[DotProduct]]'s
  * loop), cosines are `dot / (sqrt(nv) * sqrt(nc))`, and rank order is
  * `(cos DESC, position ASC)` with NaN sorting greatest — Spark's and
  * DuckDB's shared double sort semantics (`java.lang.Double.compare`).
  */
object CentroidExprs {

  /** Unpack an ARRAY<ARRAY<DOUBLE>> literal into JVM arrays once, with
    * the shared codebook contract enforced where it is cheapest — once
    * per plan, not per row: non-empty, and every centroid the same
    * dimension (a silently min-truncated dot product is a
    * plausible-but-wrong cosine, worse than an error). */
  private[functions] def unpackCents(a: Any, fn: String): Array[Array[Double]] = {
    val outer = a.asInstanceOf[ArrayData]
    val cents = Array.tabulate(outer.numElements()) { i =>
      outer.getArray(i).toDoubleArray()
    }
    require(cents.nonEmpty, s"$fn: codebook literal must be non-empty")
    val d = cents(0).length
    require(cents.forall(_.length == d),
      s"$fn: all codebook vectors must share one dimension " +
        s"(saw ${cents.map(_.length).distinct.mkString(",")})")
    cents
  }

  private[functions] def unpackNorms(a: Any): Array[Double] =
    a.asInstanceOf[ArrayData].toDoubleArray()

  /** squared-L2 fold in element order — bit-identical to
    * `graft_dot(v, v)` and the oracle's norm2 list_reduce. */
  private[functions] def norm2(v: ArrayData): Double = {
    var acc = 0.0
    var i = 0
    val n = v.numElements()
    while (i < n) { val x = v.getDouble(i); acc += x * x; i += 1 }
    acc
  }
}

/** `graft_centroid_ranks(v, cents, cnorms)` — the codebook positions
  * (0-based) ordered by `(cosine(v, cents[p]) DESC, p ASC)`: element 1
  * is the nearest-centroid assignment, `slice(.., 1, nprobe)` is the
  * IVF probe list. `cents`/`cnorms` must be foldable (literals): the
  * codebook is plan-time state, not row data.
  *
  * NaN cosines are SKIPPED (excluded from the ranking), mirroring the
  * strict `c > bestCos` closure semantics this expression replaces: a
  * NaN never wins an argmax there, so a zero-norm input vector yields
  * an EMPTY ranking (callers coalesce the assignment to -1, exactly
  * the closure's bestId = -1) and a zero-norm centroid can never be
  * assigned or probed. ±Inf cosines (zero-norm centroid, non-zero
  * dot) rank normally on both sides.
  */
case class CentroidRanks(first: Expression, second: Expression, third: Expression)
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(first, second, third)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _), ArrayType(DoubleType, _))
          if second.foldable && third.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case t =>
        TypeCheckResult.TypeCheckFailure(
          "graft_centroid_ranks expects (ARRAY<DOUBLE>, ARRAY<ARRAY<DOUBLE>> literal, " +
            s"ARRAY<DOUBLE> literal), got $t")
    }

  @transient private lazy val cents: Array[Array[Double]] =
    CentroidExprs.unpackCents(second.eval(null), "graft_centroid_ranks")
  @transient private lazy val cnorms: Array[Double] = {
    val ns = CentroidExprs.unpackNorms(third.eval(null))
    require(ns.length == cents.length,
      s"graft_centroid_ranks: ${cents.length} centroids but ${ns.length} norms")
    ns
  }

  override def eval(input: InternalRow): Any = {
    val vAny = first.eval(input)
    if (vAny == null) return null
    val v = vAny.asInstanceOf[ArrayData]
    val d = cents(0).length
    if (v.numElements() != d) throw new IllegalArgumentException(
      s"graft_centroid_ranks: vector dim ${v.numElements()} != codebook dim $d")
    val nv = CentroidExprs.norm2(v)
    val k = cents.length
    val cos = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cv = cents(c)
      var dot = 0.0
      var i = 0
      while (i < d) { dot += v.getDouble(i) * cv(i); i += 1 }
      cos(c) = dot / (math.sqrt(nv) * math.sqrt(cnorms(c)))
      c += 1
    }
    // rank (cos DESC, pos ASC) over NON-NaN cosines only — a NaN is
    // never strictly greater, so the closure argmax skipped it; ties
    // (incl. -0.0 vs 0.0, neither strictly greater) keep the earlier
    // position, exactly the closure's first-wins behavior
    val pos = Array.tabulate(k)(identity).filter(p => !cos(p).isNaN)
    val ranked = pos.sortWith { (a, b) =>
      if (cos(a) > cos(b)) true
      else if (cos(b) > cos(a)) false
      else a < b
    }
    new GenericArrayData(ranked.map(_.toLong))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(first = newChildren(0), second = newChildren(1), third = newChildren(2))
}

/** `graft_pq(v, cents, m)` — product-quantization coding
  * (Jegou et al., PAMI 2011) against per-subvector slices of a
  * foldable codebook: STRUCT(codes ARRAY<BIGINT> — the 0-based
  * codebook POSITION per subvector, L2-argmin with smallest-position
  * ties — , recon_cos DOUBLE — cosine between v and its codebook
  * reconstruction, pinned to 0 when either norm is 0). The caller maps
  * positions to codebook ids (`element_at` over the id literal).
  */
case class PqEncode(first: Expression, second: Expression, third: Expression)
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(first, second, third)
  override def dataType: DataType = StructType(Seq(
    StructField("codes", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("recon_cos", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _), IntegerType)
          if second.foldable && third.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case t =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_pq expects (ARRAY<DOUBLE>, ARRAY<ARRAY<DOUBLE>> literal, INT literal), got $t")
    }

  @transient private lazy val cents: Array[Array[Double]] =
    CentroidExprs.unpackCents(second.eval(null), "graft_pq")
  @transient private lazy val m: Int = {
    val v = third.eval(null).asInstanceOf[Int]
    require(v > 0, s"graft_pq: m must be positive, got $v")
    v
  }

  override def eval(input: InternalRow): Any = {
    val vAny = first.eval(input)
    if (vAny == null) return null
    val v = vAny.asInstanceOf[ArrayData].toDoubleArray()
    require(v.length == cents(0).length,
      s"graft_pq: vector dim ${v.length} != codebook dim ${cents(0).length}")
    require(v.length % m == 0, s"graft_pq: dim ${v.length} not divisible by m=$m")
    val d = v.length / m
    val codes = new Array[Long](m)
    val vr = new Array[Double](v.length)
    var j = 0
    while (j < m) {
      // argmin over codebook POSITIONS; strict < keeps the smallest
      // position on ties, matching the oracle's (dist, cid) rank
      var bestIdx = -1
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < cents.length) {
        val cv = cents(c)
        var dist = 0.0
        var i = 0
        while (i < d) {
          val df = v(j * d + i) - cv(j * d + i)
          dist += df * df
          i += 1
        }
        if (dist < bestD) { bestD = dist; bestIdx = c }
        c += 1
      }
      codes(j) = bestIdx.toLong
      val cv = cents(bestIdx)
      var i = 0
      while (i < d) { vr(j * d + i) = cv(j * d + i); i += 1 }
      j += 1
    }
    var dot = 0.0
    var nv = 0.0
    var nr = 0.0
    var i = 0
    while (i < v.length) {
      dot += v(i) * vr(i)
      nv += v(i) * v(i)
      nr += vr(i) * vr(i)
      i += 1
    }
    // 0/0 would be NaN here but NULL in the oracle's SQL division —
    // pin the degenerate case to cosine 0 ("nothing reconstructed")
    val cos = if (nv == 0.0 || nr == 0.0) 0.0
      else dot / (math.sqrt(nv) * math.sqrt(nr))
    val row = new GenericInternalRow(2)
    row.update(0, new GenericArrayData(codes))
    row.setDouble(1, cos)
    row
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(first = newChildren(0), second = newChildren(1), third = newChildren(2))
}
