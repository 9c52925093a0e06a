package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_bpe_apply(syms, merges)` — apply a trained BPE merge table
  * to one symbol array: for each merge `(l, r)` IN TRAINING ORDER, one
  * greedy left-to-right pass collapsing adjacent `l`,`r` into `l || r`
  * (the canonical tokenizer-apply; a freshly merged symbol never
  * re-matches inside its own pass). Equivalent to the corpus-wide
  * sequential merge applies of [[graft.operators.Bpe.trainMerges]]'s
  * loop — application is per-token independent, so folding all
  * `steps` passes into one expression evaluation changes nothing —
  * but runs as a single O(steps · len) JVM loop in ONE projection:
  * no chained plans, no per-apply checkpoint, no nested-lambda
  * planning blowup (measured: Catalyst analysis of 8 chained lambda
  * folds cost ~9 s; this expression plans flat).
  *
  * `merges` must be a foldable ARRAY<ARRAY<STRING>> of [l, r] pairs —
  * the merge table is plan-time state (O(steps), the driver already
  * holds it), not row data. Unpacked once per plan.
  */
case class BpeApply(first: Expression, second: Expression)
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(first, second)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = first.nullable
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType) match {
      case (ArrayType(StringType, _), ArrayType(ArrayType(StringType, _), _))
          if second.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case t =>
        TypeCheckResult.TypeCheckFailure(
          "graft_bpe_apply expects (ARRAY<STRING>, ARRAY<ARRAY<STRING>> literal of " +
            s"[l, r] pairs), got $t")
    }

  /** (l, r, l||r) per merge, in training order. */
  @transient private lazy val merges: Array[(UTF8String, UTF8String, UTF8String)] = {
    val outerAny = second.eval(null)
    require(outerAny != null, "graft_bpe_apply: merges literal must not be null")
    val outer = outerAny.asInstanceOf[ArrayData]
    Array.tabulate(outer.numElements()) { i =>
      require(!outer.isNullAt(i), s"graft_bpe_apply: merge $i is null, expected [l, r]")
      val pair = outer.getArray(i)
      require(pair.numElements() == 2,
        s"graft_bpe_apply: merge ${i} has ${pair.numElements()} elements, expected [l, r]")
      require(!pair.isNullAt(0) && !pair.isNullAt(1),
        s"graft_bpe_apply: merge $i contains a null side, expected [l, r]")
      val l = pair.getUTF8String(0).clone()
      val r = pair.getUTF8String(1).clone()
      (l, r, UTF8String.concat(l, r))
    }
  }

  override def eval(input: InternalRow): Any = {
    val sAny = first.eval(input)
    if (sAny == null) return null
    val in = sAny.asInstanceOf[ArrayData]
    var n = in.numElements()
    val buf = new Array[UTF8String](n)
    // provenance bit per slot: a merged symbol is a FRESH UTF8String
    // (concat in `merges`), but an unmerged symbol still points into
    // the input row's buffer — if the output is ever buffered past
    // this row (interpreted sort/agg key paths), those references
    // would go stale when the unsafe row buffer is reused. Surviving
    // input symbols are cloned at emit; fresh merge products are not
    // (same reason the merges literal itself is cloned above).
    val fresh = new Array[Boolean](n)
    var i = 0
    while (i < n) {
      val s = in.getUTF8String(i)
      // registry-callable: a clear error beats an opaque NPE from the
      // merge comparison below
      if (s == null) throw new IllegalArgumentException(
        s"graft_bpe_apply: null symbol at position $i")
      buf(i) = s
      i += 1
    }
    var m = 0
    while (m < merges.length && n > 1) {
      val (l, r, lr) = merges(m)
      // in-place greedy pass: w trails i; collapse when the written
      // tail is l and the incoming symbol is r
      var w = 0
      i = 0
      while (i < n) {
        val x = buf(i)
        val xf = fresh(i)
        if (w > 0 && buf(w - 1).equals(l) && x.equals(r)) {
          buf(w - 1) = lr
          fresh(w - 1) = true
        } else { buf(w) = x; fresh(w) = xf; w += 1 }
        i += 1
      }
      n = w
      m += 1
    }
    val out = new Array[Any](n)
    i = 0
    while (i < n) { out(i) = if (fresh(i)) buf(i) else buf(i).clone(); i += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(first = newChildren(0), second = newChildren(1))
}
