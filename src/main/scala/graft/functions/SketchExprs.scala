package graft.functions

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
        val v = (a * hashes.getLong(j) + b) % P
        if (v < min) min = v
        j += 1
      }
      sig(i) = min
      i += 1
    }
    sig
  }
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
