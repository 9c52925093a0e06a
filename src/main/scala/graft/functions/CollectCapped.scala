package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Buffer for [[CollectCapped]]: once a group exceeds the cap it is
  * permanently overflowed and its storage is RELEASED — a hot group
  * costs O(cap) memory no matter how many rows it receives. */
final class CappedLongBuf(var overflowed: Boolean, var n: Int, var buf: ArrayBuffer[Long])

/** `graft_collect_capped(col, cap)` — collect a group's LongType
  * values, SORTED; a group receiving more than `cap` ROWS (nulls
  * included — count(*) semantics) evaluates to NULL and stops
  * buffering immediately.
  *
  * The similarity self-join's doc-frequency prune in one aggregation:
  * "shingles with more than `cap` docs generate no candidates" is
  * exactly "groups that overflow collapse to null". The two-extra-pass
  * alternative (count doc frequencies, broadcast the hot set for an
  * anti-join, THEN collect the surviving groups) reads the exploded
  * corpus three times; this reads it once, and unlike a plain
  * `collect_list`-then-filter it cannot buffer a hot shingle's
  * millions of ids — the buffer is dropped at cap+1, which is the
  * property that makes single-pass collection safe at 100 TB.
  */
case class CollectCapped(child: Expression, cap: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CappedLongBuf] {

  def this(child: Expression, capExpr: Expression) =
    this(child, CollectCapped.literalCap(capExpr, "graft_collect_capped"))

  require(cap > 0, "graft_collect_capped: cap must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_collect_capped expects a BIGINT column, got ${child.dataType}")

  override def createAggregationBuffer(): CappedLongBuf =
    new CappedLongBuf(false, 0, ArrayBuffer.empty)

  private def overflow(b: CappedLongBuf): Unit = {
    b.overflowed = true
    b.buf = ArrayBuffer.empty // release, don't just clear
  }

  override def update(b: CappedLongBuf, input: InternalRow): CappedLongBuf = {
    if (!b.overflowed) {
      // EVERY row counts toward the cap (count(*) semantics — the df
      // prune this replaces counted null rows too); only non-null
      // values are collected
      b.n += 1
      if (b.n > cap) overflow(b)
      else {
        val v = child.eval(input)
        if (v != null) b.buf += v.asInstanceOf[Long]
      }
    }
    b
  }

  override def merge(b: CappedLongBuf, o: CappedLongBuf): CappedLongBuf = {
    if (o.overflowed) overflow(b)
    else if (!b.overflowed) {
      b.n += o.n
      if (b.n > cap) overflow(b)
      else b.buf ++= o.buf
    }
    b
  }

  override def eval(b: CappedLongBuf): Any =
    if (b.overflowed) null
    else new GenericArrayData(b.buf.sorted.toArray)

  override def serialize(b: CappedLongBuf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(9 + 8 * b.buf.length)
    bb.put(if (b.overflowed) 1.toByte else 0.toByte)
    bb.putInt(b.n)
    bb.putInt(b.buf.length)
    b.buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CappedLongBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val overflowed = bb.get() == 1.toByte
    val n = bb.getInt()
    val k = bb.getInt()
    val buf = new ArrayBuffer[Long](k)
    var i = 0
    while (i < k) { buf += bb.getLong(); i += 1 }
    new CappedLongBuf(overflowed, n, buf)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectCapped =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectCapped =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Buffer for [[CollectSetCapped]]: `n` counts ALL rows seen — nulls
  * included (the group-size cap is on rows, matching a count(*)
  * doc-frequency prune), `set` holds the distinct non-null values —
  * released permanently on overflow. UTF8String storage keeps the
  * output in binary (codepoint) order, matching array_sort /
  * collect_set and the DuckDB oracle for non-ASCII values. */
final class CappedStrBuf(var overflowed: Boolean, var n: Int,
    var set: scala.collection.mutable.HashSet[org.apache.spark.unsafe.types.UTF8String])

/** `graft_collect_set_capped(col, cap)` — the STRING/set sibling of
  * [[CollectCapped]] for the source-overlap shape: count the group's
  * rows, collect the DISTINCT string values, and collapse to null the
  * moment the group exceeds `cap` rows (releasing the buffer). Output
  * sorted. One aggregation pass replaces "count doc frequencies,
  * broadcast the hot set for an anti-join, collect_set the survivors".
  */
case class CollectSetCapped(child: Expression, cap: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CappedStrBuf] {

  def this(child: Expression, capExpr: Expression) =
    this(child, CollectCapped.literalCap(capExpr, "graft_collect_set_capped"))

  require(cap > 0, "graft_collect_set_capped: cap must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_collect_set_capped expects a STRING column, got ${child.dataType}")

  override def createAggregationBuffer(): CappedStrBuf =
    new CappedStrBuf(false, 0, scala.collection.mutable.HashSet.empty)

  private def overflow(b: CappedStrBuf): Unit = {
    b.overflowed = true
    b.set = scala.collection.mutable.HashSet.empty
  }

  override def update(b: CappedStrBuf, input: InternalRow): CappedStrBuf = {
    if (!b.overflowed) {
      // every row counts (count(*) semantics), null or not
      b.n += 1
      if (b.n > cap) overflow(b)
      else {
        val v = child.eval(input)
        if (v != null) {
          // copy out of the reused row buffer
          b.set += v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].clone()
        }
      }
    }
    b
  }

  override def merge(b: CappedStrBuf, o: CappedStrBuf): CappedStrBuf = {
    if (o.overflowed) overflow(b)
    else if (!b.overflowed) {
      b.n += o.n
      if (b.n > cap) overflow(b)
      else b.set ++= o.set
    }
    b
  }

  override def eval(b: CappedStrBuf): Any =
    if (b.overflowed) null
    else new GenericArrayData(
      b.set.toArray.sortWith(_.compareTo(_) < 0).map(x => x: Any))

  override def serialize(b: CappedStrBuf): Array[Byte] = {
    // length-prefixed UTF-8 bytes — DataOutputStream.writeUTF would
    // throw past 64 KB per string
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeBoolean(b.overflowed)
    out.writeInt(b.n)
    out.writeInt(b.set.size)
    b.set.foreach { u =>
      val bytes = u.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): CappedStrBuf = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val overflowed = in.readBoolean()
    val n = in.readInt()
    val k = in.readInt()
    val set = scala.collection.mutable.HashSet.empty[org.apache.spark.unsafe.types.UTF8String]
    var i = 0
    while (i < k) {
      val len = in.readInt()
      val arr = new Array[Byte](len)
      in.readFully(arr)
      set += org.apache.spark.unsafe.types.UTF8String.fromBytes(arr)
      i += 1
    }
    new CappedStrBuf(overflowed, n, set)
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectSetCapped =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectSetCapped =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object CollectCapped {
  /** Resolve a cap argument to its Int value with clear analysis-time
    * errors: a non-foldable cap (a column, a subquery) or a
    * non-integral literal previously surfaced as an opaque
    * `eval`/ClassCast failure from inside the function builder. */
  private[functions] def literalCap(capExpr: Expression, fn: String): Int = {
    if (!capExpr.foldable) throw new IllegalArgumentException(
      s"$fn: cap must be a literal, got the non-foldable expression ${capExpr.sql}")
    capExpr.eval() match {
      case null => throw new IllegalArgumentException(
        s"$fn: cap must be a non-null literal")
      // integral types only: a fractional DOUBLE/DECIMAL cap silently
      // truncating (2.9 -> 2) is exactly the unclear behavior this
      // helper exists to reject
      case b: java.lang.Byte => b.intValue()
      case s: java.lang.Short => s.intValue()
      case i: java.lang.Integer => i.intValue()
      case l: java.lang.Long =>
        if (l > Int.MaxValue || l < Int.MinValue) throw new IllegalArgumentException(
          s"$fn: cap $l overflows Int")
        l.intValue()
      case other => throw new IllegalArgumentException(
        s"$fn: cap must be an integral literal, got '$other' (${capExpr.dataType.sql})")
    }
  }
}
