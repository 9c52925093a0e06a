package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Join operators Spark lacks natively, built by composition
  * (preference (a) from the build brief — no custom SparkPlan needed
  * because the semantics decompose into union + window).
  */
object Joins {

  /** As-of join: for each left row, attach the greatest `rightOrder`
    * value <= the left row's `leftOrder`, within `keyCols` groups —
    * equivalent to DuckDB/kdb ASOF JOIN on (key, l.ord >= r.ord).
    *
    * Physical plan: union the tagged sides, one shuffle on the key,
    * running max over the sort order (right rows sort before left rows
    * at equal ordinates so equality matches inclusively), then filter
    * back to left rows. Scales like any windowed agg — no range-join
    * explosion, no per-key materialization beyond the window frame.
    *
    * @return the left rows plus column `asof_<rightOrderName>` (null
    *         when no right row precedes).
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftOrder: String,
      rightOrder: String): DataFrame = {
    val leftTagged = left.withColumn("__ord", col(leftOrder))
      .withColumn("__is_left", lit(1))
      .withColumn("__rord", lit(null).cast(right.schema(rightOrder).dataType))
    val rightTagged = right.select(
      (keyCols.map(col) :+
        col(rightOrder).as("__ord") :+
        lit(0).as("__is_left") :+
        col(rightOrder).as("__rord")): _*)
    // align schemas: right side carries nulls for left payload columns
    val leftCols = leftTagged.columns
    val rightAligned = leftCols.foldLeft(rightTagged) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(leftTagged.schema(c).dataType))
    }.select(leftCols.map(col): _*)

    val unioned = leftTagged.union(rightAligned)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ord").asc, col("__is_left").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(s"asof_$rightOrder", max(col("__rord")).over(w))
      .filter(col("__is_left") === 1)
      .drop("__ord", "__is_left", "__rord")
  }

  /** FORWARD as-of join — the mirror of [[asOf]]: each left row picks
    * the EARLIEST right order value at or after its own
    * (`rightOrder >= leftOrder`, inclusive at equality like the
    * backward join's `<=`). Same union+window shape: one key-
    * partitioned sort, `min` over the [current, unbounded following]
    * frame, left rows at a shared timestamp sorted BEFORE right rows
    * so the tie is visible to the frame. NULL when no later right
    * row exists. */
  def asOfForward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftOrder: String,
      rightOrder: String): DataFrame = {
    val leftTagged = left.withColumn("__ord", col(leftOrder))
      .withColumn("__is_left", lit(1))
      .withColumn("__rord", lit(null).cast(right.schema(rightOrder).dataType))
    val rightTagged = right.select(
      (keyCols.map(col) :+
        col(rightOrder).as("__ord") :+
        lit(0).as("__is_left") :+
        col(rightOrder).as("__rord")): _*)
    val leftCols = leftTagged.columns
    val rightAligned = leftCols.foldLeft(rightTagged) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(leftTagged.schema(c).dataType))
    }.select(leftCols.map(col): _*)
    val unioned = leftTagged.union(rightAligned)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ord").asc, col("__is_left").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    unioned
      .withColumn(s"asof_$rightOrder", min(col("__rord")).over(w))
      .filter(col("__is_left") === 1)
      .drop("__ord", "__is_left", "__rord")
  }

  /** Interval (range) join with NO equi-key: every (point, interval)
    * pair with `start <= point < end`. Column sets of the two inputs
    * must be disjoint; `pointCol`/`startCol`/`endCol` are integral
    * (e.g. `unix_micros` timestamps). Empty intervals (end <= start)
    * match nothing and are dropped up front.
    *
    * Spark's own plan for a pure inequality join is a broadcast
    * nested-loop / cartesian scan — O(|P|·|I|) compares, the classic
    * range-join scale killer. This operator buckets the domain into
    * `bucketWidth`-sized cells: each interval replicates to the
    * buckets it covers (explode of a `sequence` — bounded by
    * len/bucketWidth + 1), each point lands in exactly ONE bucket, and
    * the join becomes a plain hash-shuffle equi-join on the bucket id
    * with the exact range predicate as a post-filter. No dedup pass is
    * needed: a matching pair meets in precisely the point's bucket.
    *
    * 100 TB shape: compares drop from |P|·|I| to pairs that share a
    * bucket — pick bucketWidth near the typical interval length so
    * replication stays O(1) per interval while buckets stay selective;
    * time-ordered data also keeps both sides' bucket ids range-
    * clustered, so AQE sees a well-distributed shuffle key.
    */
  /** replication guard for [[rangeJoin]]: one corrupt/open-ended
    * interval (an end timestamp years out) would otherwise explode to
    * millions-to-billions of sequence elements in a single row —
    * overflowing Spark's array limit or OOMing one task. Past the cap
    * the job fails FAST with a diagnosable message (raise bucketWidth
    * or clean the interval) instead of dying in codegen. */
  val MaxBucketsPerInterval = 65536L

  /** backtick-quote a column reference for splicing into SQL-text
    * expressions (a column named `point value` or `a-b` must not be
    * parsed as arithmetic or silently mis-bind). Each '.'-separated
    * part is quoted independently, so qualified / nested references
    * ("a.point", "evt.ts") keep resolving as field accesses — quoting
    * the whole string would turn them into one unresolvable
    * identifier. The corner this trades away: a column whose NAME
    * contains a literal dot can't be addressed here (rename it
    * first). */
  private def q(name: String): String =
    name.split('.').map(p => "`" + p.replace("`", "``") + "`").mkString(".")

  def rangeJoin(points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val (pc, sc, ec) = (q(pointCol), q(startCol), q(endCol))
    val pts = points.withColumn("__bucket", expr(s"$pc div $bucketWidth"))
    // last candidate bucket is (end-1) div width: the end bound is
    // exclusive, so a point in a later bucket can never match
    val lastB = s"(($ec - 1) div $bucketWidth)"
    val firstB = s"($sc div $bucketWidth)"
    val ivs = intervals.filter(expr(s"$ec > $sc"))
      .withColumn("__bucket", explode(expr(
        s"if($lastB - $firstB < $MaxBucketsPerInterval, " +
          s"sequence($firstB, $lastB), " +
          s"cast(raise_error(concat('rangeJoin: interval [', $sc, ', ', $ec, " +
          s"') covers more than $MaxBucketsPerInterval buckets of width $bucketWidth — " +
          s"raise bucketWidth or clean the interval')) as array<bigint>))")))
    pts.join(ivs, Seq("__bucket"))
      .filter(expr(s"$pc >= $sc AND $pc < $ec"))
      .drop("__bucket")
  }
}
