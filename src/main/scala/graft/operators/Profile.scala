package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column-level data profiling — the dataset-card / data-quality
  * summary a pipeline emits before training consumes a table: per
  * column the row count, null count, EXACT distinct count, and
  * min/max rendered to strings.
  *
  * 100 TB shape: ONE wide aggregation over ONE scan that reads
  * exactly the profiled columns (VERDICT r10 #4 — the previous
  * scan-per-column shape multiplied scan volume by the column
  * count). The distinct counts are per-column DISTINCT aggregates,
  * which Catalyst plans as a single Expand (C+1 projections of the
  * same scanned batch — in-memory row replication, never a re-read)
  * feeding one partial-agg shuffle; everything after is a 1-row
  * frame unpivoted driver-free by `stack`. Exact distinct (not
  * approx) is the deliberate default — the profile is the ground
  * truth other estimates get judged against; swap
  * `approx_count_distinct` in a caller if a sketch is acceptable.
  *
  * min/max string rendering is engine-portable for integer, string,
  * and date columns ('17', 'RAIL', '1998-12-01' render identically in
  * Spark and DuckDB); floating-point columns are the caller's
  * responsibility to pre-quantize (double-to-string formatting
  * differs across engines — the micro-unit discipline used
  * everywhere else in this engine). */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    require(cols.distinct.size == cols.size, s"duplicate column in $cols")
    cols.foreach(c => require(c.matches("[A-Za-z0-9_]+"),
      s"column name must be a plain identifier, got '$c'"))
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn_$c"),
        count_distinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val one = df.select(cols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols
      .map(c => s"'$c', `__nn_$c`, `__nd_$c`, `__mn_$c`, `__mx_$c`")
      .mkString(", ")
    one.selectExpr("n_rows", s"stack(${cols.size}, $stackArgs) AS " +
        "(column_name, n_nulls, n_distinct, min_val, max_val)")
      .select(col("column_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_val"), col("max_val"))
  }

  /** Benford first-digit micro-shares, floored `log10(1 + 1/d)`,
    * d = 1..9 — pinned as integer constants so both engines compare
    * against the identical expectation (no runtime log). */
  private[graft] val BenfordMicro: Seq[Long] =
    Seq(301029L, 176091L, 124938L, 96910L, 79181L, 66946L, 57991L, 51152L, 45757L)

  /** Benford first-significant-digit audit of a POSITIVE integer
    * column (amounts in cents, counts) — the forensic-accounting
    * classic: naturally-grown magnitude data leads with 1 about 30%
    * of the time, and a flat or spiked digit histogram flags
    * synthetic or manipulated values. The first digit is the first
    * character of the decimal rendering — exact, no float log — and
    * the expected shares are the pinned [[BenfordMicro]] constants.
    * The output grid is data-independent (always 9 rows, zeros for
    * absent digits); non-positive values are excluded (Benford is
    * undefined there) but reported via `n_total` staying the sum of
    * the digit rows only.
    *
    * 100 TB shape: one map + one 9-key partial-agg shuffle; the
    * 9-row grid and 1-row total broadcast. */
  def benfordAudit(df: DataFrame, valueCol: String): DataFrame = {
    val spark = df.sparkSession
    val expect = BenfordMicro.zipWithIndex
      .map { case (m, i) => s"when ${i + 1} then ${m}L" }
      .mkString("case digit ", " ", " else 0L end")
    val counts = df.selectExpr(s"cast($valueCol as bigint) AS v")
      .filter(col("v") > 0)
      .selectExpr("cast(substring(cast(v as string), 1, 1) as bigint) AS digit")
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val grid = spark.range(1, 10).selectExpr("id AS digit")
    grid.join(counts, Seq("digit"), "left")
      .na.fill(0L, Seq("n"))
      .crossJoin(broadcast(counts.agg(sum(col("n")).as("n_total"))))
      .selectExpr("digit", "n", "n_total",
        "cast(if(n_total = 0, 0, (cast(n as decimal(38,0)) * 1000000) div n_total) as bigint) AS share_micro",
        s"$expect AS benford_micro")
      .selectExpr("digit", "n", "n_total", "share_micro", "benford_micro",
        "abs(share_micro - benford_micro) AS dev_micro")
      .orderBy(col("digit"))
  }

  /** Exact weighted median of a value column under a non-negative
    * integer weight column — the smallest value v with
    * `2·cumweight(v) ≥ total` (lower weighted median; with unit
    * weights this is the lower statistical median). Distinct-value
    * collapse + the [[graft.operators.Curate.giniExact]] value-range
    * bucket decomposition: the global inclusive cumulative weight is
    * ≤257 parallel per-bucket windows plus a broadcast offset frame,
    * never a single-partition window over the distinct-value frame.
    * Returns one row: (median_value, total_weight, cum_at_median).
    *
    * 100 TB shape: one distinct-value partial agg, one ≤257-row
    * broadcast, one bucket-partitioned window, one 1-row fold. */
  def weightedMedianExact(df: DataFrame, valueCol: String,
      weightCol: String): DataFrame = {
    val g = df.selectExpr(s"cast($valueCol as bigint) AS c",
        s"cast($weightCol as bigint) AS w")
      .groupBy(col("c")).agg(sum(col("w")).as("wv"))
    val mx = g.agg(max(col("c")).as("mx"))
    val gb = g.crossJoin(broadcast(mx))
      .withColumn("b", expr("c div greatest(1L, (mx div 256) + 1L)"))
    val bt = gb.groupBy(col("b")).agg(sum(col("wv")).as("bw"))
    val offs = bt.withColumn("off",
      coalesce(sum(col("bw")).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("b"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
        lit(0L)))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("b")).orderBy(col("c"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    gb.join(broadcast(offs.select(col("b"), col("off"))), Seq("b"))
      .withColumn("cum", col("off") + sum(col("wv")).over(win))
      .crossJoin(broadcast(gb.agg(sum(col("wv")).as("total"))))
      .filter(col("cum") * 2 >= col("total"))
      .groupBy(col("total"))
      .agg(min(col("c")).as("median_value"), min_by(col("cum"), col("c")).as("cum_at_median"))
      .selectExpr("median_value", "total AS total_weight", "cum_at_median")
  }
}
