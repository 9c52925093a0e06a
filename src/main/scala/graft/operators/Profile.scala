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
}
