package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column-level data profiling — the dataset-card / data-quality
  * summary a pipeline emits before training consumes a table: per
  * column the row count, null count, EXACT distinct count, and
  * min/max rendered to strings.
  *
  * 100 TB shape: one 1-row aggregation per profiled column, each over
  * a projection of ONLY that column — Parquet scans prune to a single
  * column per member (PlanAuditSpec asserts the pruned ReadSchema),
  * the members are independent (schedule in parallel), and each
  * member is a partial-agg shuffle to one row. Column list is the
  * caller's driver-side constant. Exact distinct (not approx) is the
  * deliberate default — the profile is the ground truth other
  * estimates get judged against; swap `approx_count_distinct` in a
  * caller if a sketch is acceptable.
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
    cols.map { c =>
      df.select(col(c))
        .agg(
          count(lit(1)).as("n_rows"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_nulls"),
          count_distinct(col(c)).as("n_distinct"),
          min(col(c)).cast("string").as("min_val"),
          max(col(c)).cast("string").as("max_val"))
        .selectExpr(s"'$c' AS column_name", "n_rows", "n_nulls", "n_distinct",
          "min_val", "max_val")
    }.reduce(_ unionByName _)
  }
}
