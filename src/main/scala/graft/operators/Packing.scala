package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Token-budget sequence packing — the pre-tokenization step that
  * groups documents into fixed-token-budget training sequences
  * (context-window packing). Extension surface (no reference analog);
  * the streaming O(1)-state pass is the same shape as the reference's
  * single-pass reducer (`CassSSTableReducer.java:134-171` — bounded
  * memory regardless of group width).
  */
object Packing {

  /** Greedy in-order packing of sized items into budget-bounded bins,
    * independently per group.
    *
    * 100 TB shape: ONE hash shuffle on the group column, a spillable
    * partition-local sort, then an O(1)-state streaming pass (the
    * Compaction.merge pattern) — no per-group materialization, so
    * executor memory is bounded by the external-sort spill threshold,
    * not by group size.
    *
    * Boundary semantics (mirrored exactly by the recursive-CTE DuckDB
    * oracle in [[graft.queries.Pipeline2]]): the first item of a group
    * always opens bin 0 with fill = its size; after that an item starts
    * a new bin iff fill + size > budget (exact fit stays). An oversize
    * item (size > budget) gets a bin of its own — the F3/F4
    * oversize-valve pattern; it never blocks packing.
    *
    * @return columns (groupCol, orderCol, sizeCol, bin_id, fill_after)
    */
  def packGreedy(df: DataFrame, groupCol: String, orderCol: String,
                 sizeCol: String, budget: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // null semantics: a null SIZE packs as 0 (consumes no budget); a
    // null ORDER is an error — equal sort keys would make bin
    // assignment depend on the (unstable) tie order, and the tuple
    // encoder would NPE anyway. raise_error surfaces the contract
    // violation with a message instead of an opaque task failure.
    val prepped = df
      .select(col(groupCol).cast("string"),
        when(col(orderCol).isNull,
          expr(s"raise_error('packGreedy: null $orderCol value')").cast("long"))
          .otherwise(col(orderCol).cast("long")).as(orderCol),
        coalesce(col(sizeCol).cast("long"), lit(0L)).as(sizeCol))
      .repartition(col(groupCol))
      .sortWithinPartitions(col(groupCol), col(orderCol))
      .as[(String, Long, Long)]
    prepped.mapPartitions { it =>
      // a partition holds whole groups (hash-partitioned on group), in
      // (group, order) order — one running (bin, fill) register pair.
      // `started` guards the first row: a bare null sentinel would
      // mistake a genuine null group's first item for a continuation
      var started = false
      var g: String = null
      var bin = 0L
      var fill = 0L
      it.map { case (grp, o, n) =>
        if (!started || grp != g) { started = true; g = grp; bin = 0L; fill = n }
        else if (fill + n > budget) { bin += 1; fill = n }
        else fill += n
        (grp, o, n, bin, fill)
      }
    }.toDF(groupCol, orderCol, sizeCol, "bin_id", "fill_after")
  }
}
