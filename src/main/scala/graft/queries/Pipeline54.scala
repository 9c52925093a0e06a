package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.TextOps

/** Round-11 additions, part 19: deterministic epoch shuffling and
  * order-value reconciliation. (cass_compaction_mixed, the third
  * part-19 line, lives with the cass_* family in SparkEntry.)
  */
object Pipeline54 {

  def all: Seq[QueryDef] = Seq(p41, q71)

  /** Deterministic per-epoch data-loader shuffle: each epoch orders
    * the corpus by the TWO-LEVEL salted hash
    * `h('e<epoch>:' || h(doc_id))` — a full reshuffle per epoch with
    * ZERO RNG state, reproducible on any cluster size, join-stable
    * (the property distributed training needs: every worker derives
    * the same order). Two levels are LOAD-BEARING: a polynomial hash
    * of `'epoch<e>:' || doc_id` is order-DEGENERATE — changing one
    * early character shifts every equal-length string's hash by the
    * SAME constant mod P, so "different" epochs preserve relative
    * order (caught live by the part-19 permutation audit: all three
    * epochs emitted 100..109). Stringifying the inner hash first
    * varies length and every digit, breaking the affine structure.
    * Emitted as each of 3 epochs' first 10 docs (the TakeOrdered
    * head; the full order is the sort key itself). */
  val p41: QueryDef = QueryDef(
    "p41_epoch_shuffle",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val inner = TextOps.strHash60("cast(doc_id as string)")
      Tables.documents(s, d)
        .selectExpr("doc_id", "explode(array(0, 1, 2)) AS epoch")
        .selectExpr("epoch", "doc_id",
          s"${TextOps.strHash60(s"concat('e', cast(epoch as string), ':', cast($inner as string))")} AS h")
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("epoch")).orderBy(col("h"), col("doc_id"))))
        .filter(col("rank") <= 10)
        .selectExpr("cast(epoch as bigint) AS epoch", "cast(rank as bigint) AS rank",
          "doc_id")
        .orderBy(col("epoch"), col("rank"))
    },
    Some {
      val inner = DuckOps.strHash60("CAST(doc_id AS VARCHAR)")
      s"""WITH x AS (SELECT epoch, doc_id,
               ${DuckOps.strHash60(s"('e' || CAST(epoch AS VARCHAR) || ':' || CAST($inner AS VARCHAR))")} AS h
             FROM documents, unnest([0, 1, 2]) AS t(epoch)),
      r AS (SELECT epoch, doc_id,
              row_number() OVER (PARTITION BY epoch ORDER BY h, doc_id) AS rank
            FROM x)
      SELECT CAST(epoch AS BIGINT) AS epoch, CAST(rank AS BIGINT) AS rank, doc_id
      FROM r WHERE rank <= 10 ORDER BY epoch, rank"""
    })

  /** Order-value reconciliation — the bank-rec primitive: each
    * order's header total vs the exact per-line recomputation
    * Σ round(extprice·(1−disc)·(1+tax)·100) (one IEEE chain per row,
    * then exact integer sums), matched at a 1% relative tolerance,
    * with the orphan count (orders with no lines) and the worst
    * absolute gap. On this synthetic corpus the header totals are
    * generator-independent of the lines — the audit REPORTS that
    * (match rate ~0) rather than assuming consistency, which is
    * exactly what a reconciliation job is for. One join keyed by
    * order + one fold. */
  val q71: QueryDef = QueryDef(
    "q71_order_reconciliation",
    (s, d) => {
      val l = Tables.lineitem(s, d)
        .selectExpr("l_orderkey AS k",
          "cast(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) as long) AS c")
        .groupBy(col("k")).agg(sum(col("c")).as("t_cents"))
      Tables.orders(s, d)
        .selectExpr("o_orderkey AS k", "cast(round(o_totalprice * 100) as long) AS o_cents")
        .join(l, Seq("k"), "left")
        .selectExpr("o_cents", "t_cents",
          "cast(t_cents is null as bigint) AS no_lines",
          "if(t_cents is null, 0L, cast(abs(t_cents - o_cents) * 100 <= o_cents as bigint)) AS ok",
          "if(t_cents is null, 0L, abs(t_cents - o_cents)) AS ad")
        .agg(count(lit(1)).as("n_orders"),
          coalesce(sum(col("no_lines")), lit(0L)).as("n_no_lines"),
          coalesce(sum(col("ok")), lit(0L)).as("n_matched_1pct"),
          max(col("ad")).as("max_abs_diff_cents"))
        .selectExpr("n_orders", "n_no_lines", "n_matched_1pct",
          "cast((cast(n_matched_1pct as decimal(38,0)) * 1000000) div (n_orders - n_no_lines) as bigint) AS match_micro",
          "max_abs_diff_cents")
    },
    Some("""WITH l AS (SELECT l_orderkey AS k,
               CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                 * (1 + l_tax) * 100) AS BIGINT)) AS BIGINT) AS t_cents
             FROM lineitem GROUP BY 1),
      j AS (SELECT CAST(round(o.o_totalprice * 100) AS BIGINT) AS o_cents,
              l.t_cents
            FROM orders o LEFT JOIN l ON o.o_orderkey = l.k),
      m AS (SELECT CAST(count(*) AS BIGINT) AS n_orders,
              CAST(COALESCE(sum(CASE WHEN t_cents IS NULL THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS n_no_lines,
              CAST(COALESCE(sum(CASE WHEN t_cents IS NOT NULL
                AND abs(t_cents - o_cents) * 100 <= o_cents THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS n_matched_1pct,
              CAST(max(CASE WHEN t_cents IS NULL THEN 0
                ELSE abs(t_cents - o_cents) END) AS BIGINT) AS max_abs_diff_cents
            FROM j)
      SELECT n_orders, n_no_lines, n_matched_1pct,
        CAST((CAST(n_matched_1pct AS HUGEINT) * 1000000)
          // (n_orders - n_no_lines) AS BIGINT) AS match_micro,
        max_abs_diff_cents
      FROM m"""))
}
