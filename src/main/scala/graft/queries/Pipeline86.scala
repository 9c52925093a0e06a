package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.TextOps

/** Round-11 additions, part 51: cross-tier duplicate-flag agreement
  * (exact-text vs prefix-fingerprint dup universes) and the quartile
  * coefficient of dispersion closing the robust-spread family.
  */
object Pipeline86 {

  def all: Seq[QueryDef] = Seq(d28, q92)

  /** Dup-tier overlap: a doc is EXACT-dup if its full-text hash
    * repeats (d01's universe) and PREFIX-dup if its 40-token-prefix
    * hash repeats (d27/p45/c17's universe); this audit counts both
    * flag sets and their agreement — exact ⊆ prefix is NOT an
    * invariant (two docs can share all of a short text yet diverge
    * past token 40 — contract: exact dup implies prefix dup only
    * when texts are ≥40 tokens or equal), so the Jaccard of the two
    * sets is a real measurement, the one-glance number that says
    * which dedup tier is doing the work.
    *
    * 100 TB shape: one tokenize pass computing both hashes, two
    * fingerprint partial aggs, two flag joins back by doc, one 1-row
    * fold. */
  val d28: QueryDef = QueryDef(
    "d28_dup_tier_overlap",
    (s, d) => {
      val base = Tables.documents(s, d)
        .selectExpr("doc_id", s"${TextOps.strHash60("text")} AS fx",
          s"${TextOps.tokens("text")} AS t")
        .selectExpr("doc_id", "fx",
          s"${TextOps.strHash60("concat_ws(' ', slice(t, 1, 40))")} AS fp")
      def dupFlags(c: String, out: String) = base.groupBy(col(c))
        .agg(count(lit(1)).as("sz")).filter(col("sz") > 1)
        .select(col(c)).withColumn(out, lit(1L))
      base
        .join(dupFlags("fx", "ex"), Seq("fx"), "left")
        .join(dupFlags("fp", "pf"), Seq("fp"), "left")
        .selectExpr("coalesce(ex, 0L) AS ex", "coalesce(pf, 0L) AS pf")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("ex")).as("n_exact_dup"),
          sum(col("pf")).as("n_prefix_dup"),
          sum(expr("ex * pf")).as("n_both"))
        .selectExpr("n_docs", "n_exact_dup", "n_prefix_dup", "n_both",
          "cast(if(n_exact_dup + n_prefix_dup - n_both = 0, 0," +
            " (cast(n_both as decimal(38,0)) * 1000000)" +
            " div (n_exact_dup + n_prefix_dup - n_both)) as bigint)" +
            " AS tier_jaccard_micro")
    },
    Some(s"""WITH tk AS (SELECT doc_id, text, ${DuckOps.tokens("text")} AS t
               FROM documents),
      b AS (SELECT doc_id, ${DuckOps.strHash60("text")} AS fx,
              ${DuckOps.strHash60("array_to_string(t[1:40], ' ')")} AS fp
            FROM tk),
      gx AS (SELECT fx FROM b GROUP BY fx HAVING count(*) > 1),
      gp AS (SELECT fp FROM b GROUP BY fp HAVING count(*) > 1),
      m AS (SELECT CASE WHEN gx.fx IS NULL THEN 0 ELSE 1 END AS ex,
              CASE WHEN gp.fp IS NULL THEN 0 ELSE 1 END AS pf
            FROM b LEFT JOIN gx ON b.fx = gx.fx LEFT JOIN gp ON b.fp = gp.fp),
      a AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(ex) AS BIGINT) AS n_exact_dup,
              CAST(sum(pf) AS BIGINT) AS n_prefix_dup,
              CAST(sum(ex * pf) AS BIGINT) AS n_both
            FROM m)
      SELECT n_docs, n_exact_dup, n_prefix_dup, n_both,
        CAST(CASE WHEN n_exact_dup + n_prefix_dup - n_both = 0 THEN 0
          ELSE (CAST(n_both AS HUGEINT) * 1000000)
            // (n_exact_dup + n_prefix_dup - n_both) END AS BIGINT)
          AS tier_jaccard_micro
      FROM a"""))

  /** Quartile coefficient of dispersion of order values:
    * `(Q3 − Q1) ∕ (Q3 + Q1)` in micro units — the scale-free robust
    * spread beside q91's skewness (same three-rank lookup, one
    * bucketed cumsum) and q69's MAD (which is absolute, not
    * relative). */
  val q92: QueryDef = QueryDef(
    "q92_quartile_dispersion",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val v = Tables.orders(s, d)
        .selectExpr("cast(round(o_totalprice * 100) as bigint) AS c")
      val g = v.groupBy(col("c")).agg(count(lit(1)).as("cnt"))
      val gb = g.crossJoin(broadcast(g.agg(max(col("c")).as("mx"))))
        .withColumn("b", expr("c div greatest(1L, (mx div 256) + 1L)"))
      val offs = gb.groupBy(col("b")).agg(sum(col("cnt")).as("bcnt"))
        .withColumn("off", coalesce(sum(col("bcnt")).over(
          Window.orderBy(col("b")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      val win = Window.partitionBy(col("b")).orderBy(col("c"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val cum = gb.join(broadcast(offs.select(col("b"), col("off"))), Seq("b"))
        .withColumn("before",
          col("off") + coalesce(sum(col("cnt")).over(win), lit(0L)))
      val tot = v.agg(count(lit(1)).as("n"))
      val ps = s.range(0, 2).selectExpr(
        "element_at(array(25L, 75L), cast(id as int) + 1) AS p")
      broadcast(ps.crossJoin(broadcast(tot))
          .selectExpr("p", "n", "(p * n + 99) div 100 AS rk"))
        .join(cum, col("before") < col("rk") &&
          col("before") + col("cnt") >= col("rk"))
        .groupBy(col("n"))
        .agg(max(when(col("p") === 25, col("c"))).as("q1"),
          max(when(col("p") === 75, col("c"))).as("q3"))
        .selectExpr("n AS n_rows", "q1", "q3",
          "cast(if(q3 + q1 = 0, 0L," +
            " (cast(q3 - q1 as decimal(38,0)) * 1000000) div (q3 + q1))" +
            " as bigint) AS qcd_micro")
    },
    Some("""WITH v AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c
               FROM orders),
      g AS (SELECT c, CAST(count(*) AS BIGINT) AS cnt FROM v GROUP BY 1),
      cum AS (SELECT c, cnt,
          COALESCE(CAST(sum(cnt) OVER (ORDER BY c
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
            AS before
        FROM g),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
      pk AS (SELECT p, n, (p * n + 99) // 100 AS rk
             FROM (SELECT unnest([25, 75]::BIGINT[]) AS p), tot),
      lk AS (SELECT p, n, c FROM pk JOIN cum
             ON before < rk AND before + cnt >= rk)
      SELECT n AS n_rows,
        max(CASE WHEN p = 25 THEN c END) AS q1,
        max(CASE WHEN p = 75 THEN c END) AS q3,
        CAST(CASE WHEN max(CASE WHEN p = 75 THEN c END)
            + max(CASE WHEN p = 25 THEN c END) = 0 THEN 0
          ELSE (CAST(max(CASE WHEN p = 75 THEN c END)
            - max(CASE WHEN p = 25 THEN c END) AS HUGEINT) * 1000000)
            // (max(CASE WHEN p = 75 THEN c END)
               + max(CASE WHEN p = 25 THEN c END))
          END AS BIGINT) AS qcd_micro
      FROM lk GROUP BY n"""))
}
