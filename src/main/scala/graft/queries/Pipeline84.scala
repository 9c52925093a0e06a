package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.TextOps

/** Round-11 additions, part 49: Bowley quartile skewness (the robust
  * third-moment face of the rank family) and per-source sentence
  * medians (t46's corpus statistic made a per-source policy input).
  */
object Pipeline84 {

  def all: Seq[QueryDef] = Seq(q91, t47)

  /** Bowley (quartile) skewness of line-item price cents:
    * `(Q3 + Q1 − 2·median) ∕ (Q3 − Q1)` in micro units — the robust
    * skewness that ignores tails entirely (q70's exact-moment
    * skewness is the classical face; this is the order-statistics
    * face). All three quartiles are type-1 discrete ranks
    * (`⌈p·n⌉`, the t46 definition) read from ONE bucketed cumsum via
    * a 3-row broadcast rank lookup; ties make the denominator zero
    * on degenerate corpora, pinned to 0.
    *
    * 100 TB shape: one distinct-value partial agg, one bucketed
    * window, broadcast-only lookups. */
  val q91: QueryDef = QueryDef(
    "q91_bowley_skewness",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val v = Tables.lineitem(s, d)
        .selectExpr("cast(round(l_extendedprice * 100) as bigint) AS c")
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
      val ps = s.range(0, 3).selectExpr(
        "element_at(array(25L, 50L, 75L), cast(id as int) + 1) AS p")
      broadcast(ps.crossJoin(broadcast(tot))
          .selectExpr("p", "n", "(p * n + 99) div 100 AS rk"))
        .join(cum, col("before") < col("rk") &&
          col("before") + col("cnt") >= col("rk"))
        .groupBy(col("n"))
        .agg(max(when(col("p") === 25, col("c"))).as("q1"),
          max(when(col("p") === 50, col("c"))).as("q2"),
          max(when(col("p") === 75, col("c"))).as("q3"))
        .selectExpr("n AS n_rows", "q1", "q2", "q3",
          "cast(if(q3 = q1, 0L," +
            " (cast(q3 + q1 - 2 * q2 as decimal(38,0)) * 1000000)" +
            " div (q3 - q1)) as bigint) AS bowley_micro")
    },
    Some("""WITH v AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS c
               FROM lineitem),
      g AS (SELECT c, CAST(count(*) AS BIGINT) AS cnt FROM v GROUP BY 1),
      cum AS (SELECT c, cnt,
          COALESCE(CAST(sum(cnt) OVER (ORDER BY c
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
            AS before
        FROM g),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
      pk AS (SELECT p, n, (p * n + 99) // 100 AS rk
             FROM (SELECT unnest([25, 50, 75]::BIGINT[]) AS p), tot),
      lk AS (SELECT p, n, c FROM pk JOIN cum
             ON before < rk AND before + cnt >= rk)
      SELECT n AS n_rows,
        max(CASE WHEN p = 25 THEN c END) AS q1,
        max(CASE WHEN p = 50 THEN c END) AS q2,
        max(CASE WHEN p = 75 THEN c END) AS q3,
        CAST(CASE WHEN max(CASE WHEN p = 75 THEN c END)
            = max(CASE WHEN p = 25 THEN c END) THEN 0
          ELSE (CAST(max(CASE WHEN p = 75 THEN c END)
            + max(CASE WHEN p = 25 THEN c END)
            - 2 * max(CASE WHEN p = 50 THEN c END) AS HUGEINT) * 1000000)
            // (max(CASE WHEN p = 75 THEN c END)
               - max(CASE WHEN p = 25 THEN c END))
          END AS BIGINT) AS bowley_micro
      FROM lk GROUP BY n"""))

  /** Per-source sentence-length median: t46's corpus quantiles made
    * a per-source policy input (which sources need aggressive
    * chunking), riding [[Pipeline81.groupedMedian]] with source as
    * the group key — exact lower medians, no per-group sort.
    *
    * 100 TB shape: one explode+tokenize pass into a (source, len)
    * partial agg, grouped bucketed windows over the collapsed
    * frame. */
  val t47: QueryDef = QueryDef(
    "t47_source_sentence_median",
    (s, d) => {
      val lens = Tables.documents(s, d)
        .selectExpr("source AS g", "explode(split(text, '[.!?]+')) AS sent")
        .selectExpr("g", s"cast(size(${TextOps.tokens("sent")}) as bigint) AS c")
        .filter(col("c") > 0)
      val med = Pipeline81.groupedMedian(lens)
      lens.groupBy(col("g")).agg(count(lit(1)).as("n_sentences"))
        .join(med, Seq("g"))
        .selectExpr("g AS source", "n_sentences", "med AS median_len")
        .orderBy(col("source"))
    },
    Some("""WITH sent AS (SELECT source AS g,
               unnest(regexp_split_to_array(text, '[.!?]+')) AS s
             FROM documents),
      lens AS (SELECT g, CAST(len(list_filter(
                 regexp_split_to_array(lower(s), '[^a-z0-9]+'), x -> x <> ''))
                 AS BIGINT) AS c
               FROM sent),
      lf AS (SELECT g, c FROM lens WHERE c > 0),
      g1 AS (SELECT g, c, CAST(count(*) AS BIGINT) AS cnt FROM lf GROUP BY 1, 2),
      med AS (SELECT g, c AS med FROM (
          SELECT g, c, cnt,
            COALESCE(CAST(sum(cnt) OVER (PARTITION BY g ORDER BY c
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
              AS before,
            CAST(sum(cnt) OVER (PARTITION BY g) AS BIGINT) AS n
          FROM g1)
        WHERE before < (n + 1) // 2 AND before + cnt >= (n + 1) // 2),
      cn AS (SELECT g, CAST(count(*) AS BIGINT) AS n_sentences
             FROM lf GROUP BY 1)
      SELECT cn.g AS source, cn.n_sentences, med.med AS median_len
      FROM cn JOIN med ON cn.g = med.g
      ORDER BY source"""))
}
