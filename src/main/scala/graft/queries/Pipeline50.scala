package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.TextOps

/** Round-11 additions, part 15: dataset-card drift between corpus
  * slices, the exact two-sample Kolmogorov–Smirnov statistic, and
  * the vocabulary coverage curve.
  */
object Pipeline50 {

  def all: Seq[QueryDef] = Seq(p38, q68, t40)

  /** The p32 dataset card as a reusable one-row frame over an
    * arbitrary doc predicate. */
  private def card(s: SparkSession, d: String, pred: String): DataFrame =
    Tables.documents(s, d).filter(expr(pred))
      .selectExpr("source", "lang",
        "cast(size(filter(split(text, '[ ]+'), x -> x != '')) as bigint) AS n_tokens",
        s"${TextOps.strHash60(s"concat_ws(' ', ${TextOps.tokens("text")})")} AS fp")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        countDistinct(col("lang")).as("n_langs"),
        sum(col("n_tokens")).as("total_tokens"),
        countDistinct(col("fp")).as("n_unique"))
      .selectExpr("n_docs", "n_sources", "n_langs", "total_tokens",
        "(total_tokens * 1000) div n_docs AS mean_tokens_milli",
        "n_docs - n_unique AS n_dup_docs")

  private val CardMetrics = Seq("n_docs", "n_sources", "n_langs",
    "total_tokens", "mean_tokens_milli", "n_dup_docs")

  private def cardSql(pred: String): String =
    s"""SELECT CAST(count(*) AS BIGINT) AS n_docs,
        CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
        CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        (CAST(sum(n_tokens) AS BIGINT) * 1000) // CAST(count(*) AS BIGINT)
          AS mean_tokens_milli,
        CAST(count(*) - count(DISTINCT fp) AS BIGINT) AS n_dup_docs
      FROM (SELECT source, lang,
              CAST(len(list_filter(regexp_split_to_array(text, '[ ]+'),
                x -> x <> '')) AS BIGINT) AS n_tokens,
              ${DuckOps.strHash60(s"array_to_string(${DuckOps.tokens("text")}, ' ')")} AS fp
            FROM documents WHERE $pred)"""

  /** Dataset-card DRIFT between a release candidate (the pinned
    * first-half id slice) and the standing corpus: p32's card
    * computed on both, unpivoted to one row per metric with the
    * signed relative delta in micro units — the regression diff a
    * data-release review reads. Two one-row aggs + a 6-row join;
    * the stack/unpivot never touches the corpus. */
  val p38: QueryDef = QueryDef(
    "p38_card_drift",
    (s, d) => {
      // one O(1) driver scalar for the slice cut (the c01 count idiom)
      val cut = Tables.documents(s, d)
        .agg(expr("(max(doc_id) + 1) div 2").as("cut"))
        .collect().head.getLong(0)
      val stackExpr = "stack(" + CardMetrics.length + ", " +
        CardMetrics.map(m => s"'$m', $m").mkString(", ") + ") AS (metric, v)"
      val a = card(s, d, s"doc_id < $cut").selectExpr(stackExpr)
        .withColumnRenamed("v", "v_slice")
      val b = card(s, d, "true").selectExpr(stackExpr)
        .withColumnRenamed("v", "v_full")
      a.join(b, Seq("metric"))
        .selectExpr("metric", "v_slice", "v_full",
          "if(v_full = 0, 0L, cast(((cast(v_slice as decimal(38,0)) - v_full) * 1000000) div v_full as bigint)) AS rel_delta_micro")
        .orderBy(col("metric"))
    },
    Some {
      val m = CardMetrics.map(x =>
        s"SELECT '$x' AS metric, a.$x AS v_slice, b.$x AS v_full FROM a, b")
        .mkString("\n        UNION ALL ")
      s"""WITH cut AS (SELECT (max(doc_id) + 1) // 2 AS c FROM documents),
      a AS (${cardSql("doc_id < (SELECT c FROM cut)")}),
      b AS (${cardSql("TRUE")}),
      u AS ($m)
      SELECT metric, CAST(v_slice AS BIGINT) AS v_slice,
        CAST(v_full AS BIGINT) AS v_full,
        CAST(CASE WHEN v_full = 0 THEN 0
          ELSE ((CAST(v_slice AS HUGEINT) - v_full) * 1000000) // v_full
          END AS BIGINT) AS rel_delta_micro
      FROM u ORDER BY metric"""
    })

  /** EXACT two-sample Kolmogorov–Smirnov statistic between the
    * purchase and click value distributions (cents): the sup-norm
    * gap of the two empirical CDFs, computed entirely in integers —
    * D = max_v |c1(v)·n2 − c2(v)·n1| / (n1·n2), evaluated on the
    * merged support via one cumulative window, with the argmax value
    * (smallest cents among maximizers) reported. No p-value (that
    * needs the asymptotic distribution — a table lookup the caller
    * applies); the STATISTIC is the engine's job and it is exact.
    * One partial agg to the distinct-value grid, one window, one
    * fold. */
  val q68: QueryDef = QueryDef(
    "q68_ks_two_sample",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val v = Tables.events(s, d)
        .filter(col("event_type").isin("purchase", "click"))
        .selectExpr("event_type AS t", "cast(round(value * 100) as long) AS cents")
      val g = v.groupBy(col("cents"))
        .agg(coalesce(sum(expr("cast(t = 'purchase' as bigint)")), lit(0L)).as("a_n"),
          coalesce(sum(expr("cast(t = 'click' as bigint)")), lit(0L)).as("b_n"))
      val w = Window.orderBy(col("cents"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      g.withColumn("c1", sum(col("a_n")).over(w))
        .withColumn("c2", sum(col("b_n")).over(w))
        .crossJoin(broadcast(v.agg(
          coalesce(sum(expr("cast(t = 'purchase' as bigint)")), lit(0L)).as("n1"),
          coalesce(sum(expr("cast(t = 'click' as bigint)")), lit(0L)).as("n2"))))
        .selectExpr("n1", "n2", "cents",
          "abs(cast(c1 as decimal(38,0)) * n2 - cast(c2 as decimal(38,0)) * n1) AS term")
        .groupBy(col("n1"), col("n2"))
        .agg(max(struct(col("term"), (-col("cents")).as("nc"))).as("m"))
        .selectExpr("n1", "n2",
          "cast((m.term * 1000000) div (cast(n1 as decimal(38,0)) * n2) as bigint) AS ks_micro",
          "-m.nc AS ks_at_cents")
    },
    Some("""WITH v AS (SELECT event_type AS t,
               CAST(round(value * 100) AS BIGINT) AS cents FROM events
             WHERE event_type IN ('purchase', 'click')),
      n AS (SELECT CAST(sum(CASE WHEN t = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
              CAST(sum(CASE WHEN t = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n2
            FROM v),
      g AS (SELECT cents,
              CAST(sum(CASE WHEN t = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS a_n,
              CAST(sum(CASE WHEN t = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS b_n
            FROM v GROUP BY 1),
      c AS (SELECT cents,
              sum(a_n) OVER (ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW) AS c1,
              sum(b_n) OVER (ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING
                AND CURRENT ROW) AS c2
            FROM g),
      t AS (SELECT cents,
              abs(CAST(c1 AS HUGEINT) * n.n2 - CAST(c2 AS HUGEINT) * n.n1) AS term,
              n.n1, n.n2
            FROM c, n),
      m AS (SELECT n1, n2, max({'term': term, 'nc': -cents}) AS mx
            FROM t GROUP BY 1, 2)
      SELECT n1, n2,
        CAST((mx.term * 1000000) // (CAST(n1 AS HUGEINT) * n2) AS BIGINT) AS ks_micro,
        CAST(-mx.nc AS BIGINT) AS ks_at_cents
      FROM m"""))

  /** Vocabulary coverage curve: the share of corpus token
    * OCCURRENCES covered by the top-K most frequent types, at
    * K = 10 / 20 / 30 — the number that sizes a closed vocabulary
    * (t28's Zipf head and t36's postings mass read shape; this reads
    * budget). Ranking ties break by term (pinned total order). One
    * term agg + a tiny window over the vocabulary. */
  val t40: QueryDef = QueryDef(
    "t40_vocab_coverage",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val tf = Tables.documents(s, d)
        .selectExpr(s"explode(${TextOps.tokens("text")}) AS term")
        .groupBy(col("term")).agg(count(lit(1)).as("n"))
      val ranked = tf.withColumn("rk", row_number().over(
          Window.orderBy(col("n").desc, col("term").asc)))
        .crossJoin(broadcast(tf.agg(sum(col("n")).as("total"))))
      ranked.selectExpr("explode(array(10, 20, 30)) AS k", "rk", "n", "total")
        .filter(col("rk") <= col("k"))
        .groupBy(col("k"), col("total"))
        .agg(sum(col("n")).as("covered"), count(lit(1)).as("n_types"))
        .selectExpr("cast(k as bigint) AS k", "n_types", "covered", "total",
          "cast((cast(covered as decimal(38,0)) * 1000000) div total as bigint) AS coverage_micro")
        .orderBy(col("k"))
    },
    Some(s"""WITH tf AS (SELECT term, CAST(count(*) AS BIGINT) AS n
               FROM (SELECT unnest(${DuckOps.tokens("text")}) AS term
                     FROM documents) GROUP BY 1),
      r AS (SELECT term, n, row_number() OVER (ORDER BY n DESC, term) AS rk
            FROM tf),
      tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM tf),
      x AS (SELECT k, rk, n, total
            FROM r, tot, unnest([10, 20, 30]) AS u(k)
            WHERE rk <= k)
      SELECT CAST(k AS BIGINT) AS k, CAST(count(*) AS BIGINT) AS n_types,
        CAST(sum(n) AS BIGINT) AS covered, total,
        CAST((CAST(sum(n) AS HUGEINT) * 1000000) // total AS BIGINT)
          AS coverage_micro
      FROM x GROUP BY 1, 4 ORDER BY 1"""))
}
