package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.TextOps

/** Round-11 additions, part 22: the view-no-purchase cohort, the
  * two-categorical chi-square independence test, and the pairwise
  * source vocabulary overlap matrix.
  */
object Pipeline57 {

  def all: Seq[QueryDef] = Seq(e38, q73, t42)

  /** Weekly view-no-purchase cohort — the churn-risk complement of
    * every funnel: per ISO week, users who viewed but never
    * purchased THAT WEEK (exclusion semantics — an anti-join on the
    * weekly grain, which plain funnels cannot express), with the
    * micro share of viewers lost. Two type-filtered distinct aggs +
    * one left anti-ish join on (week, user). */
  val e38: QueryDef = QueryDef(
    "e38_view_no_purchase",
    (s, d) => {
      val ev = Tables.events(s, d)
        .selectExpr("cast(weekofyear(ts) as bigint) AS wk", "user_id AS u",
          "event_type AS et")
      val viewers = ev.filter(col("et") === "view")
        .select(col("wk"), col("u")).distinct()
      val buyers = ev.filter(col("et") === "purchase")
        .select(col("wk"), col("u")).distinct().withColumn("b", lit(1L))
      viewers.join(buyers, Seq("wk", "u"), "left")
        .selectExpr("wk", "cast(b is null as bigint) AS lost")
        .groupBy(col("wk"))
        .agg(count(lit(1)).as("n_viewers"),
          coalesce(sum(col("lost")), lit(0L)).as("n_view_only"))
        .selectExpr("wk", "n_viewers", "n_view_only",
          "cast((cast(n_view_only as decimal(38,0)) * 1000000) div n_viewers as bigint) AS lost_micro")
        .orderBy(col("wk"))
    },
    Some("""WITH ev AS (SELECT CAST(weekofyear(ts) AS BIGINT) AS wk,
               user_id AS u, event_type AS et FROM events),
      v AS (SELECT DISTINCT wk, u FROM ev WHERE et = 'view'),
      b AS (SELECT DISTINCT wk, u FROM ev WHERE et = 'purchase'),
      j AS (SELECT v.wk, CASE WHEN b.u IS NULL THEN 1 ELSE 0 END AS lost
            FROM v LEFT JOIN b ON v.wk = b.wk AND v.u = b.u)
      SELECT wk, CAST(count(*) AS BIGINT) AS n_viewers,
        CAST(COALESCE(sum(lost), 0) AS BIGINT) AS n_view_only,
        CAST((CAST(COALESCE(sum(lost), 0) AS HUGEINT) * 1000000) // count(*)
          AS BIGINT) AS lost_micro
      FROM j GROUP BY 1 ORDER BY 1"""))

  /** Two-categorical chi-square independence (status × priority over
    * orders): per cell the observed count and the micro-quantized
    * (o−e)²/e contribution (the e09 determinism contract — exact
    * BIGINT marginals, one fixed IEEE chain per cell, micro-rounded
    * before the exact-integer total). The full S×P grid including
    * empty cells (they owe their e term). */
  val q73: QueryDef = QueryDef(
    "q73_category_chi2",
    (s, d) => {
      val cells = Tables.orders(s, d)
        .groupBy(col("o_orderstatus").as("st"), col("o_orderpriority").as("pr"))
        .agg(count(lit(1)).as("o"))
      val rows = cells.groupBy(col("st")).agg(sum(col("o")).as("rt"))
      val cols = cells.groupBy(col("pr")).agg(sum(col("o")).as("ct"))
      val grand = cells.agg(sum(col("o")).as("n"))
      rows.crossJoin(cols).crossJoin(broadcast(grand))
        .join(cells, Seq("st", "pr"), "left")
        .na.fill(0L, Seq("o"))
        .selectExpr("st", "pr", "o", "rt", "ct",
          "cast(round(((cast(o as double) - cast(rt as double) * ct / n) * " +
            "(cast(o as double) - cast(rt as double) * ct / n)) / " +
            "(cast(rt as double) * ct / n) * 1000000) as bigint) AS chi2_micro")
        .orderBy(col("st"), col("pr"))
    },
    Some("""WITH cells AS (SELECT o_orderstatus AS st, o_orderpriority AS pr,
               CAST(count(*) AS BIGINT) AS o FROM orders GROUP BY 1, 2),
      r AS (SELECT st, CAST(sum(o) AS BIGINT) AS rt FROM cells GROUP BY 1),
      c AS (SELECT pr, CAST(sum(o) AS BIGINT) AS ct FROM cells GROUP BY 1),
      g AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
      grid AS (SELECT r.st, c.pr, r.rt, c.ct, g.n,
                 COALESCE(cells.o, 0) AS o
               FROM r CROSS JOIN c CROSS JOIN g
                 LEFT JOIN cells ON cells.st = r.st AND cells.pr = c.pr)
      SELECT st, pr, CAST(o AS BIGINT) AS o, rt, ct,
        CAST(round(((CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * ct / n)
          * (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * ct / n))
          / (CAST(rt AS DOUBLE) * ct / n) * 1000000) AS BIGINT) AS chi2_micro
      FROM grid ORDER BY st, pr"""))

  /** Pairwise source vocabulary overlap: the 20×19/2 source-pair
    * matrix of vocabulary Jaccard (distinct-term sets) — which
    * sources speak the same language, the input to source-level
    * clustering / mixture design. Vocab sets ride a (source, term)
    * distinct agg; the pair join fans out per TERM by the number of
    * sources sharing it (catalog-bounded). */
  val t42: QueryDef = QueryDef(
    "t42_source_vocab_jaccard",
    (s, d) => {
      val st = Tables.documents(s, d)
        .selectExpr("source", s"explode(${TextOps.tokens("text")}) AS term")
        .distinct()
      val sz = st.groupBy(col("source")).agg(count(lit(1)).as("nv"))
      val both = st.as("a").join(st.as("b"),
          col("a.term") === col("b.term") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("s1"), col("b.source").as("s2"))
        .agg(count(lit(1)).as("n_both"))
      both
        .join(sz.selectExpr("source AS s1", "nv AS n1"), Seq("s1"))
        .join(sz.selectExpr("source AS s2", "nv AS n2"), Seq("s2"))
        .selectExpr("s1", "s2", "n_both", "n1", "n2",
          "cast((cast(n_both as decimal(38,0)) * 1000000) div (n1 + n2 - n_both) as bigint) AS jaccard_micro")
        .orderBy(col("s1"), col("s2"))
    },
    Some(s"""WITH st AS (SELECT DISTINCT source, term
               FROM (SELECT source, unnest(${DuckOps.tokens("text")}) AS term
                     FROM documents)),
      sz AS (SELECT source, CAST(count(*) AS BIGINT) AS nv FROM st GROUP BY 1),
      bo AS (SELECT a.source AS s1, b.source AS s2,
                 CAST(count(*) AS BIGINT) AS n_both
               FROM st a JOIN st b
               ON a.term = b.term AND a.source < b.source GROUP BY 1, 2)
      SELECT bo.s1, bo.s2, bo.n_both, z1.nv AS n1, z2.nv AS n2,
        CAST((CAST(bo.n_both AS HUGEINT) * 1000000)
          // (z1.nv + z2.nv - bo.n_both) AS BIGINT) AS jaccard_micro
      FROM bo
        JOIN sz z1 ON bo.s1 = z1.source
        JOIN sz z2 ON bo.s2 = z2.source
      ORDER BY s1, s2"""))
}
