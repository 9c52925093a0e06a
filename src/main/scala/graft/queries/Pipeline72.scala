package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Round-11 additions, part 37: the directed dyad census
  * (Holland–Leinhardt) and midrank Spearman correlation through the
  * collapsed-rank machinery.
  */
object Pipeline72 {

  def all: Seq[QueryDef] = Seq(c16, q82)

  /** Directed dyad census + reciprocity of the event-type transition
    * graph — the Holland–Leinhardt M/A/N counts (mutual dyads: both
    * directions present; asymmetric: exactly one; null: neither) and
    * the classic reciprocity `r = reciprocated edges ∕ edges`. One
    * self semi-join on the reversed edge list over the
    * vocabulary-sized distinct edges; everything else is 1-row
    * folds. On this corpus the transition graph is complete, so the
    * census says exactly that (all dyads mutual, reciprocity 1e6) —
    * the statistic is the audit, the corpus is the baseline. */
  val c16: QueryDef = QueryDef(
    "c16_dyad_census",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val ed = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("s"))
        .withColumn("t", lead(col("s"), 1).over(w))
        .filter(col("t").isNotNull && col("s") =!= col("t"))
        .select(col("s"), col("t")).distinct()
      val nodes = ed.select(col("s").as("n"))
        .unionByName(ed.select(col("t").as("n"))).distinct()
        .agg(count(lit(1)).as("n_nodes"))
      val und = ed.selectExpr("least(s, t) AS a", "greatest(s, t) AS b")
        .distinct().agg(count(lit(1)).as("p"))
      val rec = ed.join(ed.selectExpr("t AS s", "s AS t"), Seq("s", "t"),
        "left_semi").agg(count(lit(1)).as("r"))
      val tot = ed.agg(count(lit(1)).as("n_edges"))
      nodes.crossJoin(broadcast(tot)).crossJoin(broadcast(und))
        .crossJoin(broadcast(rec))
        .selectExpr("n_nodes", "n_edges",
          "r div 2 AS mutual_dyads",
          "p - r div 2 AS asym_dyads",
          "n_nodes * (n_nodes - 1) div 2 - p AS null_dyads",
          "if(n_edges = 0, 0L, (r * 1000000) div n_edges) AS reciprocity_micro")
    },
    Some("""WITH ed AS (SELECT DISTINCT s, t FROM (
        SELECT event_type AS s,
          lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t
        FROM events) WHERE t IS NOT NULL AND s <> t),
      nodes AS (SELECT DISTINCT n FROM
        (SELECT s AS n FROM ed UNION ALL SELECT t AS n FROM ed)),
      und AS (SELECT DISTINCT LEAST(s, t) AS a, GREATEST(s, t) AS b FROM ed),
      rec AS (SELECT count(*) AS r FROM ed e1 WHERE EXISTS (
          SELECT 1 FROM ed e2 WHERE e2.s = e1.t AND e2.t = e1.s)),
      m AS (SELECT CAST((SELECT count(*) FROM nodes) AS BIGINT) AS n_nodes,
              CAST((SELECT count(*) FROM ed) AS BIGINT) AS n_edges,
              CAST((SELECT count(*) FROM und) AS BIGINT) AS p,
              CAST((SELECT r FROM rec) AS BIGINT) AS r)
      SELECT n_nodes, n_edges, r // 2 AS mutual_dyads,
        p - r // 2 AS asym_dyads,
        n_nodes * (n_nodes - 1) // 2 - p AS null_dyads,
        CAST(CASE WHEN n_edges = 0 THEN 0
          ELSE (r * 1000000) // n_edges END AS BIGINT) AS reciprocity_micro
      FROM m"""))

  /** Midrank Spearman correlation between line-item quantity and
    * price cents — monotone association where Pearson's squares
    * overflow any fixed width. Average ranks ride the DOUBLED-rank
    * trick (`2·before + cnt + 1` per distinct value — an integer
    * even when the midrank is a half), each rank map is a collapsed
    * distinct-value frame joined back by value, and the classic
    * `1 − 6Σδ²/(n(n²−1))` is evaluated on doubled ranks as
    * `1e6 − 6·Σd²·1e6 div (4n(n²−1))` — the UNCORRECTED midrank
    * variant (ties present, so this is the pinned definition, not
    * tie-corrected Pearson-on-ranks; both engines replay it
    * verbatim). `mean_d2` is reported instead of raw Σd², which
    * would overflow BIGINT beyond ~1.3M rows; the internal chain
    * rides decimal(38,0)/HUGEINT and holds to ~1e9 rows.
    *
    * 100 TB shape: two distinct-value partial aggs (the rank maps),
    * two value-keyed equi-joins back onto the scan, one 1-row fold —
    * no per-row window, no global sort. */
  val q82: QueryDef = QueryDef(
    "q82_spearman",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val v = Tables.lineitem(s, d).selectExpr(
        "cast(round(l_quantity) as bigint) AS x",
        "cast(round(l_extendedprice * 100) as bigint) AS y")
      // the q76 value-range bucket decomposition — the exclusive
      // cumcount over the distinct-value frame never rides a
      // single-partition window (price cents has a large domain)
      def rankMap(df: org.apache.spark.sql.DataFrame, c: String) =
        graft.operators.Curate.bucketedCumsum(
            df.groupBy(col(c)).agg(count(lit(1)).as("cnt")), c, "cnt")
          .selectExpr(c, s"2 * before + cnt + 1 AS r2$c")
      v.join(rankMap(v, "x"), Seq("x"))
        .join(rankMap(v, "y"), Seq("y"))
        .agg(count(lit(1)).as("n"),
          sum(expr("cast(r2x - r2y as decimal(38,0)) * (r2x - r2y)")).as("d2"))
        .selectExpr("n AS n_rows", "cast(d2 div n as bigint) AS mean_d2",
          "cast(1000000 - (6 * d2 * 1000000)" +
            " div (4 * cast(n as decimal(38,0)) * (cast(n as decimal(38,0)) * n - 1))" +
            " as bigint) AS spearman_micro")
    },
    Some("""WITH v AS (SELECT CAST(round(l_quantity) AS BIGINT) AS x,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS y FROM lineitem),
      gx AS (SELECT x, CAST(count(*) AS BIGINT) AS cnt FROM v GROUP BY 1),
      rx AS (SELECT x, 2 * COALESCE(CAST(sum(cnt) OVER (ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
               + cnt + 1 AS r2x FROM gx),
      gy AS (SELECT y, CAST(count(*) AS BIGINT) AS cnt FROM v GROUP BY 1),
      ry AS (SELECT y, 2 * COALESCE(CAST(sum(cnt) OVER (ORDER BY y
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
               + cnt + 1 AS r2y FROM gy),
      j AS (SELECT rx.r2x, ry.r2y FROM v JOIN rx ON v.x = rx.x
            JOIN ry ON v.y = ry.y),
      s AS (SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(sum(CAST((r2x - r2y) AS HUGEINT) * (r2x - r2y)) AS HUGEINT)
                AS d2 FROM j)
      SELECT n AS n_rows, CAST(d2 // n AS BIGINT) AS mean_d2,
        CAST(1000000 - (6 * d2 * 1000000)
          // (4 * CAST(n AS HUGEINT) * (CAST(n AS HUGEINT) * n - 1)) AS BIGINT)
          AS spearman_micro
      FROM s"""))
}
