package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Cluster, Dedup}

/** Round-10 additions, part 10: dedup-cluster size histogram,
  * code-likeness detection, exact integer distribution ranks, and
  * the user-activity histogram.
  */
object Pipeline20 {

  def all: Seq[QueryDef] = Seq(c06, t29, q52, e19)

  /** Dedup-component size histogram — the one-glance diagnostic of a
    * near-dup pass (a fat tail of giant clusters means boilerplate):
    * c01's connected components folded to (cluster_size →
    * n_clusters). Everything after the pair generator is a two-level
    * partial agg; the oracle nests c01's recursive-CC chain. */
  val c06: QueryDef = QueryDef(
    "c06_component_histogram",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = Dedup.minhashLshPairs(docs, "text", 3, 16, 4, 0.5)
        .select(col("d1"), col("d2"))
      val labels = Cluster.connectedComponents(pairs, "d1", "d2")
        .withColumnRenamed("id", "doc_id")
      docs.select(col("doc_id"))
        .join(labels, Seq("doc_id"), "left")
        .selectExpr("cast(coalesce(lbl, doc_id) as bigint) AS cluster_id")
        .groupBy(col("cluster_id")).agg(count(lit(1)).as("cluster_size"))
        .groupBy(col("cluster_size")).agg(count(lit(1)).as("n_clusters"))
        .orderBy(col("cluster_size"))
    },
    Some(s"""SELECT cluster_size, CAST(count(DISTINCT cluster_id) AS BIGINT) AS n_clusters
      FROM (${Pipeline3.c01.oracle.get}) AS c01
      GROUP BY 1 ORDER BY 1"""))

  /** Heaps'-law vocabulary growth over 3-shingle TYPES: docs in
    * 50-doc ingestion buckets; per bucket the shingle occurrences,
    * the count of never-seen-before shingle types (first-seen =
    * min doc_id — an equi-agg, not a scan-order dependency), and the
    * cumulative curves whose flattening says "this source has stopped
    * contributing novelty". Windows run over the ≤(N/50)-row bucket
    * grid only. */
  val t29: QueryDef = QueryDef(
    "t29_heaps_curve",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      import graft.operators.TextOps
      val sh = Tables.documents(s, d)
        .selectExpr("doc_id", s"${TextOps.tokens("text")} AS t")
        .selectExpr("doc_id", s"explode(${TextOps.shingles("t", 3)}) AS g")
      val tb = sh.selectExpr("doc_id div 50 AS bucket")
        .groupBy(col("bucket")).agg(count(lit(1)).as("n_occurrences"))
      val vb = sh.groupBy(col("g")).agg(min(col("doc_id")).as("fd"))
        .selectExpr("fd div 50 AS bucket")
        .groupBy(col("bucket")).agg(count(lit(1)).as("n_new_types"))
      val w = Window.orderBy(col("bucket"))
      tb.join(vb, Seq("bucket"), "left")
        .na.fill(0L, Seq("n_new_types"))
        .withColumn("cum_occurrences", sum(col("n_occurrences")).over(w))
        .withColumn("cum_types", sum(col("n_new_types")).over(w))
        .orderBy(col("bucket"))
    },
    Some(s"""WITH tk AS (SELECT doc_id, ${DuckOps.tokens("text")} AS t FROM documents),
      sh AS (SELECT doc_id, unnest(${DuckOps.shingles("t", 3)}) AS g FROM tk),
      tb AS (SELECT doc_id // 50 AS bucket, CAST(count(*) AS BIGINT) AS n_occurrences
             FROM sh GROUP BY 1),
      fs AS (SELECT g, min(doc_id) AS fd FROM sh GROUP BY 1),
      vb AS (SELECT fd // 50 AS bucket, CAST(count(*) AS BIGINT) AS n_new_types
             FROM fs GROUP BY 1)
      SELECT tb.bucket, tb.n_occurrences,
        CAST(COALESCE(vb.n_new_types, 0) AS BIGINT) AS n_new_types,
        CAST(sum(tb.n_occurrences) OVER (ORDER BY tb.bucket) AS BIGINT)
          AS cum_occurrences,
        CAST(sum(COALESCE(vb.n_new_types, 0)) OVER (ORDER BY tb.bucket) AS BIGINT)
          AS cum_types
      FROM tb LEFT JOIN vb ON tb.bucket = vb.bucket
      ORDER BY tb.bucket"""))

  /** Exact integer distribution ranks — percent_rank and cume_dist
    * re-derived from pure rank arithmetic so they hash-compare
    * (the built-ins return order-sensitive doubles):
    * `pr = (rank−1)·1e6 div (n−1)`, `cd = (rank+ties−1)·1e6 div n`.
    * Windows partition by priority — never a global sort. */
  val q52: QueryDef = QueryDef(
    "q52_exact_dist_ranks",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val o = Tables.orders(s, d).filter(col("o_orderkey") < 2000)
        .selectExpr("o_orderkey AS okey", "o_orderpriority AS pri",
          "cast(round(o_totalprice * 100) as long) AS cents")
      val byPri = Window.partitionBy(col("pri")).orderBy(col("cents"))
      val part = Window.partitionBy(col("pri"))
      val ties = Window.partitionBy(col("pri"), col("cents"))
      o.withColumn("rnk", rank().over(byPri).cast("long"))
        .withColumn("n", count(lit(1)).over(part))
        .withColumn("t", count(lit(1)).over(ties))
        .selectExpr("okey", "pri", "cents",
          "if(n = 1, 0L, ((rnk - 1) * 1000000) div (n - 1)) AS pr_micro",
          "((rnk + t - 1) * 1000000) div n AS cd_micro")
        .orderBy(col("okey"))
    },
    Some("""WITH o AS (SELECT o_orderkey AS okey, o_orderpriority AS pri,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
             FROM orders WHERE o_orderkey < 2000),
      w AS (SELECT okey, pri, cents,
              CAST(rank() OVER (PARTITION BY pri ORDER BY cents) AS BIGINT) AS rnk,
              CAST(count(*) OVER (PARTITION BY pri) AS BIGINT) AS n,
              CAST(count(*) OVER (PARTITION BY pri, cents) AS BIGINT) AS t
            FROM o)
      SELECT okey, pri, cents,
        CASE WHEN n = 1 THEN 0 ELSE ((rnk - 1) * 1000000) // (n - 1) END AS pr_micro,
        ((rnk + t - 1) * 1000000) // n AS cd_micro
      FROM w ORDER BY okey"""))

  /** User-activity histogram: events-per-user folded to
    * (n_events → n_users) — the engagement distribution at a glance.
    * Two partial aggs, nothing else. */
  val e19: QueryDef = QueryDef(
    "e19_activity_histogram",
    (s, d) => Tables.events(s, d)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
      .groupBy(col("n_events")).agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_events")),
    Some("""SELECT n_events, CAST(count(*) AS BIGINT) AS n_users FROM (
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1)
      GROUP BY 1 ORDER BY 1"""))
}
