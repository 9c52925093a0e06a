package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Curate, TextOps}

/** Round-10 additions, part 21: split-stratification audit,
  * function-word stylometry, and dense-rank top-k with ties.
  */
object Pipeline31 {

  def all: Seq[QueryDef] = Seq(p33, t33, q60)

  /** Split-stratification audit: p19's deterministic hash split
    * crossed with source — per (split, source) the doc count and the
    * within-source share in micro units, the check that the 800/100/
    * 100 per-mille split holds inside every stratum (it does in
    * expectation; the audit shows the realized skew). Grid windows
    * only. */
  val p33: QueryDef = QueryDef(
    "p33_split_balance",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val g = Curate.hashSplit(Tables.documents(s, d), "doc_id", "graft", 800, 100)
        .join(Tables.documents(s, d).select(col("doc_id"), col("source")), Seq("doc_id"))
        .groupBy(col("split"), col("source"))
        .agg(count(lit(1)).as("n_docs"))
      g.withColumn("src_total",
          sum(col("n_docs")).over(Window.partitionBy(col("source"))))
        .selectExpr("split", "source", "n_docs",
          "(n_docs * 1000000) div src_total AS share_micro")
        .orderBy(col("split"), col("source"))
    },
    Some(s"""WITH h AS (SELECT doc_id, source,
               (((${DuckOps.strHash60("('graft:' || CAST(doc_id AS VARCHAR))")}
                 % 2147483648) * 2654435761) % 2147483648) % 1000 AS bucket
             FROM documents),
      sp AS (SELECT source,
               CASE WHEN bucket < 800 THEN 'train'
                    WHEN bucket < 900 THEN 'val' ELSE 'test' END AS split
             FROM h),
      g AS (SELECT split, source, CAST(count(*) AS BIGINT) AS n_docs
            FROM sp GROUP BY 1, 2)
      SELECT split, source, n_docs,
        (n_docs * 1000000) // CAST(sum(n_docs) OVER (PARTITION BY source)
          AS BIGINT) AS share_micro
      FROM g ORDER BY split, source"""))

  /** Function-word stylometry: each source's usage share of the 10
    * globally most frequent tokens — the fingerprint that separates
    * template-heavy sources from organic text. The global top-10 is
    * a broadcast TakeOrdered; shares are per-(source, token) micro
    * against the source's own token mass. */
  val t33: QueryDef = QueryDef(
    "t33_stylometry",
    (s, d) => {
      val tok = Tables.documents(s, d)
        .selectExpr("source", s"explode(${TextOps.tokens("text")}) AS token")
      val top = tok.groupBy(col("token")).agg(count(lit(1)).as("gn"))
        .orderBy(col("gn").desc, col("token")).limit(10)
        .select(col("token"))
      val mass = tok.groupBy(col("source")).agg(count(lit(1)).as("src_tokens"))
      tok.join(broadcast(top), Seq("token"))
        .groupBy(col("source"), col("token")).agg(count(lit(1)).as("n"))
        .join(broadcast(mass), Seq("source"))
        .selectExpr("source", "token", "n",
          "(n * 1000000) div src_tokens AS share_micro")
        .orderBy(col("source"), col("token"))
    },
    Some(s"""WITH tok AS (SELECT source, unnest(${DuckOps.tokens("text")}) AS token
               FROM documents),
      top AS (SELECT token FROM (
          SELECT token, count(*) AS gn FROM tok GROUP BY 1
          ORDER BY gn DESC, token LIMIT 10)),
      mass AS (SELECT source, CAST(count(*) AS BIGINT) AS src_tokens
               FROM tok GROUP BY 1),
      g AS (SELECT t.source, t.token, CAST(count(*) AS BIGINT) AS n
            FROM tok t JOIN top ON t.token = top.token GROUP BY 1, 2)
      SELECT g.source, g.token, g.n,
        (g.n * 1000000) // mass.src_tokens AS share_micro
      FROM g JOIN mass ON g.source = mass.source
      ORDER BY g.source, g.token"""))

  /** Dense-rank top-k WITH ties — the ranking semantics q07's
    * row_number() top-k cannot express: every order in the top 2
    * PRICE LEVELS per priority survives, ties included, so the row
    * count per group is data-dependent. */
  val q60: QueryDef = QueryDef(
    "q60_dense_topk",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val o = Tables.orders(s, d).filter(col("o_orderkey") < 4000)
        .selectExpr("o_orderkey AS okey", "o_orderpriority AS pri",
          "cast(round(o_totalprice * 100) as long) AS cents")
      o.withColumn("lvl", dense_rank().over(
          Window.partitionBy(col("pri")).orderBy(col("cents").desc)).cast("long"))
        .filter(col("lvl") <= 2)
        .select(col("pri"), col("lvl"), col("okey"), col("cents"))
        .orderBy(col("pri"), col("lvl"), col("okey"))
    },
    Some("""WITH o AS (SELECT o_orderkey AS okey, o_orderpriority AS pri,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
             FROM orders WHERE o_orderkey < 4000)
      SELECT pri, CAST(lvl AS BIGINT) AS lvl, okey, cents FROM (
        SELECT pri, okey, cents,
          dense_rank() OVER (PARTITION BY pri ORDER BY cents DESC) AS lvl
        FROM o) WHERE lvl <= 2
      ORDER BY pri, lvl, okey"""))
}
