package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Dedup, Events, TextOps}

/** Round-11 additions, part 16: the Markov stationary distribution
  * of the event-type chain, budget apportionment driven by the
  * post-dedup mixture, and Church–Gale term burstiness.
  */
object Pipeline51 {

  def all: Seq[QueryDef] = Seq(e35, p39, t41)

  private val Steps = 8 // unrolled power-iteration rounds for e35

  /** Stationary distribution of the user-journey Markov chain
    * (e08's transition matrix power-iterated): where does a long
    * session END UP spending its time — the c02 PageRank idea on
    * the behavioral graph. Exact integer semantics, pinned: uniform
    * floor start 1e6 div k; each step's mass at t is
    * (Σ_s d_s·P_st) div 1e6 (one floor per target, order-free exact
    * integer sum); mass at types with no outgoing transitions is
    * dropped (the dangling rule — explicit, replayable); 8 unrolled
    * steps so the oracle replays the loop as CTEs. Every frame is
    * T×T — catalog-sized; the corpus is touched once by the lag
    * window. */
  val e35: QueryDef = QueryDef(
    "e35_markov_stationary",
    (s, d) => {
      val tm = Events.transitionMatrix(Tables.events(s, d), "event_type",
          "user_id", "ts", "event_id")
        .select(col("from_type"), col("to_type"), col("p_micro"))
      val types = tm.select(col("from_type").as("t"))
        .union(tm.select(col("to_type").as("t"))).distinct()
      val k = types.agg(count(lit(1)).as("k"))
      var dist = types.crossJoin(broadcast(k))
        .selectExpr("t", "1000000L div k AS m")
      (1 to Steps).foreach { _ =>
        dist = dist.join(tm, dist("t") === tm("from_type"))
          .groupBy(col("to_type"))
          .agg(expr("cast(sum(cast(m as decimal(38,0)) * p_micro) div 1000000 as bigint)")
            .as("m"))
          .withColumnRenamed("to_type", "t")
      }
      types.join(dist, Seq("t"), "left")
        .selectExpr("t AS event_type", "coalesce(m, 0L) AS stationary_micro")
        .orderBy(col("event_type"))
    },
    Some {
      val steps = (1 to Steps).map { i =>
        s""",
      d$i AS (SELECT tm.to_type AS t,
               CAST(sum(CAST(d.m AS HUGEINT) * tm.p_micro) // 1000000 AS BIGINT) AS m
             FROM d${i - 1} d JOIN tm ON d.t = tm.from_type GROUP BY 1)"""
      }.mkString
      s"""WITH seq AS (SELECT user_id, ts, event_id, event_type AS from_type,
               lead(event_type) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS to_type
             FROM events),
      cnt AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
              FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2),
      tm AS (SELECT from_type, to_type,
               (n * 1000000) // sum(n) OVER (PARTITION BY from_type) AS p_micro
             FROM cnt),
      types AS (SELECT DISTINCT from_type AS t FROM tm
                UNION SELECT DISTINCT to_type FROM tm),
      kc AS (SELECT CAST(count(*) AS BIGINT) AS k FROM types),
      d0 AS (SELECT t, 1000000 // k AS m FROM types, kc)$steps
      SELECT types.t AS event_type,
        CAST(COALESCE(d$Steps.m, 0) AS BIGINT) AS stationary_micro
      FROM types LEFT JOIN d$Steps ON types.t = d$Steps.t
      ORDER BY event_type"""
    })

  /** Largest-remainder budget apportionment driven by the POST-DEDUP
    * temperature mixture: 100000 budget units split across sources
    * proportional to sqrt(effective tokens) — the p30 Hamilton
    * machinery composed over p35's dedup-priced weights (the actual
    * release decision: dedup first, temper second, apportion third;
    * every stage an already-audited operator). */
  val p39: QueryDef = QueryDef(
    "p39_budget_by_mixture",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val per = Dedup.segmentDedupSavings(Tables.documents(s, d), "text", 8)
        .selectExpr("source",
          "cast(round(sqrt(cast(effective_tokens as double)) * 1000000) as bigint) AS w")
      val tot = per.agg(sum(col("w")).as("wsum"))
      val base = per.crossJoin(broadcast(tot))
        .selectExpr("source", "w",
          "cast((cast(w as decimal(38,0)) * 100000) div wsum as bigint) AS base_quota",
          "cast((cast(w as decimal(38,0)) * 100000) % wsum as bigint) AS rem_num")
      val slack = base.agg((lit(100000L) - sum(col("base_quota"))).as("r"))
      base.crossJoin(broadcast(slack))
        .withColumn("rn", row_number().over(
          Window.orderBy(col("rem_num").desc, col("source").asc)).cast("long"))
        .selectExpr("source", "w", "base_quota",
          "base_quota + if(rn <= r, 1L, 0L) AS quota")
        .orderBy(col("source"))
    },
    Some(s"""WITH p35 AS (SELECT * FROM (${Pipeline42.p35.oracle.get}) AS x),
      per AS (SELECT source,
               CAST(round(sqrt(effective_tokens::DOUBLE) * 1000000) AS BIGINT) AS w
             FROM p35),
      tot AS (SELECT CAST(sum(w) AS BIGINT) AS wsum FROM per),
      base AS (SELECT source, w,
                 CAST((CAST(w AS HUGEINT) * 100000) // wsum AS BIGINT) AS base_quota,
                 CAST((CAST(w AS HUGEINT) * 100000) % wsum AS BIGINT) AS rem_num
               FROM per, tot),
      slack AS (SELECT 100000 - CAST(sum(base_quota) AS BIGINT) AS r FROM base),
      rk AS (SELECT source, w, base_quota, rem_num,
               CAST(row_number() OVER (ORDER BY rem_num DESC, source ASC)
                 AS BIGINT) AS rn
             FROM base)
      SELECT source, w, base_quota,
        base_quota + CAST(CASE WHEN rn <= r THEN 1 ELSE 0 END AS BIGINT) AS quota
      FROM rk, slack ORDER BY source"""))

  /** Term burstiness — the Church & Gale (1995) variance-to-mean
    * index of dispersion of per-document counts: ~1e6 for a
    * Poisson-ish (uniform) term, far above for bursty/topical terms
    * (the content-word detector that needs no stopword list). Exact
    * integers: D = (N·Σx² − (Σx)²)·1e6 div ((N−1)·Σx) with zero-count
    * docs contributing through N alone. One term agg + one 1-row
    * broadcast. */
  val t41: QueryDef = QueryDef(
    "t41_term_dispersion",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val per = docs
        .selectExpr("doc_id", s"explode(${TextOps.tokens("text")}) AS term")
        .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("x"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      per.groupBy(col("term"))
        .agg(count(lit(1)).as("n_docs_with"),
          sum(col("x")).as("sx"), sum(expr("x * x")).as("sx2"))
        .crossJoin(broadcast(n))
        .selectExpr("term", "n_docs_with", "sx AS n_occ",
          "cast(((cast(n_docs as decimal(38,0)) * sx2 - cast(sx as decimal(38,0)) * sx) * 1000000) " +
            "div ((cast(n_docs as decimal(38,0)) - 1) * sx) as bigint) AS dispersion_micro")
        .orderBy(col("term"))
    },
    Some(s"""WITH per AS (SELECT term, doc_id, CAST(count(*) AS BIGINT) AS x
               FROM (SELECT doc_id, unnest(${DuckOps.tokens("text")}) AS term
                     FROM documents) GROUP BY 1, 2),
      n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
      a AS (SELECT term, CAST(count(*) AS BIGINT) AS n_docs_with,
              CAST(sum(x) AS BIGINT) AS sx, CAST(sum(x * x) AS BIGINT) AS sx2
            FROM per GROUP BY 1)
      SELECT term, n_docs_with, sx AS n_occ,
        CAST(((CAST(n_docs AS HUGEINT) * sx2 - CAST(sx AS HUGEINT) * sx) * 1000000)
          // ((CAST(n_docs AS HUGEINT) - 1) * sx) AS BIGINT) AS dispersion_micro
      FROM a, n ORDER BY term"""))
}
