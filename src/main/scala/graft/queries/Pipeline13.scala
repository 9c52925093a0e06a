package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Baskets, Dedup, Events, Graph}

/** Round-10 additions, part 3: market-basket association rules
  * ([[graft.operators.Baskets]]), first-order Markov transitions and
  * chi-square distribution drift over the event log
  * ([[graft.operators.Events]]), and k-core decomposition
  * ([[graft.operators.Graph.kCore]]) over the customer–part purchase
  * graph — the co-occurrence / graph-density layer of the analytics
  * surface.
  */
object Pipeline13 {

  def all: Seq[QueryDef] = Seq(q42, e08, e09, c04, d10, st03)

  /** Exact edit-distance re-rank ([[graft.operators.Dedup.editRerank]])
    * of the d03 MinHash-LSH candidates: Levenshtein over a 200-char
    * prefix (the cost valve), keep <= 3 edits — integer-exact in both
    * engines, so the near-dup verdict is hash-pinned with no float
    * similarity. The oracle nests d03's generated CTE chain (single
    * source of truth — banding drift breaks both queries). */
  val d10: QueryDef = QueryDef(
    "d10_edit_rerank",
    (s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.editRerank(docs, "doc_id", "text",
          Dedup.minhashLshPairs(docs, "text", 3, 16, 4, 0.5),
          prefixLen = 200, maxDist = 3L)
        .orderBy(col("d1"), col("d2"))
    },
    Some(s"""${Pipeline.minhashCtes},
      sel AS (SELECT d1, d2 FROM est WHERE CAST(matches AS DOUBLE) / 16 >= 0.5)
      SELECT p.d1, p.d2,
        CAST(levenshtein(substring(a.text, 1, 200), substring(b.text, 1, 200)) AS BIGINT) AS edit_d
      FROM sel p
        JOIN documents a ON p.d1 = a.doc_id
        JOIN documents b ON p.d2 = b.doc_id
      WHERE levenshtein(substring(a.text, 1, 200), substring(b.text, 1, 200)) <= 3
      ORDER BY p.d1, p.d2"""))

  /** Stream-static enrichment
    * ([[graft.streaming.EventStreams.segmentRevenue]]): the event
    * stream broadcast-joined to the customer segment dimension, exact
    * cents per (1-day tumbling window, segment). Registered on the
    * batch face; EventStreamsSpec proves the readStream face emits the
    * identical rows through a real watermark + memory sink. */
  val st03: QueryDef = QueryDef(
    "st03_segment_revenue",
    (s, d) => graft.streaming.EventStreams.segmentRevenue(
        Tables.events(s, d),
        Tables.customer(s, d).selectExpr("c_custkey AS user_id",
          "c_mktsegment AS segment"))
      .orderBy(col("win_start_ms"), col("segment")),
    Some("""WITH e AS (SELECT ts, user_id, CAST(round(value * 100) AS BIGINT) AS cents
               FROM events),
      j AS (SELECT date_trunc('day', e.ts) AS d, c.c_mktsegment AS segment, e.cents
            FROM e JOIN customer c ON e.user_id = c.c_custkey)
      SELECT epoch_ms(d) AS win_start_ms, segment,
        CAST(count(*) AS BIGINT) AS n_events, CAST(sum(cents) AS BIGINT) AS cents
      FROM j GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Association rules over order baskets
    * ([[graft.operators.Baskets.assocPairs]]): part pairs co-bought in
    * >= 3 orders with exact-integer support/confidence/lift. The lift
    * is the documented floor-composed surrogate
    * `(conf_ab · N) div n_b`, replayed op-for-op by the oracle. */
  val q42: QueryDef = QueryDef(
    "q42_assoc_rules",
    (s, d) => Baskets.assocPairs(
        Tables.lineitem(s, d).selectExpr("l_orderkey", "l_partkey"),
        "l_orderkey", "l_partkey", minPairs = 3L)
      .orderBy(col("item_a"), col("item_b")),
    Some("""WITH it AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem),
      nb AS (SELECT CAST(count(DISTINCT bk) AS BIGINT) AS n FROM it),
      cnt AS (SELECT it, CAST(count(*) AS BIGINT) AS n_it FROM it GROUP BY 1),
      pr AS (SELECT a.it AS item_a, b.it AS item_b, CAST(count(*) AS BIGINT) AS n_ab
             FROM it a JOIN it b ON a.bk = b.bk AND a.it < b.it
             GROUP BY 1, 2 HAVING count(*) >= 3)
      SELECT p.item_a, p.item_b, p.n_ab, ca.n_it AS n_a, cb.n_it AS n_b,
        (p.n_ab * 1000000) // (SELECT n FROM nb) AS support_micro,
        (p.n_ab * 1000000) // ca.n_it AS conf_ab_micro,
        (p.n_ab * 1000000) // cb.n_it AS conf_ba_micro,
        (((p.n_ab * 1000000) // ca.n_it) * (SELECT n FROM nb)) // cb.n_it AS lift_micro
      FROM pr p
        JOIN cnt ca ON p.item_a = ca.it
        JOIN cnt cb ON p.item_b = cb.it
      ORDER BY p.item_a, p.item_b"""))

  /** First-order Markov transition matrix
    * ([[graft.operators.Events.transitionMatrix]]) over each user's
    * time-ordered event stream, (ts, event_id)-tie-broken; transition
    * probabilities in exact micro units. */
  val e08: QueryDef = QueryDef(
    "e08_transitions",
    (s, d) => Events.transitionMatrix(Tables.events(s, d),
        "event_type", "user_id", "ts", "event_id")
      .orderBy(col("from_type"), col("to_type")),
    Some("""WITH tr AS (
        SELECT event_type AS from_type,
          lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        FROM events),
      agg AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
              FROM tr WHERE to_type IS NOT NULL GROUP BY 1, 2)
      SELECT from_type, to_type, n,
        CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT) AS from_total,
        (n * 1000000) // CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT) AS p_micro
      FROM agg ORDER BY from_type, to_type"""))

  /** Chi-square distribution drift
    * ([[graft.operators.Events.typeDriftChi2]]) of the event-type mix
    * across a mid-month split — the alarm a pipeline raises when a new
    * snapshot's category distribution shifts. Both engines replay the
    * identical correctly-rounded IEEE op chain per cell, then sum
    * exact micro BIGINTs. */
  val e09: QueryDef = QueryDef(
    "e09_type_drift",
    (s, d) => Events.typeDriftChi2(Tables.events(s, d),
        "event_type", "ts", "2024-01-16 00:00:00")
      .orderBy(col("event_type")),
    Some("""WITH cells AS (SELECT event_type AS t,
               CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00' THEN 0 ELSE 1 END AS half,
               CAST(count(*) AS BIGINT) AS o
             FROM events GROUP BY 1, 2),
      rt AS (SELECT t, CAST(sum(o) AS BIGINT) AS row_tot FROM cells GROUP BY 1),
      ct AS (SELECT half, CAST(sum(o) AS BIGINT) AS col_tot FROM cells GROUP BY 1),
      g AS (SELECT CAST(sum(o) AS BIGINT) AS n_total FROM cells),
      grid AS (SELECT rt.t, ct.half, rt.row_tot, ct.col_tot,
                 CAST(COALESCE(c.o, 0) AS BIGINT) AS o
               FROM rt CROSS JOIN ct
                 LEFT JOIN cells c ON c.t = rt.t AND c.half = ct.half),
      cellstat AS (SELECT t, half, o,
          CAST(round(((o - (row_tot * col_tot) / n_total) *
                      (o - (row_tot * col_tot) / n_total)) /
                     ((row_tot * col_tot) / n_total) * 1000000) AS BIGINT) AS cell_micro
        FROM grid, g)
      SELECT t AS event_type,
        CAST(sum(CASE WHEN half = 0 THEN o ELSE 0 END) AS BIGINT) AS n_before,
        CAST(sum(CASE WHEN half = 1 THEN o ELSE 0 END) AS BIGINT) AS n_after,
        CAST(sum(cell_micro) AS BIGINT) AS chi2_micro
      FROM cellstat GROUP BY 1 ORDER BY 1"""))

  /** k-core round count for c04 — also the oracle's unroll depth.
    * Peeling is monotone, so unrolling past the fixpoint is a no-op;
    * [[graft.operators.Graph.kCore]] throws if the fixpoint needs MORE
    * rounds than this (both SFs converge in 3). */
  private val KcoreMaxRounds = 8
  private val KcoreK = 16

  /** k-core of the customer–part purchase graph
    * ([[graft.operators.Graph.kCore]]): nodes are customers (2·key)
    * and parts (2·key+1), an edge per distinct purchase relation; the
    * k=16 core keeps nodes with >= 16 qualifying neighbors after
    * peeling. The oracle unrolls the peel as generated CTEs. */
  val c04: QueryDef = QueryDef(
    "c04_kcore",
    (s, d) => {
      val edges = Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .selectExpr("o_custkey * 2 AS a", "l_partkey * 2 + 1 AS b")
      val (core, _) = Graph.kCore(edges, "a", "b", k = KcoreK,
        maxRounds = KcoreMaxRounds)
      core.orderBy(col("id"))
    },
    Some(kcorePeelSql(KcoreMaxRounds, KcoreK)))

  /** Generated peel unroll: k_r = degree filter over e_{r-1};
    * e_r = edges with both endpoints in k_r. The SINGLE source of
    * truth for the oracle's arithmetic is the same (k, rounds) pair
    * the Spark call uses. */
  private def kcorePeelSql(rounds: Int, k: Int): String = {
    // every CTE is MATERIALIZED: each round references its predecessor
    // three times, so inlined expansion would re-scan the base 3^rounds
    // times (the local checker actually hit the fd limit at rounds=8)
    val base = """e0 AS MATERIALIZED (SELECT DISTINCT o.o_custkey * 2 AS a, l.l_partkey * 2 + 1 AS b
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)"""
    val steps = (1 to rounds).map { r =>
      s"""k$r AS MATERIALIZED (SELECT id, CAST(count(*) AS BIGINT) AS deg
           FROM (SELECT a AS id FROM e${r - 1} UNION ALL SELECT b FROM e${r - 1}) u$r
           GROUP BY 1 HAVING count(*) >= $k),
         e$r AS MATERIALIZED (SELECT e.a, e.b FROM e${r - 1} e
           JOIN k$r x ON e.a = x.id JOIN k$r y ON e.b = y.id)"""
    }
    s"WITH $base, ${steps.mkString(", ")} SELECT id, deg FROM k$rounds ORDER BY id"
  }
}
