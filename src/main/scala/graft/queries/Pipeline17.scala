package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Curate, Events}

/** Round-10 additions, part 7: deterministic source rebalancing
  * (fractional oversampling) and transition-matrix algebra.
  */
object Pipeline17 {

  def all: Seq[QueryDef] = Seq(p25, e14, d14, c05, q50, e15, p26, e16, p27)

  /** Segment-dimensioned funnel ([[graft.operators.Events.funnelBy]]):
    * e01's conversion funnel broken down by the broadcast customer
    * segment dimension — per (stage, segment) survivor counts. */
  val e16: QueryDef = QueryDef(
    "e16_funnel_by_segment",
    (s, d) => Events.funnelBy(Tables.events(s, d), "event_type", "user_id",
        "ts", Seq("view", "click", "purchase"),
        Tables.customer(s, d).selectExpr("cast(c_custkey as bigint) AS uid",
          "c_mktsegment AS segment"))
      .orderBy(col("stage_idx"), col("segment")),
    Some("""WITH s1 AS (SELECT user_id AS uid, min(ts) AS t FROM events
               WHERE event_type = 'view' GROUP BY 1),
      s2 AS (SELECT e.user_id AS uid, min(e.ts) AS t FROM events e
             JOIN s1 ON e.user_id = s1.uid AND e.ts > s1.t
             WHERE e.event_type = 'click' GROUP BY 1),
      s3 AS (SELECT e.user_id AS uid, min(e.ts) AS t FROM events e
             JOIN s2 ON e.user_id = s2.uid AND e.ts > s2.t
             WHERE e.event_type = 'purchase' GROUP BY 1),
      seg AS (SELECT CAST(c_custkey AS BIGINT) AS uid, c_mktsegment AS segment
              FROM customer)
      SELECT * FROM (
        SELECT CAST(1 AS BIGINT) AS stage_idx, 'view' AS stage, g.segment,
          CAST(count(*) AS BIGINT) AS n_users
        FROM s1 JOIN seg g ON s1.uid = g.uid GROUP BY 3
        UNION ALL
        SELECT CAST(2 AS BIGINT), 'click', g.segment, CAST(count(*) AS BIGINT)
        FROM s2 JOIN seg g ON s2.uid = g.uid GROUP BY 3
        UNION ALL
        SELECT CAST(3 AS BIGINT), 'purchase', g.segment, CAST(count(*) AS BIGINT)
        FROM s3 JOIN seg g ON s3.uid = g.uid GROUP BY 3)
      ORDER BY stage_idx, segment"""))

  /** Effective-token accounting: per source the raw token mass, the
    * mass surviving d05's keep-first near-dup filter, and the dedup
    * loss share in micro units — "how much of this source is actually
    * novel training signal". The oracle nests the minhash chain. */
  val p27: QueryDef = QueryDef(
    "p27_effective_tokens",
    (s, d) => {
      import graft.operators.Dedup
      val docs = Tables.documents(s, d)
      val losers = Dedup.minhashLshPairs(docs, "text", 3, 16, 4, 0.5)
        .select(col("d2").as("doc_id")).distinct()
        .withColumn("lost", lit(true))
      docs.selectExpr("doc_id", "source",
          "cast(size(filter(split(text, '[ ]+'), x -> x != '')) as bigint) AS n_tokens")
        .join(losers, Seq("doc_id"), "left")
        .groupBy(col("source"))
        .agg(sum(col("n_tokens")).as("raw_tokens"),
          sum(when(col("lost").isNull, col("n_tokens")).otherwise(0L)).as("kept_tokens"))
        .selectExpr("source", "raw_tokens", "kept_tokens",
          "((raw_tokens - kept_tokens) * 1000000) div raw_tokens AS lost_share_micro")
        .orderBy(col("source"))
    },
    Some(s"""${Pipeline.minhashCtes},
      sel AS (SELECT d1, d2 FROM est WHERE CAST(matches AS DOUBLE) / 16 >= 0.5),
      losers AS (SELECT DISTINCT d2 AS doc_id FROM sel),
      tk AS (SELECT doc_id, source,
               CAST(len(list_filter(regexp_split_to_array(text, '[ ]+'),
                 x -> x <> '')) AS BIGINT) AS n_tokens
             FROM documents)
      SELECT tk.source, CAST(sum(tk.n_tokens) AS BIGINT) AS raw_tokens,
        CAST(sum(CASE WHEN l.doc_id IS NULL THEN tk.n_tokens ELSE 0 END) AS BIGINT)
          AS kept_tokens,
        ((CAST(sum(tk.n_tokens) AS BIGINT)
          - CAST(sum(CASE WHEN l.doc_id IS NULL THEN tk.n_tokens ELSE 0 END) AS BIGINT))
          * 1000000)
          // CAST(sum(tk.n_tokens) AS BIGINT) AS lost_share_micro
      FROM tk LEFT JOIN losers l ON tk.doc_id = l.doc_id
      GROUP BY 1 ORDER BY 1"""))

  /** DAU/WAU stickiness ([[graft.operators.Events.stickiness]]):
    * daily actives over trailing-7-day actives in exact micro units;
    * the sliding distinct rides a BOUNDED 7× replication (never a
    * window distinct or a per-day rescan). */
  val e15: QueryDef = QueryDef(
    "e15_stickiness",
    (s, d) => Events.stickiness(Tables.events(s, d), "user_id", "ts")
      .orderBy(col("day")),
    Some("""WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id AS u FROM events),
      dau AS (SELECT d, CAST(count(*) AS BIGINT) AS dau FROM du GROUP BY 1),
      we AS (SELECT DISTINCT CAST(dd AS DATE) AS d, u FROM (
              SELECT unnest(generate_series(CAST(d AS TIMESTAMP),
                CAST(d AS TIMESTAMP) + INTERVAL 6 DAY, INTERVAL 1 DAY)) AS dd, u
              FROM du) t),
      wau AS (SELECT d, CAST(count(*) AS BIGINT) AS wau FROM we GROUP BY 1)
      SELECT CAST(dau.d AS VARCHAR) AS day, dau.dau, wau.wau,
        (dau.dau * 1000000) // wau.wau AS stickiness_micro
      FROM dau JOIN wau ON dau.d = wau.d ORDER BY day"""))

  /** Curriculum phase assignment: docs bucketed into 4 difficulty
    * phases by the EXACT readability quartiles (broadcast thresholds,
    * the e06 discipline — never a global ntile sort), phase 1 the
    * easiest; within each phase a deterministic salted-hash order
    * gives the training sequence. Completes the prep story:
    * select (p22/p24) → rebalance (p25) → order (p26). */
  val p26: QueryDef = QueryDef(
    "p26_curriculum",
    (s, d) => {
      import graft.operators.TextOps
      import org.apache.spark.sql.expressions.Window
      val scored = TextOps.readability(Tables.documents(s, d), "text")
        .select(col("doc_id"), col("flesch_micro"))
      val qs = scored.agg(
        expr("percentile(flesch_micro, 0.25)").as("q1"),
        expr("percentile(flesch_micro, 0.5)").as("q2"),
        expr("percentile(flesch_micro, 0.75)").as("q3"))
      val h = TextOps.strHash60("concat('graft', ':', cast(doc_id as string))")
      scored.crossJoin(broadcast(qs))
        .selectExpr("doc_id", "flesch_micro",
          "cast(4 - (if(flesch_micro > q1, 1, 0) + if(flesch_micro > q2, 1, 0) +" +
            " if(flesch_micro > q3, 1, 0)) as bigint) AS phase",
          s"$h AS hk")
        .withColumn("phase_rank", row_number().over(
          Window.partitionBy(col("phase")).orderBy(col("hk"), col("doc_id"))).cast("long"))
        .select(col("doc_id"), col("flesch_micro"), col("phase"), col("phase_rank"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH b AS (SELECT doc_id,
               CAST(len(${DuckOps.tokens("text")}) AS BIGINT) AS n_words,
               greatest(CAST(1 AS BIGINT),
                 CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT)) AS n_sentences,
               CAST(len(regexp_extract_all(lower(text), '[aeiou]+')) AS BIGINT) AS n_vowel_groups
             FROM documents),
      sc AS (SELECT doc_id,
               CAST(206835000 - (1015000 * n_words) // n_sentences
                 - (84600000 * n_vowel_groups) // n_words AS BIGINT) AS flesch_micro
             FROM b WHERE n_words > 0),
      qs AS (SELECT quantile_cont(flesch_micro, 0.25) AS q1,
               quantile_cont(flesch_micro, 0.5) AS q2,
               quantile_cont(flesch_micro, 0.75) AS q3 FROM sc),
      ph AS (SELECT doc_id, flesch_micro,
               CAST(4 - (CASE WHEN flesch_micro > q1 THEN 1 ELSE 0 END +
                         CASE WHEN flesch_micro > q2 THEN 1 ELSE 0 END +
                         CASE WHEN flesch_micro > q3 THEN 1 ELSE 0 END) AS BIGINT) AS phase
             FROM sc, qs),
      h AS (SELECT doc_id,
              ${DuckOps.strHash60("('graft:' || CAST(doc_id AS VARCHAR))")} AS hk
            FROM documents)
      SELECT p.doc_id, p.flesch_micro, p.phase,
        CAST(row_number() OVER (PARTITION BY p.phase
          ORDER BY h.hk, p.doc_id) AS BIGINT) AS phase_rank
      FROM ph p JOIN h ON p.doc_id = h.doc_id
      ORDER BY p.doc_id"""))

  /** SCD2 point-in-time lookup — the CONSUMER half of q40's
    * slowly-changing dimension: every order joins the dimension
    * version valid AT its order date (equi-join on the key plus the
    * validity-interval predicate — per key at most two versions, so
    * the interval filter rides a bounded equi-join, never a range
    * scan) and revenue aggregates by the version-correct segment.
    * Keys ≡ 0 (mod 10) switch to a `_V2` segment at 1998-01-01,
    * so pre/post-1998 orders of the same customer land in different
    * segments — the thing a naive current-value join gets wrong. */
  val q50: QueryDef = QueryDef(
    "q50_scd2_lookup",
    (s, d) => {
      val base = Tables.customer(s, d)
        .selectExpr("cast(c_custkey as bigint) AS k", "c_mktsegment AS seg")
      val unchanged = base.filter("k % 10 != 0").selectExpr("k", "seg",
        "cast('1995-01-01' as date) AS vf", "cast(null as date) AS vt")
      val v1 = base.filter("k % 10 = 0").selectExpr("k", "seg",
        "cast('1995-01-01' as date) AS vf", "cast('1998-01-01' as date) AS vt")
      val v2 = base.filter("k % 10 = 0").selectExpr("k", "concat(seg, '_V2') AS seg",
        "cast('1998-01-01' as date) AS vf", "cast(null as date) AS vt")
      val dim = unchanged.unionByName(v1).unionByName(v2)
      Tables.orders(s, d)
        .selectExpr("o_custkey AS k", "to_date(o_orderdate) AS od",
          "cast(round(o_totalprice * 100) as long) AS cents")
        .join(dim, Seq("k"))
        .filter(col("od") >= col("vf") && (col("vt").isNull || col("od") < col("vt")))
        .groupBy(col("seg"))
        .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("cents"))
        .orderBy(col("seg"))
    },
    Some("""WITH dim AS (
        SELECT CAST(c_custkey AS BIGINT) AS k, c_mktsegment AS seg,
          DATE '1995-01-01' AS vf, CAST(NULL AS DATE) AS vt
        FROM customer WHERE c_custkey % 10 <> 0
        UNION ALL
        SELECT CAST(c_custkey AS BIGINT), c_mktsegment,
          DATE '1995-01-01', DATE '1998-01-01'
        FROM customer WHERE c_custkey % 10 = 0
        UNION ALL
        SELECT CAST(c_custkey AS BIGINT), c_mktsegment || '_V2',
          DATE '1998-01-01', CAST(NULL AS DATE)
        FROM customer WHERE c_custkey % 10 = 0),
      o AS (SELECT o_custkey AS k, CAST(o_orderdate AS DATE) AS od,
              CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders)
      SELECT dim.seg, CAST(count(*) AS BIGINT) AS n_orders,
        CAST(sum(o.cents) AS BIGINT) AS cents
      FROM o JOIN dim ON o.k = dim.k
        AND o.od >= dim.vf AND (dim.vt IS NULL OR o.od < dim.vt)
      GROUP BY 1 ORDER BY 1"""))

  /** Ensemble near-dup pairs: the UNION of the lexical (d03
    * MinHash-LSH) and semantic (s03 embedding-LSH) pair sets with
    * per-signal provenance flags — the multi-signal dedup policy a
    * production pass votes over (a pair found by both signals is the
    * strongest dup evidence; lexical-only is boilerplate, semantic-
    * only is paraphrase). Full outer equi-join of two audited pair
    * generators; both oracle chains nested. */
  val d14: QueryDef = QueryDef(
    "d14_ensemble_pairs",
    (s, d) => {
      import graft.operators.{Dedup, Similarity}
      val lex = Dedup.minhashLshPairs(Tables.documents(s, d), "text", 3, 16, 4, 0.5)
        .select(col("d1"), col("d2"), lit(true).as("lexical"))
      val sem = Similarity.nearDupPairs(Tables.embeddings(s, d), 0.45)
        .select(col("d1"), col("d2"), lit(true).as("semantic"))
      lex.join(sem, Seq("d1", "d2"), "full_outer")
        .na.fill(false, Seq("lexical", "semantic"))
        .select(col("d1"), col("d2"), col("lexical"), col("semantic"))
        .orderBy(col("d1"), col("d2"))
    },
    Some(s"""WITH lx AS (SELECT d1, d2 FROM (${Pipeline.d03.oracle.get}) AS d03),
      sm AS (SELECT d1, d2 FROM (${Pipeline.s03.oracle.get}) AS s03)
      SELECT COALESCE(lx.d1, sm.d1) AS d1, COALESCE(lx.d2, sm.d2) AS d2,
        lx.d1 IS NOT NULL AS lexical, sm.d1 IS NOT NULL AS semantic
      FROM lx FULL OUTER JOIN sm ON lx.d1 = sm.d1 AND lx.d2 = sm.d2
      ORDER BY d1, d2"""))

  /** Whole-graph summary of the inter-nation trade graph: node/edge
    * counts, max degree, mean degree and density in micro units, and
    * the EXACT global clustering coefficient
    * `3·triangles·1e6 div wedges` — every statistic integer (the
    * per-node triangle counts from the audited degree-ordered
    * enumeration sum to exactly 3·T). One row. */
  val c05: QueryDef = QueryDef(
    "c05_graph_summary",
    (s, d) => {
      import graft.operators.Graph
      val edges = Pipeline11.tradeEdges(s, d)
      val und = edges
        .selectExpr("least(src, dst) AS a", "greatest(src, dst) AS b")
        .filter(col("a") =!= col("b")).distinct()
      val deg = und.selectExpr("explode(array(a, b)) AS id")
        .groupBy(col("id")).agg(count(lit(1)).as("deg"))
      val degStats = deg.agg(
        count(lit(1)).as("n_nodes"),
        sum(col("deg")).as("deg_sum"),
        max(col("deg")).as("max_deg"),
        sum(expr("deg * (deg - 1) div 2")).as("wedges"))
      val triSum = Graph.triangleCounts(edges, "src", "dst")
        .agg(sum(col("tri_n")).as("tri3"))
      degStats.crossJoin(broadcast(triSum))
        .selectExpr("n_nodes", "deg_sum div 2 AS n_edges", "max_deg",
          "wedges", "tri3")
        .selectExpr("n_nodes", "n_edges", "max_deg",
          "(n_edges * 2 * 1000000) div n_nodes AS mean_deg_micro",
          "(n_edges * 2 * 1000000) div (n_nodes * (n_nodes - 1)) AS density_micro",
          "wedges", "tri3 div 3 AS n_triangles",
          "if(wedges = 0, 0L, (tri3 * 1000000) div wedges) AS clustering_micro")
    },
    Some(s"""WITH ${Pipeline11.tradeEdgesSql},
      und AS (SELECT least(src, dst) AS a, greatest(src, dst) AS b
              FROM e WHERE src <> dst GROUP BY 1, 2),
      dg AS (SELECT id, CAST(count(*) AS BIGINT) AS deg
             FROM (SELECT a AS id FROM und UNION ALL SELECT b FROM und) u
             GROUP BY 1),
      ds AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes,
               CAST(sum(deg) AS BIGINT) AS deg_sum,
               CAST(max(deg) AS BIGINT) AS max_deg,
               CAST(sum(deg * (deg - 1) // 2) AS BIGINT) AS wedges
             FROM dg),
      tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
              FROM und e1
                JOIN und e2 ON e2.a = e1.a AND e2.b > e1.b
                JOIN und e3 ON e3.a = e1.b AND e3.b = e2.b),
      tc AS (SELECT CAST(3 * count(*) AS BIGINT) AS tri3 FROM tri)
      SELECT n_nodes, deg_sum // 2 AS n_edges, max_deg,
        ((deg_sum // 2) * 2 * 1000000) // n_nodes AS mean_deg_micro,
        ((deg_sum // 2) * 2 * 1000000) // (n_nodes * (n_nodes - 1)) AS density_micro,
        wedges, tri3 // 3 AS n_triangles,
        CASE WHEN wedges = 0 THEN 0 ELSE (tri3 * 1000000) // wedges END AS clustering_micro
      FROM ds, tc"""))

  /** Deterministic source rebalancing
    * ([[graft.operators.Curate.rebalanceSources]]): every source
    * upsampled toward the largest source's token mass by a fractional
    * replication factor — the integer part replicates every doc, the
    * fractional part replicates the hash-selected prefix — so
    * expected per-source token mass equalizes with NO randomness.
    * One row per (doc, copy). */
  val p25: QueryDef = QueryDef(
    "p25_rebalance",
    (s, d) => Curate.rebalanceSources(Tables.documents(s, d),
        "doc_id", "source", "text", salt = "graft")
      .orderBy(col("id"), col("copy_idx")),
    Some(s"""WITH toks AS (SELECT doc_id AS id, source,
               CAST(len(list_filter(regexp_split_to_array(text, '[ ]+'),
                 x -> x <> '')) AS BIGINT) AS n_tokens
             FROM documents),
      ps AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS w FROM toks GROUP BY 1),
      mx AS (SELECT max(w) AS max_w FROM ps),
      f AS (SELECT source, (max_w * 1000000) // w AS factor_micro FROM ps, mx),
      h AS (SELECT id, source, n_tokens,
              (((${DuckOps.strHash60("('graft:' || CAST(id AS VARCHAR))")} % 2147483648)
                * 2654435761) % 2147483648) % 1000000 AS bucket
            FROM toks),
      c AS (SELECT h.id, h.source, h.n_tokens,
              CAST(f.factor_micro // 1000000
                + CASE WHEN h.bucket < f.factor_micro % 1000000 THEN 1 ELSE 0 END
                AS BIGINT) AS copies
            FROM h JOIN f ON h.source = f.source)
      SELECT id, source, n_tokens, copies, CAST(i AS BIGINT) AS copy_idx
      FROM c, unnest(range(0, copies)) AS t(i)
      ORDER BY id, copy_idx"""))

  /** Two-step transition probabilities: e08's first-order matrix
    * composed with itself — `p2(i,j) = Σ_k (p(i,k)·p(k,j)) div 1e6`,
    * the floor-composed integer matrix square (one equi-join of the
    * T²-row matrix with itself + one partial agg). The oracle nests
    * e08's generated chain. */
  val e14: QueryDef = QueryDef(
    "e14_two_step_transitions",
    (s, d) => {
      val m = Events.transitionMatrix(Tables.events(s, d),
        "event_type", "user_id", "ts", "event_id")
      val a = m.select(col("from_type").as("i"), col("to_type").as("k"),
        col("p_micro").as("p1"))
      val b = m.select(col("from_type").as("k"), col("to_type").as("j"),
        col("p_micro").as("p2"))
      a.join(b, Seq("k"))
        .groupBy(col("i").as("from_type"), col("j").as("to_type"))
        .agg(sum(expr("(p1 * p2) div 1000000")).as("p2_micro"),
          count(lit(1)).as("n_paths"))
        .orderBy(col("from_type"), col("to_type"))
    },
    Some(s"""WITH m AS (SELECT from_type, to_type, p_micro
               FROM (${Pipeline13.e08.oracle.get}) AS e08)
      SELECT a.from_type, b.to_type,
        CAST(sum((a.p_micro * b.p_micro) // 1000000) AS BIGINT) AS p2_micro,
        CAST(count(*) AS BIGINT) AS n_paths
      FROM m a JOIN m b ON a.to_type = b.from_type
      GROUP BY 1, 2 ORDER BY 1, 2"""))
}
