package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Events, Incremental, Retrieval, Similarity, TextOps}

/** Round-10 additions, part 5: sketch-based incremental distinct
  * (the holistic complement to q43's algebraic merge) and the
  * integer random-projection sketch ANN.
  */
object Pipeline15 {

  def all: Seq[QueryDef] = Seq(q44, s20, e11, q45, t27, q46, d12)

  /** Cumulative distinct users per (type, day)
    * ([[graft.operators.Events.cumulativeDistinct]]): the running
    * COUNT(DISTINCT) window Spark lacks natively, decomposed into
    * first-seen counts + a running sum — exact, log never windowed. */
  val q46: QueryDef = QueryDef(
    "q46_cumulative_distinct",
    (s, d) => Events.cumulativeDistinct(Tables.events(s, d),
        "event_type", "user_id", "ts")
      .orderBy(col("day"), col("event_type")),
    Some("""WITH fu AS (SELECT event_type AS t, user_id AS u,
               min(CAST(ts AS DATE)) AS d0 FROM events GROUP BY 1, 2),
      nd AS (SELECT t, d0 AS d, CAST(count(*) AS BIGINT) AS new_users
             FROM fu GROUP BY 1, 2),
      ds AS (SELECT DISTINCT event_type AS t, CAST(ts AS DATE) AS d FROM events)
      SELECT CAST(ds.d AS VARCHAR) AS day, ds.t AS event_type,
        CAST(COALESCE(nd.new_users, 0) AS BIGINT) AS new_users,
        CAST(sum(COALESCE(nd.new_users, 0)) OVER (PARTITION BY ds.t ORDER BY ds.d
          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
      FROM ds LEFT JOIN nd ON ds.t = nd.t AND ds.d = nd.d
      ORDER BY day, event_type"""))

  /** Best-of-cluster dedup: c01's near-dup clusters with a KEEP-BEST
    * policy — the highest stopword-ratio doc per cluster survives
    * (ties to the lower id), instead of d05's keep-first. The oracle
    * nests c01's full recursive-CC chain as a derived table, so
    * clustering drift breaks both queries identically. */
  val d12: QueryDef = QueryDef(
    "d12_cluster_keep_best",
    (s, d) => {
      import graft.operators.{Cluster, Dedup}
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      val pairs = Dedup.minhashLshPairs(docs, "text", 3, 16, 4, 0.5)
        .select(col("d1"), col("d2"))
      val labels = Cluster.connectedComponents(pairs, "d1", "d2")
        .withColumnRenamed("id", "doc_id")
      val scored = docs.selectExpr("doc_id", s"${TextOps.tokens("text")} AS t")
        .selectExpr("doc_id", "cast(size(t) as bigint) AS n_tokens",
          s"cast(${TextOps.stopHits("t", TextOps.StopEn)} as bigint) AS stop_hits")
        .selectExpr("doc_id",
          "if(n_tokens = 0, 0L, (stop_hits * 1000000) div n_tokens) AS score_micro")
      docs.select(col("doc_id"))
        .join(labels, Seq("doc_id"), "left")
        .selectExpr("doc_id", "cast(coalesce(lbl, doc_id) as bigint) AS cluster_id")
        .join(scored, Seq("doc_id"))
        .withColumn("rk", row_number().over(Window.partitionBy(col("cluster_id"))
          .orderBy(col("score_micro").desc, col("doc_id"))))
        .selectExpr("doc_id", "cluster_id", "score_micro", "rk = 1 AS kept")
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH cl AS (SELECT doc_id, cluster_id
               FROM (${Pipeline3.c01.oracle.get}) AS c01),
      tk AS (SELECT doc_id, ${DuckOps.tokens("text")} AS t FROM documents),
      sc AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
               CAST(${DuckOps.stopHits("t", TextOps.StopEn)} AS BIGINT) AS stop_hits
             FROM tk),
      s2 AS (SELECT doc_id,
               CASE WHEN n_tokens = 0 THEN 0
                 ELSE (stop_hits * 1000000) // n_tokens END AS score_micro
             FROM sc),
      r AS (SELECT cl.doc_id, cl.cluster_id, s2.score_micro,
              row_number() OVER (PARTITION BY cl.cluster_id
                ORDER BY s2.score_micro DESC, cl.doc_id) AS rk
            FROM cl JOIN s2 ON cl.doc_id = s2.doc_id)
      SELECT doc_id, cluster_id, CAST(score_micro AS BIGINT) AS score_micro,
        rk = 1 AS kept
      FROM r ORDER BY doc_id"""))

  /** Top event-type trigram paths ([[graft.operators.Events.typePaths]]):
    * the 20 most frequent length-3 consecutive type sequences across
    * user streams, (count desc, path) total-ordered. */
  val e11: QueryDef = QueryDef(
    "e11_trigram_paths",
    (s, d) => Events.typePaths(Tables.events(s, d),
        "event_type", "user_id", "ts", "event_id", n = 3, topN = 20)
      .orderBy(col("rk")),
    Some("""WITH s AS (SELECT event_type AS t0,
          lead(event_type, 1) OVER w AS t1,
          lead(event_type, 2) OVER w AS t2
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      g AS (SELECT t0, t1, t2, CAST(count(*) AS BIGINT) AS n
            FROM s WHERE t2 IS NOT NULL GROUP BY 1, 2, 3),
      r AS (SELECT t0, t1, t2, n,
              CAST(row_number() OVER (ORDER BY n DESC, t0, t1, t2) AS BIGINT) AS rk
            FROM g)
      SELECT t0, t1, t2, n, rk FROM r WHERE rk <= 20 ORDER BY rk"""))

  /** Hourly calendar gap-fill ([[graft.operators.Events.hourlyGapFill]]):
    * the complete (hour, type) spine with zero-filled counts and a
    * carry-forward of the last known cent sum — leading gaps stay
    * NULL in both engines. */
  val q45: QueryDef = QueryDef(
    "q45_gap_fill",
    (s, d) => Events.hourlyGapFill(Tables.events(s, d),
        "event_type", "ts", "value")
      .orderBy(col("hour_ms"), col("event_type")),
    Some("""WITH b AS (SELECT min(date_trunc('hour', ts)) AS h0,
               max(date_trunc('hour', ts)) AS h1 FROM events),
      ty AS (SELECT DISTINCT event_type FROM events),
      sp AS (SELECT ty.event_type,
               unnest(generate_series(b.h0, b.h1, INTERVAL 1 HOUR)) AS h
             FROM ty, b),
      a AS (SELECT date_trunc('hour', ts) AS h, event_type,
              CAST(count(*) AS BIGINT) AS n_raw,
              CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
            FROM events GROUP BY 1, 2),
      j AS (SELECT sp.event_type, sp.h, a.n_raw, a.cents
            FROM sp LEFT JOIN a ON sp.h = a.h AND sp.event_type = a.event_type)
      SELECT epoch_ms(h) AS hour_ms, event_type,
        CAST(COALESCE(n_raw, 0) AS BIGINT) AS n_events,
        n_raw IS NOT NULL AS had_data, cents,
        last_value(cents IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY h
          ROWS UNBOUNDED PRECEDING) AS carry_cents
      FROM j ORDER BY hour_ms, event_type"""))

  /** Keyword-in-context snippets for the t19 BM25 results: for each
    * (query, hit) the first occurrence position of ANY of the query's
    * terms (t19's exact term selection) in the hit text, and the
    * 80-char window around it — deterministic integer positions and
    * byte-exact substrings; the oracle NESTS t19's generated chain so
    * retrieval drift breaks both queries identically. */
  val t27: QueryDef = QueryDef(
    "t27_snippets",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val qs = docs.filter(col("doc_id") % 100 === 7 && col("doc_id") < 5000)
        .select(col("doc_id").as("q_id"), col("text"))
      val bm = Retrieval.bm25TopK(docs, "text", qs, "text", k = 5, maxQueryTerms = 6)
        .select(col("q_id"), col("rnk"), col("doc_id"))
      val qterms = docs.filter(col("doc_id") % 100 === 7 && col("doc_id") < 5000)
        .selectExpr("doc_id AS q_id",
          s"explode(slice(array_sort(array_distinct(${TextOps.tokens("text")})), 1, 6)) AS term")
      bm.join(docs.selectExpr("doc_id", "text AS dtext"), Seq("doc_id"))
        .join(qterms, Seq("q_id"))
        .selectExpr("q_id", "rnk", "doc_id", "dtext",
          "cast(nullif(instr(lower(dtext), term), 0) as bigint) AS p")
        .groupBy(col("q_id"), col("rnk"), col("doc_id"), col("dtext"))
        .agg(min(col("p")).as("pos0"))
        .selectExpr("q_id", "rnk", "doc_id", "coalesce(pos0, 1L) AS pos",
          "substring(dtext, cast(greatest(1L, coalesce(pos0, 1L) - 30) as int), 80) AS snippet")
        .orderBy(col("q_id"), col("rnk"))
    },
    Some(s"""WITH bm AS (SELECT q_id, rnk, doc_id
               FROM (${Pipeline9.t19.oracle.get}) AS t19),
      qt AS (SELECT doc_id AS q_id,
               unnest(list_sort(list_distinct(${DuckOps.tokens("text")}))[1:6]) AS term
             FROM documents WHERE doc_id % 100 = 7 AND doc_id < 5000),
      px AS (SELECT bm.q_id, bm.rnk, bm.doc_id,
               min(nullif(strpos(lower(d.text), q.term), 0)) AS pos0
             FROM bm JOIN documents d ON bm.doc_id = d.doc_id
                     JOIN qt q ON bm.q_id = q.q_id
             GROUP BY 1, 2, 3)
      SELECT p.q_id, p.rnk, p.doc_id,
        CAST(COALESCE(p.pos0, 1) AS BIGINT) AS pos,
        substring(d.text, CAST(greatest(1, COALESCE(p.pos0, 1) - 30) AS INT), 80) AS snippet
      FROM px p JOIN documents d ON p.doc_id = d.doc_id
      ORDER BY p.q_id, p.rnk"""))

  /** Incremental distinct-users-per-week via mergeable HLL sketches
    * ([[graft.operators.Incremental.sketchDistinctRollup]]): daily
    * sketch states merged to week grain, audited in-plan against the
    * exact distinct at ±5% — the q37 discipline (the hash gate pins
    * exact counts + the bound verdict, never the raw estimate; at
    * these cardinalities the DataSketches HLL is in its exact coupon
    * range, so the bound is deterministic). */
  val q44: QueryDef = QueryDef(
    "q44_sketch_rollup",
    (s, d) => Incremental.sketchDistinctRollup(Tables.events(s, d),
        "user_id", "ts")
      .orderBy(col("week")),
    Some("""SELECT CAST(CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS VARCHAR) AS week,
        CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
        TRUE AS within_bound
      FROM events GROUP BY 1 ORDER BY 1"""))

  /** Integer random-projection sketch ANN
    * ([[graft.operators.Similarity.randomProjectionTopK]]): 64-dim
    * int8 vectors projected to 16 exact-integer sketch coordinates
    * under a deterministic ±1 sign matrix; sketch-space top-5 for 5
    * queries with an in-plan `in_exact` recall audit vs the exact
    * cosine top-5. The oracle replays the quantization, the sign
    * matrix, the integer dots, and BOTH rankings. */
  val s20: QueryDef = QueryDef(
    "s20_random_projection",
    (s, d) => Similarity.randomProjectionTopK(Tables.embeddings(s, d),
        dims = 16, nQueries = 5, k = 5)
      .orderBy(col("q_id"), col("rk")),
    Some(s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
                        FROM embeddings),
      m AS (SELECT vec_id, v, ${DuckOps.norm2("v")} AS nrm,
              list_reduce(list_concat([0.0::DOUBLE],
                list_transform(v, x -> abs(x))), (a, b) -> greatest(a, b)) AS maxabs
            FROM e),
      qz AS (SELECT vec_id, v, nrm,
               CASE WHEN maxabs = 0 THEN list_transform(v, x -> 0::INT)
                 ELSE list_transform(v, x -> CAST(round((x * 127) / maxabs) AS INT))
               END AS q
             FROM m),
      sk AS (SELECT vec_id, list_transform(range(0, 16), j ->
               CAST(list_sum(list_transform(range(1, len(q) + 1), d ->
                 q[d] * (1 - 2 * (((d - 1) * 31 + j * 17) % 2)))) AS BIGINT)) AS sk
             FROM qz),
      sc AS (SELECT a.vec_id AS q_id, b.vec_id AS n_id,
               CAST(list_sum(list_transform(range(1, 17), i ->
                 a.sk[i] * b.sk[i])) AS BIGINT) AS sk_dot
             FROM sk a JOIN sk b ON a.vec_id < 5 AND b.vec_id <> a.vec_id),
      top AS (SELECT q_id, n_id, sk_dot,
                row_number() OVER (PARTITION BY q_id
                  ORDER BY sk_dot DESC, n_id ASC) AS rk
              FROM sc),
      ex AS (SELECT q_id, n_id FROM (
               SELECT a.vec_id AS q_id, b.vec_id AS n_id,
                 row_number() OVER (PARTITION BY a.vec_id
                   ORDER BY ${DuckOps.dot("a.v", "b.v")} /
                     (sqrt(a.nrm) * sqrt(b.nrm)) DESC, b.vec_id ASC) AS rk2
               FROM qz a JOIN qz b ON a.vec_id < 5 AND b.vec_id <> a.vec_id)
             WHERE rk2 <= 5)
      SELECT t.q_id, CAST(t.rk AS BIGINT) AS rk, t.n_id, t.sk_dot,
        (ex.n_id IS NOT NULL) AS in_exact
      FROM top t LEFT JOIN ex ON t.q_id = ex.q_id AND t.n_id = ex.n_id
      WHERE t.rk <= 5
      ORDER BY t.q_id, t.rk"""))
}
