package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Incremental, Similarity}

/** Round-10 additions, part 5: sketch-based incremental distinct
  * (the holistic complement to q43's algebraic merge) and the
  * integer random-projection sketch ANN.
  */
object Pipeline15 {

  def all: Seq[QueryDef] = Seq(q44, s20)

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
