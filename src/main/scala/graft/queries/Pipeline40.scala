package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Similarity

/** Round-11 additions, part 5: quantization neighborhood-preservation
  * audit.
  */
object Pipeline40 {

  def all: Seq[QueryDef] = Seq(s28)

  /** Int8 neighborhood preservation: does the 4×-smaller storage
    * format ([[graft.operators.Similarity.quantizeInt8]]) keep the
    * same nearest neighbors? Per query (every 50th vector of the
    * base id range) the exact-float cosine top-10 is compared to the
    * top-10 under the int8 path — an EXACT integer code dot
    * dequantized by the fixed chain
    * `idot·maxabs_q·maxabs_c / (127²·‖q‖·‖c‖)` and micro-quantized —
    * reporting the overlap count and micro share. The QA gate a
    * deployment runs before shipping int8 shards to the trainers
    * (measured here: overlap well above 9/10 — the s08 cos_ok bound
    * predicts it).
    *
    * 100 TB shape: both rankings broadcast the tiny pinned query
    * frame against the corpus (the s01 brute-baseline shape — swap
    * [[graft.operators.Similarity.ivfTopK]] at scale); the overlap
    * is an equi-join of two 10-row-per-query frames. The integer
    * code dot needs NO rounding contract at all; only the final
    * dequantization multiplies floats, in one fixed IEEE chain both
    * engines replay. */
  val s28: QueryDef = QueryDef(
    "s28_int8_neighborhood",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val emb = Tables.embeddings(s, d)
      val pred = "vec_id % 50 = 3 AND vec_id < 2000"
      val exact = Similarity.cosineTopKFor(emb, pred, 10)
        .select(col("q_id"), col("n_id"))
      val qz = Similarity.quantizeInt8(emb)
        .select(col("vec_id"), col("q"), col("maxabs"), col("nrm"))
      val qs = qz.filter(expr(pred))
        .selectExpr("vec_id AS q_id", "q AS qq", "maxabs AS qm", "nrm AS qn")
      val scored = broadcast(qs).join(qz, col("vec_id") =!= col("q_id"))
        .selectExpr("q_id", "vec_id AS n_id",
          // graft_dot_long == the former aggregate(zip_with(...))
          // lambda fold (exact integer sum, order-free) — native
          // while-loop instead of per-element closure dispatch
          "graft_dot_long(qq, q) AS idot",
          "qm", "maxabs AS cm", "qn", "nrm AS cn")
        .selectExpr("q_id", "n_id",
          "if(qn = 0d or cn = 0d, cast(null as bigint), " +
            "cast(round(((cast(idot as double) * qm * cm) / " +
            "(16129d * sqrt(qn) * sqrt(cn))) * 1000000) as bigint)) AS qc_micro")
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("qc_micro").desc, col("n_id").asc)
      val qtop = scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 10).select(col("q_id"), col("n_id"))
        .withColumn("hit", lit(1L))
      exact.join(qtop, Seq("q_id", "n_id"), "left")
        .groupBy(col("q_id"))
        .agg(coalesce(sum(col("hit")), lit(0L)).as("n_overlap"))
        .selectExpr("q_id", "n_overlap",
          "(n_overlap * 1000000) div 10 AS overlap_micro")
        .orderBy(col("q_id"))
    },
    Some(s"""WITH e AS (SELECT vec_id,
               list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
      n AS (SELECT vec_id, v, ${DuckOps.norm2("v")} AS nrm,
              list_reduce(list_concat([0.0::DOUBLE],
                list_transform(v, x -> abs(x))), (a, b) -> greatest(a, b))
                AS maxabs
            FROM e),
      qz AS (SELECT vec_id, nrm, maxabs,
               CASE WHEN maxabs = 0 THEN list_transform(v, x -> 0::INT)
                 ELSE list_transform(v, x -> CAST(round((x * 127) / maxabs)
                   AS INT))
               END AS q
             FROM n),
      p AS (SELECT q.vec_id AS q_id, c.vec_id AS n_id,
              CASE WHEN q.nrm = 0 OR c.nrm = 0 THEN NULL
                ELSE ${DuckOps.dot("q.v", "c.v")} / (sqrt(q.nrm) * sqrt(c.nrm))
                END AS cos
            FROM n q JOIN n c ON q.vec_id % 50 = 3 AND q.vec_id < 2000
              AND c.vec_id <> q.vec_id),
      et AS (SELECT q_id, n_id FROM (
          SELECT q_id, n_id, row_number() OVER (PARTITION BY q_id
            ORDER BY cos DESC, n_id) AS rk FROM p) WHERE rk <= 10),
      ip AS (SELECT a.vec_id AS q_id, c.vec_id AS n_id,
              CASE WHEN a.nrm = 0 OR c.nrm = 0 THEN NULL
                ELSE CAST(round(((list_reduce(list_concat([0::BIGINT],
                  list_transform(range(1, len(a.q) + 1),
                    i -> a.q[i]::BIGINT * c.q[i])), (x, y) -> x + y)::DOUBLE
                  * a.maxabs * c.maxabs) /
                  (16129 * sqrt(a.nrm) * sqrt(c.nrm))) * 1000000) AS BIGINT)
                END AS qc_micro
             FROM qz a JOIN qz c ON a.vec_id % 50 = 3 AND a.vec_id < 2000
               AND c.vec_id <> a.vec_id),
      it AS (SELECT q_id, n_id FROM (
          SELECT q_id, n_id, row_number() OVER (PARTITION BY q_id
            ORDER BY qc_micro DESC, n_id) AS rk FROM ip) WHERE rk <= 10),
      ov AS (SELECT et.q_id,
               CAST(COALESCE(sum(CASE WHEN it.n_id IS NOT NULL THEN 1
                 ELSE 0 END), 0) AS BIGINT) AS n_overlap
             FROM et LEFT JOIN it ON et.q_id = it.q_id AND et.n_id = it.n_id
             GROUP BY 1)
      SELECT q_id, n_overlap, (n_overlap * 1000000) // 10 AS overlap_micro
      FROM ov ORDER BY q_id"""))
}
