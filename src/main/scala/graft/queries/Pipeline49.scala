package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Similarity

/** Round-11 additions, part 14: Matryoshka truncation fidelity and
  * exact discrete quantiles. (cass_stream_compaction, the third
  * part-14 line, lives with the cass_* family in SparkEntry.)
  */
object Pipeline49 {

  def all: Seq[QueryDef] = Seq(s31, q67)

  /** Matryoshka truncation fidelity (Kusupati et al. 2022, arXiv:
    * 2205.13147): rank the corpus by cosine under the FIRST 16 of 64
    * dims and report per pinned query the top-10 overlap against the
    * full-dimension exact ranking — the dimension-reduction twin of
    * s28's int8 audit, and the number that decides whether truncated
    * prefixes can serve first-stage retrieval. Both rankings
    * broadcast the pinned query frame (the s01 brute-baseline
    * shape); the overlap is an equi-join of two 10-row-per-query
    * frames. */
  val s31: QueryDef = QueryDef(
    "s31_matryoshka_overlap",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val pred = "vec_id % 50 = 3 AND vec_id < 2000"
      val exact = Similarity.cosineTopKFor(emb, pred, 10)
        .select(col("q_id"), col("n_id"))
      val trunc = Similarity.cosineTopKFor(
          emb.selectExpr("vec_id", "label", "slice(embedding, 1, 16) AS embedding"),
          pred, 10)
        .select(col("q_id"), col("n_id")).withColumn("hit", lit(1L))
      exact.join(trunc, Seq("q_id", "n_id"), "left")
        .groupBy(col("q_id"))
        .agg(coalesce(sum(col("hit")), lit(0L)).as("n_overlap"))
        .selectExpr("q_id", "n_overlap",
          "(n_overlap * 1000000) div 10 AS overlap_micro")
        .orderBy(col("q_id"))
    },
    Some(s"""WITH e AS (SELECT vec_id,
               list_transform(embedding, x -> x::DOUBLE) AS v,
               list_transform(embedding[1:16], x -> x::DOUBLE) AS vt
             FROM embeddings),
      n AS (SELECT vec_id, v, vt, ${DuckOps.norm2("v")} AS nrm,
              ${DuckOps.norm2("vt")} AS nrmt FROM e),
      p AS (SELECT q.vec_id AS q_id, c.vec_id AS n_id,
              CASE WHEN q.nrm = 0 OR c.nrm = 0 THEN NULL
                ELSE ${DuckOps.dot("q.v", "c.v")} / (sqrt(q.nrm) * sqrt(c.nrm))
                END AS cos,
              CASE WHEN q.nrmt = 0 OR c.nrmt = 0 THEN NULL
                ELSE ${DuckOps.dot("q.vt", "c.vt")} / (sqrt(q.nrmt) * sqrt(c.nrmt))
                END AS cost
            FROM n q JOIN n c ON q.vec_id % 50 = 3 AND q.vec_id < 2000
              AND c.vec_id <> q.vec_id),
      et AS (SELECT q_id, n_id FROM (
          SELECT q_id, n_id, row_number() OVER (PARTITION BY q_id
            ORDER BY cos DESC, n_id) AS rk FROM p) WHERE rk <= 10),
      tt AS (SELECT q_id, n_id FROM (
          SELECT q_id, n_id, row_number() OVER (PARTITION BY q_id
            ORDER BY cost DESC, n_id) AS rk FROM p) WHERE rk <= 10),
      ov AS (SELECT et.q_id,
               CAST(COALESCE(sum(CASE WHEN tt.n_id IS NOT NULL THEN 1
                 ELSE 0 END), 0) AS BIGINT) AS n_overlap
             FROM et LEFT JOIN tt ON et.q_id = tt.q_id AND et.n_id = tt.n_id
             GROUP BY 1)
      SELECT q_id, n_overlap, (n_overlap * 1000000) // 10 AS overlap_micro
      FROM ov ORDER BY q_id"""))

  /** EXACT discrete quantiles (type-1 / lower-value, position
    * ceil(p·n) — pinned by explicit row_number in BOTH engines, so
    * no engine-native quantile definition is trusted): per return
    * flag the p10/p50/p90 of quantity as actual data values, the
    * complement of q33's interpolated percentiles. Positions are
    * exact integer ceilings ((n+9) div 10 etc.) — no floats anywhere;
    * ties on the value are harmless because the VALUE at a fixed
    * position is tie-invariant. One shuffle by flag + one window. */
  val q67: QueryDef = QueryDef(
    "q67_quantile_disc",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      Tables.lineitem(s, d)
        .selectExpr("l_returnflag AS f", "cast(l_quantity as bigint) AS v")
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("f")).orderBy(col("v"))))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("f"))))
        .selectExpr("f", "n",
          "if(rn = (n + 9) div 10, v, cast(null as bigint)) AS a",
          "if(rn = (n + 1) div 2, v, cast(null as bigint)) AS b",
          "if(rn = (9 * n + 9) div 10, v, cast(null as bigint)) AS c")
        .groupBy(col("f"), col("n"))
        .agg(max(col("a")).as("p10_disc"), max(col("b")).as("p50_disc"),
          max(col("c")).as("p90_disc"))
        .selectExpr("f AS l_returnflag", "n", "p10_disc", "p50_disc", "p90_disc")
        .orderBy(col("l_returnflag"))
    },
    Some("""WITH r AS (SELECT l_returnflag AS f,
               CAST(l_quantity AS BIGINT) AS v,
               row_number() OVER (PARTITION BY l_returnflag
                 ORDER BY CAST(l_quantity AS BIGINT)) AS rn,
               CAST(count(*) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
             FROM lineitem)
      SELECT f AS l_returnflag, n,
        CAST(max(CASE WHEN rn = (n + 9) // 10 THEN v END) AS BIGINT) AS p10_disc,
        CAST(max(CASE WHEN rn = (n + 1) // 2 THEN v END) AS BIGINT) AS p50_disc,
        CAST(max(CASE WHEN rn = (9 * n + 9) // 10 THEN v END) AS BIGINT) AS p90_disc
      FROM r GROUP BY 1, 2 ORDER BY 1"""))
}
