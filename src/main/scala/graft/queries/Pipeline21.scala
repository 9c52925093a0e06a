package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Similarity

/** Round-10 additions, part 11: per-frame audio loudness over the
  * real WAV codec, inter-arrival burstiness stats, and the IVF
  * probe-count recall sweep (the ANN tuning curve).
  */
object Pipeline21 {

  def all: Seq[QueryDef] = Seq(m09, e20, s23)

  /** Per-frame loudness ([[graft.operators.Multimodal.frameEnergies]])
    * over REAL WAV payloads synthesized through the in-tree codec:
    * exact integer energy and mean-|sample| per 16-sample frame; the
    * oracle recomputes both from the sample formula analytically, so
    * the hash proves encode → decode → frame → integer-reduce loses
    * nothing. */
  val m09: QueryDef = QueryDef(
    "m09_frame_loudness",
    (s, d) => {
      import s.implicits._
      import graft.operators.{MediaCodec, Multimodal}
      val media = Tables.documents(s, d).select(col("doc_id")).as[Long].map { i =>
        val n = (2 + (i % 3).toInt) * 16
        val samples = Array.tabulate[Short](n)(j =>
          (((i * 37 + j * 13) % 2000) - 1000).toShort)
        Multimodal.MediaRecord(i, "audio", "audio/vnd.wave", "synth",
          MediaCodec.encodeWav(8000, samples))
      }
      Multimodal.frameEnergies(media, frameSamples = 16).toDF()
        .orderBy(col("media_id"), col("frame_idx"))
    },
    Some("""WITH fr AS (SELECT doc_id, f
               FROM documents, unnest(range(0, 2 + doc_id % 3)) AS t(f)),
      sm AS (SELECT doc_id, f,
               ((doc_id * 37 + (f * 16 + k) * 13) % 2000 - 1000) AS v
             FROM fr, unnest(range(0, 16)) AS u(k))
      SELECT doc_id AS media_id, CAST(f AS BIGINT) AS frame_idx,
        CAST(sum(v * v) AS BIGINT) // 16 AS energy,
        CAST(sum(abs(v)) AS BIGINT) // 16 AS mean_abs
      FROM sm GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Inter-arrival burstiness: per event type the distribution of
    * same-user consecutive gaps in exact integer microseconds —
    * count, interpolated p50/p90 (the q33 percentile parity), min and
    * max. ONE user-keyed window shuffle (the lag), then a T-row
    * partial agg. */
  val e20: QueryDef = QueryDef(
    "e20_interarrival",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("prev", lag(col("ts"), 1).over(w))
        .filter(col("prev").isNotNull)
        .selectExpr("event_type",
          "(unix_micros(ts) - unix_micros(prev)) AS gap_us")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_gaps"),
          expr("percentile(gap_us, 0.5)").as("p50_us"),
          expr("percentile(gap_us, 0.9)").as("p90_us"),
          min(col("gap_us")).as("min_us"),
          max(col("gap_us")).as("max_us"))
        .orderBy(col("event_type"))
    },
    Some("""WITH g AS (SELECT event_type,
               epoch_us(ts - lag(ts) OVER (PARTITION BY user_id, event_type
                 ORDER BY ts, event_id)) AS gap_us
             FROM events)
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
        quantile_cont(gap_us, 0.5) AS p50_us,
        quantile_cont(gap_us, 0.9) AS p90_us,
        CAST(min(gap_us) AS BIGINT) AS min_us,
        CAST(max(gap_us) AS BIGINT) AS max_us
      FROM g WHERE gap_us IS NOT NULL
      GROUP BY 1 ORDER BY 1"""))

  /** The shared oracle prefix for [[s23]]: exact top-3 (`x`),
    * centroids (`cc`), full assignment (`asg`). */
  private def sweepPrefix: String =
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
                   FROM embeddings),
      n AS (SELECT vec_id, v, ${DuckOps.norm2("v")} AS nrm FROM e),
      px AS (SELECT a.vec_id AS q_id, b.vec_id AS n_id,
              ${DuckOps.dot("a.v", "b.v")} / (sqrt(a.nrm) * sqrt(b.nrm)) AS cos
            FROM n a JOIN n b ON a.vec_id < 10 AND b.vec_id <> a.vec_id),
      x AS (SELECT q_id, n_id FROM (
              SELECT q_id, n_id,
                row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rk
              FROM px) WHERE rk <= 3),
      cc AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n WHERE vec_id < 16),
      asg AS (SELECT vec_id, v, nrm, cid AS centroid FROM (
          SELECT a.vec_id, a.v, a.nrm, cc.cid,
            row_number() OVER (PARTITION BY a.vec_id
              ORDER BY ${DuckOps.dot("a.v", "cc.cv")} / (sqrt(a.nrm) * sqrt(cc.cn)) DESC,
                       cc.cid ASC) AS rn
          FROM n a CROSS JOIN cc
          WHERE NOT isnan(${DuckOps.dot("a.v", "cc.cv")} / (sqrt(a.nrm) * sqrt(cc.cn)))) WHERE rn = 1),
      qr AS (SELECT q_id, qv, qn, qcentroid, rn FROM (
          SELECT a.vec_id AS q_id, a.v AS qv, a.nrm AS qn, cc.cid AS qcentroid,
            row_number() OVER (PARTITION BY a.vec_id
              ORDER BY ${DuckOps.dot("a.v", "cc.cv")} / (sqrt(a.nrm) * sqrt(cc.cn)) DESC,
                       cc.cid ASC) AS rn
          FROM n a CROSS JOIN cc WHERE a.vec_id < 10
            AND NOT isnan(${DuckOps.dot("a.v", "cc.cv")} / (sqrt(a.nrm) * sqrt(cc.cn)))))"""

  /** One per-probe-count branch of the [[s23]] oracle. */
  private def sweepBranch(p: Int): String =
    s"""scored_$p AS (SELECT DISTINCT q.q_id, s.vec_id AS n_id,
          ${DuckOps.dot("q.qv", "s.v")} / (sqrt(q.qn) * sqrt(s.nrm)) AS cos
        FROM qr q JOIN asg s
        ON q.rn <= $p AND q.qcentroid = s.centroid AND s.vec_id <> q.q_id),
      y_$p AS (SELECT q_id, n_id FROM (
              SELECT q_id, n_id,
                row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rk
              FROM scored_$p) WHERE rk <= 3),
      s_$p AS (SELECT CAST($p AS BIGINT) AS probes,
          CAST(count(*) AS BIGINT) AS n_exact,
          CAST(count(y.n_id) AS BIGINT) AS n_overlap
        FROM x LEFT JOIN y_$p y ON x.q_id = y.q_id AND x.n_id = y.n_id)"""

  /** IVF probe-count recall sweep — the ANN tuning curve: for
    * nprobe ∈ {1, 2, 4}, overlap of s04's IVF top-3 against the
    * brute-force exact top-3 as one 3-row table (probes, n_exact,
    * n_overlap, recall_micro). Recall must be monotone in probes by
    * construction — the property a capacity planner reads off. */
  val s23: QueryDef = QueryDef(
    "s23_probe_sweep",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val exact = Similarity.cosineTopK(emb, 10, 3)
        .select(col("q_id"), col("n_id"))
      def sweep(p: Int) = {
        val ivf = Similarity.ivfTopK(emb, 10, 3, 16, p)
          .select(col("q_id").as("iq"), col("n_id").as("inid"))
        exact.join(ivf,
            col("q_id") === col("iq") && col("n_id") === col("inid"), "left")
          .agg(count(lit(1)).as("n_exact"), count(col("inid")).as("n_overlap"))
          .selectExpr(s"cast($p as bigint) AS probes", "n_exact", "n_overlap",
            "(n_overlap * 1000000) div n_exact AS recall_micro")
      }
      Seq(1, 2, 4).map(sweep).reduce(_.unionByName(_)).orderBy(col("probes"))
    },
    Some(s"""$sweepPrefix,
      ${Seq(1, 2, 4).map(sweepBranch).mkString(",\n      ")}
      SELECT probes, n_exact, n_overlap,
        (n_overlap * 1000000) // n_exact AS recall_micro
      FROM (SELECT * FROM s_1 UNION ALL SELECT * FROM s_2
            UNION ALL SELECT * FROM s_4)
      ORDER BY probes"""))
}
