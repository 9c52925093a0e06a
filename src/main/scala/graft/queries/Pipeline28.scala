package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Joins, Multimodal, Retrieval, TextOps}

/** Round-10 additions, part 18: forward as-of join, sparse TF-IDF
  * pair similarity, and the per-media video motion profile.
  */
object Pipeline28 {

  def all: Seq[QueryDef] = Seq(q58, t31, m10)

  /** Forward as-of ([[graft.operators.Joins.asOfForward]]): each
    * purchase picks the user's EARLIEST error at-or-after it — the
    * "time to next failure" join, mirrored from q31's backward as-of
    * (same union+window shape, `min` over the following frame).
    * Purchases with no later error report gap −1 so the output stays
    * non-nullable. The oracle replays the semantics as a lateral min
    * subquery. */
  val q58: QueryDef = QueryDef(
    "q58_asof_forward",
    (s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts"))
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts").as("err_ts"))
      Joins.asOfForward(purchases, errors, Seq("user_id"), "ts", "err_ts")
        .selectExpr("user_id", "event_id",
          "asof_err_ts IS NOT NULL AS has_next",
          "if(asof_err_ts IS NULL, -1L," +
            " (unix_micros(asof_err_ts) - unix_micros(ts)) div 1000000) AS gap_s")
        .orderBy(col("event_id"))
    },
    Some("""WITH p AS (SELECT user_id, event_id, ts FROM events
               WHERE event_type = 'purchase'),
      er AS (SELECT user_id, ts AS err_ts FROM events WHERE event_type = 'error')
      SELECT p.user_id, p.event_id,
        n.t IS NOT NULL AS has_next,
        CASE WHEN n.t IS NULL THEN -1
          ELSE epoch_us(n.t - p.ts) // 1000000 END AS gap_s
      FROM p LEFT JOIN LATERAL (
        SELECT min(er.err_ts) AS t FROM er
        WHERE er.user_id = p.user_id AND er.err_ts >= p.ts) n ON TRUE
      ORDER BY p.event_id"""))

  /** Sparse TF-IDF pair similarity
    * ([[graft.operators.Retrieval.tfidfTopPairs]]): per-doc top-5
    * 3-shingles by the t10-style integer weight in MILLI units
    * (`tf · (n_docs·1e3 div df)` — milli, not micro, so the pairwise
    * weight product stays inside Int64 at any corpus size whose idf
    * fits 2^31), candidate pairs through the shared-shingle inverted
    * index under a df ≤ 100 prefix-filter ceiling (fan-out bounded by
    * 5·100 per doc even when every document shares a boilerplate
    * shingle — VERDICT r10 #2), scored by the exact integer dot of
    * shared weights — the sparse-vector complement of the dense
    * embedding similarity ops. Top 20 pairs. At the test SFs max
    * shingle df is 25, so the cap is semantically inert there (the
    * adversarial case is RetrievalSpec's every-doc-shares-a-header
    * corpus); the oracle mirrors the same `df <= 100` filter. */
  val t31: QueryDef = QueryDef(
    "t31_tfidf_pairs",
    (s, d) => Retrieval.tfidfTopPairs(Tables.documents(s, d),
      "doc_id", "text", topPerDoc = 5, dfCap = 100L, k = 20),
    Some(s"""WITH tk AS (SELECT doc_id, ${DuckOps.tokens("text")} AS t FROM documents),
      sh AS (SELECT doc_id, unnest(${DuckOps.shingles("t", 3)}) AS g FROM tk),
      tf AS (SELECT doc_id, g, CAST(count(*) AS BIGINT) AS tf FROM sh GROUP BY 1, 2),
      dfx AS (SELECT g, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
              HAVING count(*) <= 100),
      nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
      top AS (SELECT doc_id, g, w FROM (
          SELECT tf.doc_id, tf.g, tf.tf * ((nd.n_docs * 1000) // dfx.df) AS w,
            row_number() OVER (PARTITION BY tf.doc_id
              ORDER BY tf.tf * ((nd.n_docs * 1000) // dfx.df) DESC, tf.g) AS rk
          FROM tf JOIN dfx ON tf.g = dfx.g, nd) WHERE rk <= 5),
      pr AS (SELECT a.doc_id AS d1, b.doc_id AS d2,
               CAST(sum(a.w * b.w) AS BIGINT) AS score,
               CAST(count(*) AS BIGINT) AS n_shared
             FROM top a JOIN top b ON a.g = b.g AND a.doc_id < b.doc_id
             GROUP BY 1, 2),
      tp AS (SELECT d1, d2, n_shared, score FROM pr
             ORDER BY score DESC, d1, d2 LIMIT 20)
      SELECT CAST(row_number() OVER (ORDER BY score DESC, d1, d2) AS BIGINT) AS rk,
        d1, d2, n_shared, score
      FROM tp ORDER BY rk"""))

  /** Per-media video motion profile: m07's real-Y4M frame deltas
    * folded per media — frame count, total |Δluma| mass, peak and
    * mean per-pixel motion in micro units, keyframe count at the m07
    * threshold. The oracle nests m07's analytic chain. */
  val m10: QueryDef = QueryDef(
    "m10_video_motion",
    (s, d) => Multimodal.keyframes(
        Multimodal.decodeVideoFrames(
          Multimodal.mediaFromDocuments(Tables.documents(s, d))),
        threshMicro = 21000000L)
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(coalesce(col("diff_sum"), lit(0L))).as("total_diff"),
        max(coalesce(col("mad_micro"), lit(0L))).as("peak_mad_micro"),
        sum(when(col("is_key"), 1L).otherwise(0L)).as("n_keyframes"))
      .orderBy(col("media_id")),
    Some(s"""SELECT media_id, CAST(count(*) AS BIGINT) AS n_frames,
        CAST(sum(COALESCE(diff_sum, 0)) AS BIGINT) AS total_diff,
        CAST(max(COALESCE(mad_micro, 0)) AS BIGINT) AS peak_mad_micro,
        CAST(sum(CASE WHEN is_key THEN 1 ELSE 0 END) AS BIGINT) AS n_keyframes
      FROM (${Pipeline14.m07.oracle.get}) AS m07
      GROUP BY 1 ORDER BY 1"""))
}
