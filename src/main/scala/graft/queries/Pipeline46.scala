package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Events, TextOps}

/** Round-11 additions, part 11: per-source drift as exact
  * total-variation distance, the DAU OLS trend, and the audio
  * clipping / DC-offset audit.
  */
object Pipeline46 {

  def all: Seq[QueryDef] = Seq(t39, e33, m13)

  /** Per-source unigram drift ([[graft.operators.TextOps.sourceDriftTv]]):
    * exact TV distance to the corpus distribution — the rational
    * divergence (KL's ln has cross-engine last-ulp risk; TV stays in
    * integers end to end). */
  val t39: QueryDef = QueryDef(
    "t39_source_drift_tv",
    (s, d) => TextOps.sourceDriftTv(Tables.documents(s, d), "text", "source"),
    Some(s"""WITH tok AS (SELECT source, unnest(${DuckOps.tokens("text")}) AS term
               FROM documents),
      cst AS (SELECT source, term, CAST(count(*) AS BIGINT) AS c_st
              FROM tok GROUP BY 1, 2),
      ns AS (SELECT source, CAST(sum(c_st) AS BIGINT) AS n_s,
               CAST(count(*) AS BIGINT) AS n_terms FROM cst GROUP BY 1),
      ct AS (SELECT term, CAST(sum(c_st) AS BIGINT) AS c_t FROM cst GROUP BY 1),
      nt AS (SELECT CAST(sum(c_t) AS BIGINT) AS n_total FROM ct),
      grid AS (SELECT ns.source, ns.n_terms, ns.n_s, ct.c_t,
                 COALESCE(cst.c_st, 0) AS c_st, nt.n_total
               FROM ns CROSS JOIN ct CROSS JOIN nt
                 LEFT JOIN cst ON cst.source = ns.source AND cst.term = ct.term),
      agg AS (SELECT source, n_terms, n_s, n_total,
                sum(abs(CAST(c_st AS HUGEINT) * n_total
                  - CAST(c_t AS HUGEINT) * n_s)) AS num
              FROM grid GROUP BY 1, 2, 3, 4)
      SELECT source, n_terms AS n_terms_in_source, n_s AS n_tokens_source,
        CAST((num * 1000000) // (2 * CAST(n_s AS HUGEINT) * n_total) AS BIGINT)
          AS tv_micro
      FROM agg ORDER BY source"""))

  /** DAU OLS trend ([[graft.operators.Events.dailyActiveTrend]]):
    * exact integer moments, one micro division — growth per day. */
  val e33: QueryDef = QueryDef(
    "e33_dau_trend",
    (s, d) => Events.dailyActiveTrend(Tables.events(s, d), "user_id", "ts"),
    Some("""WITH daily AS (SELECT CAST(ts AS DATE) AS day,
               CAST(count(DISTINCT user_id) AS BIGINT) AS dau
             FROM events GROUP BY 1),
      d0 AS (SELECT min(day) AS d0 FROM daily),
      xy AS (SELECT CAST(day - d0.d0 AS BIGINT) AS x, dau AS y FROM daily, d0),
      m AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
              CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * y) AS BIGINT) AS sxy,
              CAST(sum(x * x) AS BIGINT) AS sx2 FROM xy)
      SELECT n AS n_days, sx AS sum_x, sy AS sum_y, sxy AS sum_xy,
        sx2 AS sum_x2,
        CAST(CASE WHEN CAST(n AS HUGEINT) * sx2 - CAST(sx AS HUGEINT) * sx = 0
          THEN 0
          ELSE ((CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy) * 1000000)
            // (CAST(n AS HUGEINT) * sx2 - CAST(sx AS HUGEINT) * sx)
          END AS BIGINT) AS slope_micro_per_day
      FROM m"""))

  /** Audio clipping / DC-offset audit
    * ([[graft.operators.Multimodal.clippingAudit]]) over REAL WAV
    * payloads whose generator deliberately drives samples past the
    * ±32767 rails (clamped at encode — the rail hit IS the defect
    * being detected); the oracle replays the generator + clamp
    * arithmetic analytically. */
  val m13: QueryDef = QueryDef(
    "m13_audio_clipping",
    (s, d) => {
      import s.implicits._
      import graft.operators.{MediaCodec, Multimodal}
      val media = Tables.documents(s, d).select(col("doc_id")).as[Long].map { i =>
        val n = 32 + (i % 5).toInt * 16
        val samples = Array.tabulate[Short](n) { j =>
          val v0 = ((i * 53 + j * 29) % 70000) - 35000
          math.max(-32767L, math.min(32767L, v0)).toShort
        }
        Multimodal.MediaRecord(i, "audio", "audio/vnd.wave", "synth",
          MediaCodec.encodeWav(8000, samples))
      }
      Multimodal.clippingAudit(media, 32767).toDF().orderBy(col("media_id"))
    },
    Some("""WITH sm AS (SELECT doc_id,
               GREATEST(-32767, LEAST(32767,
                 (doc_id * 53 + j * 29) % 70000 - 35000)) AS v
             FROM documents, unnest(range(0, 32 + (doc_id % 5) * 16)) AS t(j))
      SELECT doc_id AS media_id, CAST(count(*) AS BIGINT) AS n_samples,
        CAST(sum(CASE WHEN abs(v) >= 32767 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_clipped,
        CAST((CAST(sum(CASE WHEN abs(v) >= 32767 THEN 1 ELSE 0 END) AS HUGEINT)
          * 1000000) // count(*) AS BIGINT) AS clip_micro,
        CAST(sum(v) // count(*) AS BIGINT) AS dc_offset
      FROM sm GROUP BY 1 ORDER BY 1"""))
}
