package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Events, Incremental, Multimodal}

/** Round-10 additions, part 4: incremental rollup maintenance
  * ([[graft.operators.Incremental]]), last-touch conversion
  * attribution ([[graft.operators.Events.lastTouchAttribution]]), and
  * scene-change keyframe detection over the real Y4M codec path
  * ([[graft.operators.Multimodal.keyframes]]).
  */
object Pipeline14 {

  def all: Seq[QueryDef] = Seq(q43, e10, m07)

  /** Incremental rollup maintenance: the (day, event_type) rollup is
    * built as TWO slice states (events before / after a mid-month
    * split) merged by the algebraic merge functions
    * ([[graft.operators.Incremental.mergeStates]]); the oracle is the
    * SINGLE-PASS aggregate over everything, so the hash match is the
    * proof that merge(state(A), state(B)) == rollup(A ∪ B). */
  val q43: QueryDef = QueryDef(
    "q43_incremental_rollup",
    (s, d) => {
      val events = Tables.events(s, d)
      val split = "2024-01-16 00:00:00"
      Incremental.mergeStates(
          Seq(
            Incremental.dailyTypeState(
              events.filter(col("ts") < lit(split).cast("timestamp")),
              "event_type", "ts", "value"),
            Incremental.dailyTypeState(
              events.filter(col("ts") >= lit(split).cast("timestamp")),
              "event_type", "ts", "value")),
          Seq("day", "event_type"))
        .orderBy(col("day"), col("event_type"))
    },
    Some("""WITH e AS (SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, event_type,
               CAST(round(value * 100) AS BIGINT) AS cents FROM events)
      SELECT day, event_type, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(cents) AS BIGINT) AS cents,
        CAST(min(cents) AS BIGINT) AS min_cents,
        CAST(max(cents) AS BIGINT) AS max_cents
      FROM e GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Last-touch attribution
    * ([[graft.operators.Events.lastTouchAttribution]]): every purchase
    * credited to the user's most recent preceding non-purchase event
    * type; per-channel conversion counts and exact cent totals. */
  val e10: QueryDef = QueryDef(
    "e10_attribution",
    (s, d) => Events.lastTouchAttribution(Tables.events(s, d),
        "event_type", "user_id", "ts", "event_id", "value", "purchase")
      .orderBy(col("channel")),
    Some("""WITH e AS (SELECT user_id, ts, event_id, event_type AS t,
               CAST(round(value * 100) AS BIGINT) AS cents FROM events),
      a AS (SELECT t, cents,
          last_value(CASE WHEN t <> 'purchase' THEN t END IGNORE NULLS)
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
        FROM e)
      SELECT touch AS channel, CAST(count(*) AS BIGINT) AS n_conversions,
        CAST(sum(cents) AS BIGINT) AS cents
      FROM a WHERE t = 'purchase' AND touch IS NOT NULL
      GROUP BY 1 ORDER BY 1"""))

  /** Keyframe detection over REAL Y4M decode
    * ([[graft.operators.Multimodal.keyframes]]): per frame the exact
    * luma-diff sum vs the previous frame and the scene-change verdict
    * at mad > 21.0 (micro units — both classes populated at both SFs).
    * The oracle replays the synthetic corpus's frame arithmetic
    * analytically (the m04 convention), so a codec or join defect
    * breaks the hash. */
  val m07: QueryDef = QueryDef(
    "m07_keyframes",
    (s, d) => Multimodal.keyframes(
        Multimodal.decodeVideoFrames(
          Multimodal.mediaFromDocuments(Tables.documents(s, d))),
        threshMicro = 21000000L)
      .orderBy(col("media_id"), col("frame_idx")),
    Some("""WITH v AS (SELECT doc_id AS mid FROM documents WHERE doc_id % 3 = 2),
      dims AS (SELECT mid, CAST(2 * (2 + mid % 14) AS BIGINT) AS sw,
                 CAST(2 * (2 + mid % 10) AS BIGINT) AS sh,
                 CAST(1 + mid % 27 AS BIGINT) AS nf FROM v),
      fr AS (SELECT mid, sw, sh, unnest(range(0, nf)) AS f FROM dims),
      d AS (SELECT mid, f, sw * sh AS np,
          CASE WHEN f = 0 THEN NULL
            ELSE CAST(list_sum(list_transform(range(0, sw * sh), i ->
              abs(((mid * 17 + f * 11 + i * 5) % 256) -
                  ((mid * 17 + (f - 1) * 11 + i * 5) % 256)))) AS BIGINT) END AS ds
        FROM fr)
      SELECT mid AS media_id, f AS frame_idx, ds AS diff_sum,
        ds * 1000000 // np AS mad_micro,
        (f = 0 OR ds * 1000000 // np > 21000000) AS is_key
      FROM d ORDER BY media_id, frame_idx"""))
}
