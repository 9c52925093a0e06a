package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Curate, Dedup, Events, Incremental, Multimodal}

/** Round-10 additions, part 4: incremental rollup maintenance
  * ([[graft.operators.Incremental]]), last-touch conversion
  * attribution ([[graft.operators.Events.lastTouchAttribution]]), and
  * scene-change keyframe detection over the real Y4M codec path
  * ([[graft.operators.Multimodal.keyframes]]).
  */
object Pipeline14 {

  def all: Seq[QueryDef] = Seq(q43, e10, m07, d11, p24)

  /** The planner-driven banding for d11: computed ONCE at class-load
    * from the S-curve analysis ([[graft.operators.Dedup.planLshBands]])
    * — recall >= 0.85 at Jaccard 0.5 with minimal noise pull-in at
    * 0.2 — and threaded into BOTH the Spark call and the generated
    * oracle, so the planner's (bands, rows) choice is itself under the
    * hash gate. */
  private val plannedSplit = Dedup.planLshBands(16, 0.5, 0.85, 0.2)
  private val PlannedBands = plannedSplit._1
  private val PlannedRows = plannedSplit._2

  /** Planner-driven MinHash-LSH pairs: d03's generator re-banded by
    * [[graft.operators.Dedup.planLshBands]] (8 bands × 2 rows here —
    * higher recall than d03's fixed 4×4, more candidates, same
    * signature pass). */
  val d11: QueryDef = QueryDef(
    "d11_planned_lsh_pairs",
    (s, d) => Dedup.minhashLshPairs(Tables.documents(s, d), "text", 3, 16,
        PlannedBands, 0.5)
      .orderBy(col("d1"), col("d2")),
    Some(s"""${Pipeline.minhashCtesFor(PlannedBands, PlannedRows)}
      SELECT d1, d2, matches, CAST(matches AS DOUBLE) / 16 AS est_jaccard
      FROM est WHERE CAST(matches AS DOUBLE) / 16 >= 0.5
      ORDER BY d1, d2"""))

  /** Token-budget corpus selection
    * ([[graft.operators.Curate.tokenBudgetSelect]]): a 12k-token
    * budget apportioned across the 20 sources by exact-integer
    * largest-remainder (Hamilton) quotas, each source filled greedily
    * in salted-hash order. The oracle replays the apportionment and
    * the running-sum cut exactly. */
  val p24: QueryDef = QueryDef(
    "p24_token_budget",
    (s, d) => Curate.tokenBudgetSelect(Tables.documents(s, d),
        "doc_id", "source", "text", budgetTokens = 12000L, salt = "graft")
      .orderBy(col("id")),
    Some(s"""WITH toks AS (SELECT doc_id AS id, source,
               CAST(len(list_filter(regexp_split_to_array(text, '[ ]+'),
                 x -> x <> '')) AS BIGINT) AS n_tokens
             FROM documents),
      ps AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS w FROM toks GROUP BY 1),
      tot AS (SELECT CAST(sum(w) AS BIGINT) AS wt FROM ps),
      qb AS (SELECT source, w, (12000 * w) // wt AS base, (12000 * w) % wt AS rem
             FROM ps, tot),
      lo AS (SELECT 12000 - CAST(sum(base) AS BIGINT) AS leftover FROM qb),
      qr AS (SELECT source, base, rem,
               row_number() OVER (ORDER BY rem DESC, source ASC) AS rk FROM qb),
      qt AS (SELECT source,
               CAST(base + CASE WHEN rk <= (SELECT leftover FROM lo)
                 THEN 1 ELSE 0 END AS BIGINT) AS quota_tokens FROM qr),
      rkd AS (SELECT id, source, n_tokens,
          CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY hkey, id
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
        FROM (SELECT id, source, n_tokens,
                ${DuckOps.strHash60("('graft:' || CAST(id AS VARCHAR))")} AS hkey
              FROM toks))
      SELECT r.id, r.source, r.n_tokens, r.cum_tokens, q.quota_tokens
      FROM rkd r JOIN qt q ON r.source = q.source
      WHERE r.cum_tokens <= q.quota_tokens
      ORDER BY r.id"""))

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
