package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Events, Profile}

/** Round-10 additions, part 2: batch event-stream analytics
  * ([[graft.operators.Events]]) — ordered conversion funnels, day
  * cohort retention, semi-structured props extraction, and daily
  * operational shares over the same `events` log the streaming
  * sessionization operators consume.
  */
object Pipeline12 {

  def all: Seq[QueryDef] = Seq(e01, e02, e03, e04, e05, e06, e07, q41, m06, t26, s19, p22)

  /** Funnel completion latency
    * ([[graft.operators.Events.funnelCompletions]]): for users who
    * complete view → click → purchase, the first-view to
    * first-qualifying-purchase latency in exact integer seconds,
    * summarized as completer count, exact percentiles (the q33
    * percentile↔quantile_cont parity), and min/max. */
  val e07: QueryDef = QueryDef(
    "e07_funnel_latency",
    (s, d) => Events.funnelCompletions(Tables.events(s, d), "event_type", "user_id",
        "ts", Seq("view", "click", "purchase"))
      .selectExpr("(unix_micros(t) - unix_micros(t0)) div 1000000 AS lat_s")
      .agg(count(lit(1)).as("n_completers"),
        expr("percentile(lat_s, 0.5)").as("p50_s"),
        expr("percentile(lat_s, 0.9)").as("p90_s"),
        min(col("lat_s")).as("min_s"),
        max(col("lat_s")).as("max_s")),
    Some("""WITH s1 AS (SELECT user_id AS uid, min(ts) AS t, min(ts) AS t0 FROM events
               WHERE event_type = 'view' GROUP BY 1),
      s2 AS (SELECT e.user_id AS uid, min(e.ts) AS t, min(s1.t0) AS t0 FROM events e
             JOIN s1 ON e.user_id = s1.uid AND e.ts > s1.t
             WHERE e.event_type = 'click' GROUP BY 1),
      s3 AS (SELECT e.user_id AS uid, min(e.ts) AS t, min(s2.t0) AS t0 FROM events e
             JOIN s2 ON e.user_id = s2.uid AND e.ts > s2.t
             WHERE e.event_type = 'purchase' GROUP BY 1),
      lat AS (SELECT epoch_us(t - t0) // 1000000 AS lat_s FROM s3)
      SELECT CAST(count(*) AS BIGINT) AS n_completers,
        quantile_cont(lat_s, 0.5) AS p50_s,
        quantile_cont(lat_s, 0.9) AS p90_s,
        CAST(min(lat_s) AS BIGINT) AS min_s,
        CAST(max(lat_s) AS BIGINT) AS max_s
      FROM lat"""))

  /** RFM segmentation ([[graft.operators.Events.rfmSegments]]):
    * per-user recency/frequency/monetary quartile scores via broadcast
    * EXACT-percentile thresholds (never a global ntile window — that
    * would collapse the user table into one sort partition). */
  val e06: QueryDef = QueryDef(
    "e06_rfm_segments",
    (s, d) => Events.rfmSegments(Tables.events(s, d), "user_id", "ts", "value")
      .orderBy(col("user_id")),
    Some("""WITH per AS (SELECT user_id, max(CAST(ts AS DATE)) AS last_d,
               CAST(count(*) AS BIGINT) AS freq,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS monetary_cents
             FROM events GROUP BY 1),
      mx AS (SELECT max(CAST(ts AS DATE)) AS corpus_max_d FROM events),
      aged AS (SELECT user_id,
                 CAST(date_diff('day', last_d, corpus_max_d) AS BIGINT) AS age_days,
                 freq, monetary_cents
               FROM per, mx),
      qs AS (SELECT quantile_cont(age_days, 0.25) AS aq1, quantile_cont(age_days, 0.5) AS aq2,
               quantile_cont(age_days, 0.75) AS aq3,
               quantile_cont(freq, 0.25) AS fq1, quantile_cont(freq, 0.5) AS fq2,
               quantile_cont(freq, 0.75) AS fq3,
               quantile_cont(monetary_cents, 0.25) AS mq1,
               quantile_cont(monetary_cents, 0.5) AS mq2,
               quantile_cont(monetary_cents, 0.75) AS mq3
             FROM aged),
      sc AS (SELECT user_id, age_days, freq, monetary_cents,
               CAST(4 - (CASE WHEN age_days > aq1 THEN 1 ELSE 0 END +
                         CASE WHEN age_days > aq2 THEN 1 ELSE 0 END +
                         CASE WHEN age_days > aq3 THEN 1 ELSE 0 END) AS BIGINT) AS r_score,
               CAST(1 + (CASE WHEN freq > fq1 THEN 1 ELSE 0 END +
                         CASE WHEN freq > fq2 THEN 1 ELSE 0 END +
                         CASE WHEN freq > fq3 THEN 1 ELSE 0 END) AS BIGINT) AS f_score,
               CAST(1 + (CASE WHEN monetary_cents > mq1 THEN 1 ELSE 0 END +
                         CASE WHEN monetary_cents > mq2 THEN 1 ELSE 0 END +
                         CASE WHEN monetary_cents > mq3 THEN 1 ELSE 0 END) AS BIGINT) AS m_score
             FROM aged, qs)
      SELECT user_id, age_days, freq, monetary_cents, r_score, f_score, m_score,
        r_score * 100 + f_score * 10 + m_score AS segment
      FROM sc ORDER BY user_id"""))

  /** Composite data selection — the "pick the training set" step that
    * STACKS three audited scoring operators: 5-gram novelty (p21),
    * bigram-LM surprisal (t20, lower = more typical), and readability
    * (t25), combined into one exact-integer selection score
    * `2·novelty + clamp(flesch, 0, 1e6) − surprisal` with a total
    * ORDER BY for a deterministic top-100 cut. Docs without shingles
    * or words drop via the inner joins (undefined scores select
    * nothing). The oracle NESTS the three generated oracle bodies as
    * derived tables (the s19 single-source-of-truth idiom): drift in
    * any component breaks both its own query and this one. */
  val p22: QueryDef = QueryDef(
    "p22_data_selection",
    (s, d) => {
      import graft.operators.{Dedup, LanguageModel, TextOps}
      // NO parallelFloor here (r16): tried — the three lineages each
      // cache/join small per-doc frames and the extra exchange
      // measured +0.5 s on two independent sheets (2.13 -> 2.71)
      val docs = Tables.documents(s, d)
      val nov = Dedup.noveltyScores(docs, "text", 5).select("doc_id", "novelty_micro")
      val flu = LanguageModel.bigramSurprisal(docs, "text", 4096)
        .select("doc_id", "mean_inv_micro")
      val rd = TextOps.readability(docs, "text").select("doc_id", "flesch_micro")
      nov.join(flu, Seq("doc_id")).join(rd, Seq("doc_id"))
        .selectExpr("doc_id", "novelty_micro", "mean_inv_micro", "flesch_micro",
          "2 * novelty_micro + greatest(0L, least(flesch_micro, 1000000L))" +
            " - mean_inv_micro AS sel_score")
        .orderBy(col("sel_score").desc, col("doc_id"))
        .limit(100)
    },
    Some(s"""WITH nov AS (SELECT doc_id, novelty_micro
               FROM (${Pipeline11.p21.oracle.get}) AS p21),
      flu AS (SELECT doc_id, mean_inv_micro
              FROM (${Pipeline9.t20.oracle.get}) AS t20),
      rd AS (SELECT doc_id, flesch_micro
             FROM (${Pipeline11.t25.oracle.get}) AS t25),
      j AS (SELECT nov.doc_id, novelty_micro, mean_inv_micro, flesch_micro,
              CAST(2 * novelty_micro + greatest(0, least(flesch_micro, 1000000))
                - mean_inv_micro AS BIGINT) AS sel_score
            FROM nov JOIN flu USING (doc_id) JOIN rd USING (doc_id))
      SELECT doc_id, novelty_micro, mean_inv_micro, flesch_micro, sel_score
      FROM j ORDER BY sel_score DESC, doc_id LIMIT 100"""))

  /** Hard-negative mining for contrastive training: documents a
    * KEYWORD retriever ranks highly (t19's exact BM25 top-5 config)
    * but whose EMBEDDING similarity to the query stays below 0.1 —
    * lexically confusable, semantically far, the classic hard-negative
    * recipe. Composition: the retrieval runs over the FITTED postings
    * artifact ([[graft.operators.Retrieval.fitPostings]] →
    * `bm25TopKWith` — VERDICT r10 #6: artifact reuse ACROSS operator
    * families; the scoring plan reads the O(postings) checkpoint
    * blocks instead of re-tokenizing the corpus) + two equi-joins
    * onto the prepared embedding frame + the micro-quantized cosine;
    * cost is O(queries·k) beyond the index build. Lifecycle: the
    * result is eagerly checkpointed BEFORE the artifact is released
    * (the t21/t16 discipline, machine-checked in CacheHygieneSpec's
    * registry sweep). The oracle nests t19's full generated CTE chain
    * as a derived table (single source of truth — any BM25 drift
    * breaks both queries identically) and joins the embedding cosine
    * the s01 way. */
  val s19: QueryDef = QueryDef(
    "s19_hard_negatives",
    (s, d) => {
      import graft.operators.{Retrieval, Similarity, Storage}
      val docs = Tables.documents(s, d)
      val qs = docs.filter(col("doc_id") % 100 === 7 && col("doc_id") < 5000)
        .select(col("doc_id").as("q_id"), col("text"))
      val idx = Retrieval.fitPostings(docs, "text")
      try {
        val bm = Retrieval.bm25TopKWith(idx, qs, "text", k = 5, maxQueryTerms = 6)
        val p = Similarity.prepared(Tables.embeddings(s, d)).select("vec_id", "v", "nrm")
        Storage.checkpointed(
          bm.join(p.select(col("vec_id").as("q_id"), col("v").as("qv"),
              col("nrm").as("qn")), Seq("q_id"))
            .join(p.select(col("vec_id").as("doc_id"), col("v").as("dv"),
              col("nrm").as("dn")), Seq("doc_id"))
            .selectExpr("q_id", "rnk", "doc_id", "score_micro",
              s"cast(round((${Similarity.cosExpr.format("qv", "dv", "qn", "dn")}) * 1000000)" +
                " as bigint) AS cos_micro")
            .withColumn("hard_neg",
              col("cos_micro") < 100000L && col("doc_id") =!= col("q_id"))
            .orderBy(col("q_id"), col("rnk")))
      } finally idx.release()
    },
    Some(s"""WITH bm AS (SELECT q_id, rnk, doc_id, score_micro
               FROM (${Pipeline9.t19.oracle.get}) AS t19),
      ev AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
             FROM embeddings),
      nn AS (SELECT vec_id, v, ${DuckOps.norm2("v")} AS nrm FROM ev),
      j AS (SELECT bm.q_id, bm.rnk, bm.doc_id, bm.score_micro,
              CAST(round((CASE WHEN q.nrm = 0 OR c.nrm = 0 THEN NULL
                ELSE ${DuckOps.dot("q.v", "c.v")} / (sqrt(q.nrm) * sqrt(c.nrm)) END)
                * 1000000) AS BIGINT) AS cos_micro
            FROM bm JOIN nn q ON bm.q_id = q.vec_id
                    JOIN nn c ON bm.doc_id = c.vec_id)
      SELECT q_id, rnk, doc_id, score_micro, cos_micro,
        cos_micro < 100000 AND doc_id <> q_id AS hard_neg
      FROM j ORDER BY q_id, rnk"""))

  /** Per-DOCUMENT keyword extraction: top-3 terms by exact-integer
    * tf·idf (t10's log-free idf, partitioned per doc instead of per
    * source — the document-tagging face of the same machinery). The
    * per-doc window partitions on the high-cardinality doc_id, so no
    * partition holds more than one doc's vocabulary. */
  val t26: QueryDef = QueryDef(
    "t26_doc_keywords",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      val tok = docs.selectExpr("doc_id",
        s"explode(${graft.operators.TextOps.tokens("text")}) AS token")
      val dfTbl = tok.distinct().groupBy(col("token")).agg(count(lit(1)).as("df"))
      val tfTbl = tok.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      tfTbl.join(dfTbl, Seq("token"))
        .crossJoin(broadcast(nDocs))
        .selectExpr("doc_id", "token", "tf", "df",
          "tf * ((n_docs * 1000000) div df) AS score_micro")
        .withColumn("rk",
          row_number().over(Window.partitionBy(col("doc_id"))
            .orderBy(col("score_micro").desc, col("token"))).cast("long"))
        .filter(col("rk") <= 3)
        .select(col("doc_id"), col("rk"), col("token"), col("tf"),
          col("df"), col("score_micro"))
        .orderBy(col("doc_id"), col("rk"))
    },
    Some(s"""WITH tok AS (SELECT doc_id, unnest(${DuckOps.tokens("text")}) AS token
               FROM documents),
      dfx AS (SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
              FROM tok GROUP BY token),
      tfx AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
      n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
      sc AS (SELECT doc_id, token, tf, df,
               tf * ((n_docs * 1000000) // df) AS score_micro,
               row_number() OVER (PARTITION BY doc_id
                 ORDER BY tf * ((n_docs * 1000000) // df) DESC, token) AS rk
             FROM tfx JOIN dfx USING (token), n)
      SELECT doc_id, CAST(rk AS BIGINT) AS rk, token, tf, df, score_micro
      FROM sc WHERE rk <= 3 ORDER BY doc_id, rk"""))

  /** Audio silence trimming ([[graft.operators.Multimodal.trimSilence]])
    * over REAL WAV bytes built in-query: per doc_id the clip carries
    * (id%5) silent lead frames, 4 body frames (silent too when
    * id%7=0 — the all-silent path), and (id%3) silent tail frames,
    * 16 samples each; body samples 20000+(id*37+j*13)%1000 are far
    * above the mean-|sample| threshold 1000. The payload goes through
    * the actual PCM16 encode → decode → frame-scan path; the oracle
    * recomputes the frame profile analytically from the id formulas —
    * a mismatch anywhere in the WAV codec or the trim scan breaks the
    * hash. */
  val m06: QueryDef = QueryDef(
    "m06_silence_trim",
    (s, d) => {
      import s.implicits._
      import graft.operators.{MediaCodec, Multimodal}
      val media = Tables.documents(s, d).select(col("doc_id")).as[Long].map { i =>
        val lead = (i % 5).toInt
        val tail = (i % 3).toInt
        val silentBody = i % 7 == 0
        val samples = new Array[Short]((lead + 4 + tail) * 16)
        if (!silentBody) {
          var j = 0
          while (j < 4 * 16) {
            samples(lead * 16 + j) = (20000 + (i * 37 + j * 13) % 1000).toShort
            j += 1
          }
        }
        Multimodal.MediaRecord(i, "audio", "audio/vnd.wave", "synth",
          MediaCodec.encodeWav(8000, samples))
      }
      Multimodal.trimSilence(media, frameSamples = 16, thresholdMeanAbs = 1000L)
        .toDF()
        .orderBy(col("media_id"))
    },
    Some("""SELECT doc_id AS media_id,
        CAST((doc_id % 5) + 4 + (doc_id % 3) AS BIGINT) AS n_frames,
        CAST(CASE WHEN doc_id % 7 = 0 THEN (doc_id % 5) + 4 + (doc_id % 3)
                  ELSE doc_id % 5 END AS BIGINT) AS lead_silent,
        CAST(CASE WHEN doc_id % 7 = 0 THEN 0 ELSE doc_id % 3 END AS BIGINT) AS tail_silent,
        CAST(CASE WHEN doc_id % 7 = 0 THEN 0 ELSE 4 END AS BIGINT) AS kept_frames
      FROM documents ORDER BY media_id"""))

  /** Session-scoped funnel ([[graft.operators.Events.sessionFunnel]]):
    * the e01 chain must complete within one 30-minute-gap session.
    * The oracle composes the st01 gaps-and-islands CTE with the e01
    * frontier chain keyed by (user, session). */
  val e05: QueryDef = QueryDef(
    "e05_session_funnel",
    (s, d) => Events.sessionFunnel(Tables.events(s, d), "event_type", "user_id",
        "ts", Seq("view", "click", "purchase"), gapMinutes = 30)
      .orderBy(col("stage_idx")),
    Some("""WITH e AS (SELECT user_id, event_type, ts, epoch_ms(ts) AS t FROM events),
      flagged AS (SELECT user_id, event_type, ts, t,
          CASE WHEN t - lag(t) OVER w > 1800000 OR lag(t) OVER w IS NULL
               THEN 1 ELSE 0 END AS ns
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)),
      numbered AS (SELECT user_id, event_type, ts,
          sum(ns) OVER (PARTITION BY user_id ORDER BY t
                        ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged),
      s1 AS (SELECT user_id, sid, min(ts) AS t FROM numbered
             WHERE event_type = 'view' GROUP BY 1, 2),
      s2 AS (SELECT n.user_id, n.sid, min(n.ts) AS t FROM numbered n
             JOIN s1 ON n.user_id = s1.user_id AND n.sid = s1.sid AND n.ts > s1.t
             WHERE n.event_type = 'click' GROUP BY 1, 2),
      s3 AS (SELECT n.user_id, n.sid, min(n.ts) AS t FROM numbered n
             JOIN s2 ON n.user_id = s2.user_id AND n.sid = s2.sid AND n.ts > s2.t
             WHERE n.event_type = 'purchase' GROUP BY 1, 2)
      SELECT * FROM (
        SELECT CAST(1 AS BIGINT) AS stage_idx, 'view' AS stage,
          CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_sessions
        UNION ALL
        SELECT CAST(2 AS BIGINT), 'click', CAST((SELECT count(*) FROM s2) AS BIGINT)
        UNION ALL
        SELECT CAST(3 AS BIGINT), 'purchase', CAST((SELECT count(*) FROM s3) AS BIGINT))
      ORDER BY stage_idx"""))

  /** Column profiling ([[graft.operators.Profile.profile]]) over five
    * lineitem columns of engine-portable render types (int / string /
    * date): row count, null count, EXACT distinct count, min/max
    * strings — per member one single-column pruned scan into a
    * two-level (value-histogram → 1-row fold) aggregation; no Expand
    * (PlanAudit-asserted, VERDICT r11 #1). */
  val q41: QueryDef = QueryDef(
    "q41_profile",
    (s, d) => Profile.profile(Tables.lineitem(s, d),
        Seq("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus", "l_shipdate"))
      .orderBy(col("column_name")),
    Some(Seq("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus", "l_shipdate")
      .map(c => s"""SELECT '$c' AS column_name,
          CAST(count(*) AS BIGINT) AS n_rows,
          CAST(count(*) - count($c) AS BIGINT) AS n_nulls,
          CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
          CAST(min($c) AS VARCHAR) AS min_val,
          CAST(max($c) AS VARCHAR) AS max_val
        FROM lineitem""")
      .mkString("SELECT * FROM (", " UNION ALL ", ") ORDER BY column_name")))

  /** view → click → purchase ordered funnel
    * ([[graft.operators.Events.funnel]]): stage i counts users whose
    * earliest stage-i event is STRICTLY after their stage-(i−1) time.
    * The oracle chains the same min-after frontier as CTEs. */
  val e01: QueryDef = QueryDef(
    "e01_funnel",
    (s, d) => Events.funnel(Tables.events(s, d), "event_type", "user_id", "ts",
        Seq("view", "click", "purchase"))
      .orderBy(col("stage_idx")),
    Some("""WITH s1 AS (SELECT user_id AS uid, min(ts) AS t FROM events
               WHERE event_type = 'view' GROUP BY 1),
      s2 AS (SELECT e.user_id AS uid, min(e.ts) AS t FROM events e
             JOIN s1 ON e.user_id = s1.uid AND e.ts > s1.t
             WHERE e.event_type = 'click' GROUP BY 1),
      s3 AS (SELECT e.user_id AS uid, min(e.ts) AS t FROM events e
             JOIN s2 ON e.user_id = s2.uid AND e.ts > s2.t
             WHERE e.event_type = 'purchase' GROUP BY 1)
      SELECT * FROM (
        SELECT CAST(1 AS BIGINT) AS stage_idx, 'view' AS stage,
          CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_users
        UNION ALL
        SELECT CAST(2 AS BIGINT), 'click', CAST((SELECT count(*) FROM s2) AS BIGINT)
        UNION ALL
        SELECT CAST(3 AS BIGINT), 'purchase', CAST((SELECT count(*) FROM s3) AS BIGINT))
      ORDER BY stage_idx"""))

  /** Day-grain retention cohorts
    * ([[graft.operators.Events.retentionCohorts]]), offsets 0–7:
    * users bucketed by first active day, counted per later active
    * day-offset. */
  val e02: QueryDef = QueryDef(
    "e02_retention",
    (s, d) => Events.retentionCohorts(Tables.events(s, d), "user_id", "ts", 7)
      .orderBy(col("cohort_day"), col("day_offset")),
    Some("""WITH f AS (SELECT user_id AS uid, min(CAST(ts AS DATE)) AS d0
               FROM events GROUP BY 1),
      a AS (SELECT DISTINCT user_id AS uid, CAST(ts AS DATE) AS d FROM events),
      j AS (SELECT d0, date_diff('day', d0, d) AS day_offset FROM a JOIN f USING (uid))
      SELECT CAST(d0 AS VARCHAR) AS cohort_day,
        CAST(day_offset AS BIGINT) AS day_offset,
        CAST(count(*) AS BIGINT) AS n_users
      FROM j WHERE day_offset BETWEEN 0 AND 7
      GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Per-type integer stats of the `k` key extracted from the
    * JSON-ish props column ([[graft.operators.Events.propsKeyStats]])
    * via an engine-portable regex. */
  val e03: QueryDef = QueryDef(
    "e03_props_stats",
    (s, d) => Events.propsKeyStats(Tables.events(s, d), "event_type", "props", "k")
      .orderBy(col("event_type")),
    Some("""WITH x AS (SELECT event_type,
               TRY_CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT) AS kv
             FROM events)
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        CAST(count(kv) AS BIGINT) AS n_with_key,
        CAST(COALESCE(sum(kv), 0) AS BIGINT) AS k_sum,
        min(kv) AS k_min, max(kv) AS k_max
      FROM x GROUP BY 1 ORDER BY 1"""))

  /** Daily error share in exact micro units
    * ([[graft.operators.Events.dailyTypeShare]]). */
  val e04: QueryDef = QueryDef(
    "e04_daily_error_share",
    (s, d) => Events.dailyTypeShare(Tables.events(s, d), "event_type", "ts", "error")
      .orderBy(col("day")),
    Some("""WITH d AS (SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
               CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS hit FROM events)
      SELECT day, CAST(count(*) AS BIGINT) AS n_events,
        CAST(sum(hit) AS BIGINT) AS n_match,
        CAST((sum(hit) * 1000000) // count(*) AS BIGINT) AS share_micro
      FROM d GROUP BY 1 ORDER BY 1"""))
}
