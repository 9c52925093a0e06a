package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Dedup, Events, TextOps}

/** Round-11 additions, part 1: the six reserved-and-abandoned
  * registry ids from rounds 9–10, filled (VERDICT r10 missing #3 /
  * Next #5) — per-source duplicate rate (d18), mix shift under dedup
  * (p20), per-source eval contamination (p23), token-length profile
  * (t34), session-length histogram (e25), and event-type
  * co-occurrence lift (e26).
  */
object Pipeline36 {

  def all: Seq[QueryDef] = Seq(d18, p20, p23, t34, e25, e26)

  /** Per-source exact-duplicate rate: each document fingerprinted the
    * d01 way (60-bit content hash), a doc is a DUPLICATE when it is
    * not its fingerprint group's keeper (min doc_id), and each source
    * reports its doc count, duplicate count, and duplicate share in
    * exact micro units — the provenance-level dedup evidence (which
    * crawls are self-copying) beside d19's cluster-spread view.
    *
    * 100 TB shape: one fingerprint partial agg (the d01 frame), one
    * equi-join back on the fingerprint, one source-keyed partial agg;
    * the micro share is 128-bit safe (decimal(38) / HUGEINT). */
  val d18: QueryDef = QueryDef(
    "d18_source_dup_rate",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val fp = docs.selectExpr("doc_id", "source",
        s"${TextOps.strHash60("text")} AS fp")
      val keepers = Dedup.exactGroups(docs, "text").select("fp", "keeper")
      fp.join(keepers, Seq("fp"))
        .selectExpr("source", "if(doc_id != keeper, 1L, 0L) AS is_dup")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("is_dup")).as("n_dupes"))
        .selectExpr("source", "n_docs", "n_dupes",
          "cast((cast(n_dupes as decimal(38,0)) * 1000000) div n_docs" +
            " as bigint) AS dup_micro")
        .orderBy(col("source"))
    },
    Some(s"""WITH fp AS (SELECT doc_id, source,
               ${DuckOps.strHash60("text")} AS fp FROM documents),
      g AS (SELECT fp, min(doc_id) AS keeper FROM fp GROUP BY 1),
      m AS (SELECT source,
              CASE WHEN fp.doc_id <> g.keeper THEN 1 ELSE 0 END AS is_dup
            FROM fp JOIN g USING (fp)),
      a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(is_dup) AS BIGINT) AS n_dupes
            FROM m GROUP BY 1)
      SELECT source, n_docs, n_dupes,
        CAST((CAST(n_dupes AS HUGEINT) * 1000000) // n_docs AS BIGINT)
          AS dup_micro
      FROM a ORDER BY source"""))

  /** Source-mix shift under exact dedup: per source the whitespace
    * token mass BEFORE and AFTER keeping only fingerprint keepers,
    * each source's micro share of both corpora, and the share delta —
    * the "does dedup silently reweight my training mix" audit that
    * sits between d01 (what is duplicated) and p02/p16 (what mix to
    * train on).
    *
    * 100 TB shape: fingerprint partial agg + equi-join back (the d18
    * frame), one source-keyed partial agg carrying both masses, a
    * 1-row broadcast total; 128-bit share arithmetic throughout. */
  val p20: QueryDef = QueryDef(
    "p20_mix_after_dedup",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val fp = docs.selectExpr("doc_id", "source",
        s"${TextOps.strHash60("text")} AS fp",
        "cast(size(filter(split(text, '[ ]+'), x -> x != '')) as bigint)" +
          " AS n_tokens")
      val keepers = Dedup.exactGroups(docs, "text").select("fp", "keeper")
      val per = fp.join(keepers, Seq("fp"))
        .selectExpr("source", "n_tokens",
          "if(doc_id = keeper, n_tokens, 0L) AS kept_tokens")
        .groupBy(col("source"))
        .agg(sum(col("n_tokens")).as("tokens_before"),
          sum(col("kept_tokens")).as("tokens_after"))
      val tot = per.agg(sum(col("tokens_before")).as("tb"),
        sum(col("tokens_after")).as("ta"))
      per.crossJoin(broadcast(tot))
        .selectExpr("source", "tokens_before", "tokens_after",
          "cast((cast(tokens_before as decimal(38,0)) * 1000000) div tb" +
            " as bigint) AS share_before_micro",
          "cast((cast(tokens_after as decimal(38,0)) * 1000000) div ta" +
            " as bigint) AS share_after_micro")
        .selectExpr("source", "tokens_before", "tokens_after",
          "share_before_micro", "share_after_micro",
          "share_after_micro - share_before_micro AS shift_micro")
        .orderBy(col("source"))
    },
    Some(s"""WITH fp AS (SELECT doc_id, source, ${DuckOps.strHash60("text")} AS fp,
               CAST(len(list_filter(regexp_split_to_array(text, '[ ]+'),
                 x -> x <> '')) AS BIGINT) AS n_tokens
             FROM documents),
      g AS (SELECT fp, min(doc_id) AS keeper FROM fp GROUP BY 1),
      per AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS tokens_before,
                CAST(sum(CASE WHEN fp.doc_id = g.keeper THEN n_tokens
                  ELSE 0 END) AS BIGINT) AS tokens_after
              FROM fp JOIN g USING (fp) GROUP BY 1),
      tot AS (SELECT CAST(sum(tokens_before) AS BIGINT) AS tb,
                CAST(sum(tokens_after) AS BIGINT) AS ta FROM per),
      sh AS (SELECT source, tokens_before, tokens_after,
               CAST((CAST(tokens_before AS HUGEINT) * 1000000) // tb
                 AS BIGINT) AS share_before_micro,
               CAST((CAST(tokens_after AS HUGEINT) * 1000000) // ta
                 AS BIGINT) AS share_after_micro
             FROM per, tot)
      SELECT source, tokens_before, tokens_after, share_before_micro,
        share_after_micro,
        share_after_micro - share_before_micro AS shift_micro
      FROM sh ORDER BY source"""))

  /** Per-source eval contamination rate: t05's n-gram-overlap check
    * rolled up to the release-gate grain — a corpus doc
    * (doc_id >= 50) is CONTAMINATED when it shares >= 1 distinct
    * 5-shingle hash with any benchmark doc (doc_id < 50, t05's eval
    * stand-in), and each source reports its corpus docs, contaminated
    * docs, and contamination share in micro units.
    *
    * 100 TB shape: the benchmark shingle set is tiny and BROADCAST
    * (t05's audited shape), so the corpus side is a map-side hash
    * semi-join over exploded hashes; hits dedup to one row per doc
    * before the source-keyed partial agg. */
  val p23: QueryDef = QueryDef(
    "p23_source_contamination",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val sh = Dedup.shingleHashSets(docs, "text", 5)
        .selectExpr("doc_id", "explode_outer(hs) AS sgl")
      val bench = sh.filter(col("doc_id") < 50).select(col("sgl")).distinct()
      val hits = sh.filter(col("doc_id") >= 50)
        .join(broadcast(bench), Seq("sgl"))
        .select(col("doc_id")).distinct()
        .withColumn("hit", lit(1L))
      docs.filter(col("doc_id") >= 50).select(col("doc_id"), col("source"))
        .join(hits, Seq("doc_id"), "left")
        .selectExpr("source", "coalesce(hit, 0L) AS hit")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("hit")).as("n_contaminated"))
        .selectExpr("source", "n_docs", "n_contaminated",
          "cast((cast(n_contaminated as decimal(38,0)) * 1000000) div n_docs" +
            " as bigint) AS contamination_micro")
        .orderBy(col("source"))
    },
    Some(s"""WITH toks AS (SELECT doc_id, ${DuckOps.tokens("text")} AS t
               FROM documents),
      sh AS (SELECT doc_id, ${DuckOps.shingles("t", 5)} AS s FROM toks),
      e AS (SELECT doc_id, unnest(list_distinct(
              list_transform(s, x -> ${DuckOps.strHash60("x")}))) AS sgl FROM sh),
      bench AS (SELECT DISTINCT sgl FROM e WHERE doc_id < 50),
      hits AS (SELECT DISTINCT e.doc_id FROM e JOIN bench USING (sgl)
               WHERE e.doc_id >= 50),
      m AS (SELECT d.source,
              CASE WHEN h.doc_id IS NULL THEN 0 ELSE 1 END AS hit
            FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
            WHERE d.doc_id >= 50),
      a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(hit) AS BIGINT) AS n_contaminated
            FROM m GROUP BY 1)
      SELECT source, n_docs, n_contaminated,
        CAST((CAST(n_contaminated AS HUGEINT) * 1000000) // n_docs AS BIGINT)
          AS contamination_micro
      FROM a ORDER BY source"""))

  /** Corpus token-length profile: per token character length the
    * occurrence count, distinct-token count, and micro share of all
    * occurrences — the tokenizer-design histogram (how much mass a
    * max-token-length cap would truncate) beside t03's per-doc counts
    * and t35's per-char classes.
    *
    * 100 TB shape: one tokenize+explode pass into a length-keyed
    * partial agg (distinct tokens via one per-length distinct), then
    * a 1-row broadcast total over the tiny length domain. */
  val t34: QueryDef = QueryDef(
    "t34_token_len_profile",
    (s, d) => {
      val tok = Tables.documents(s, d)
        .selectExpr(s"explode(${TextOps.tokens("text")}) AS tk")
        .selectExpr("cast(length(tk) as bigint) AS len", "tk")
      val per = tok.groupBy(col("len"))
        .agg(count(lit(1)).as("n_tokens"),
          count_distinct(col("tk")).as("n_distinct"))
      val tot = per.agg(sum(col("n_tokens")).as("total"))
      per.crossJoin(broadcast(tot))
        .selectExpr("len", "n_tokens", "n_distinct",
          "cast((cast(n_tokens as decimal(38,0)) * 1000000) div total" +
            " as bigint) AS share_micro")
        .orderBy(col("len"))
    },
    Some(s"""WITH tk AS (SELECT unnest(${DuckOps.tokens("text")}) AS tk
               FROM documents),
      per AS (SELECT CAST(length(tk) AS BIGINT) AS len,
                CAST(count(*) AS BIGINT) AS n_tokens,
                CAST(count(DISTINCT tk) AS BIGINT) AS n_distinct
              FROM tk GROUP BY 1),
      tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total FROM per)
      SELECT len, n_tokens, n_distinct,
        CAST((CAST(n_tokens AS HUGEINT) * 1000000) // total AS BIGINT)
          AS share_micro
      FROM per, tot ORDER BY len"""))

  /** Session-length histogram
    * ([[graft.operators.Events.sessionLengthHistogram]], 30-minute
    * inactivity gap): sessions bucketed by event count with each
    * bucket's micro share of all sessions. */
  val e25: QueryDef = QueryDef(
    "e25_session_histogram",
    (s, d) => Events.sessionLengthHistogram(Tables.events(s, d),
      "user_id", "ts", "event_id", gapSeconds = 1800L),
    Some("""WITH o AS (SELECT user_id AS uid, ts, event_id AS eid FROM events),
      l AS (SELECT uid, ts, eid,
              lag(ts) OVER (PARTITION BY uid ORDER BY ts, eid) AS prev
            FROM o),
      f AS (SELECT uid, ts, eid,
              CASE WHEN prev IS NULL OR epoch_us(ts - prev) > 1800000000
                THEN 1 ELSE 0 END AS new_sess
            FROM l),
      sess AS (SELECT uid, CAST(sum(new_sess) OVER (PARTITION BY uid
                 ORDER BY ts, eid ROWS UNBOUNDED PRECEDING) AS BIGINT)
                 AS sess_id
               FROM f),
      c AS (SELECT uid, sess_id, CAST(count(*) AS BIGINT) AS n_events
            FROM sess GROUP BY 1, 2),
      h AS (SELECT n_events, CAST(count(*) AS BIGINT) AS n_sessions
            FROM c GROUP BY 1),
      tot AS (SELECT CAST(sum(n_sessions) AS BIGINT) AS total FROM h)
      SELECT n_events, n_sessions,
        CAST((CAST(n_sessions AS HUGEINT) * 1000000) // total AS BIGINT)
          AS share_micro
      FROM h, tot ORDER BY n_events"""))

  /** Event-type co-occurrence lift
    * ([[graft.operators.Events.typeCooccurrence]]) over the
    * (user, day) grain: which event types travel together, in exact
    * integer lift. */
  val e26: QueryDef = QueryDef(
    "e26_type_cooccurrence",
    (s, d) => Events.typeCooccurrence(Tables.events(s, d),
      "event_type", "user_id", "ts"),
    Some("""WITH g AS (SELECT DISTINCT user_id AS uid,
               CAST(CAST(ts AS DATE) AS VARCHAR) AS day, event_type AS et
             FROM events),
      per AS (SELECT et, CAST(count(*) AS BIGINT) AS n_type FROM g GROUP BY 1),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS n_grains
              FROM (SELECT DISTINCT uid, day FROM g)),
      bt AS (SELECT a.et AS type_a, b.et AS type_b,
               CAST(count(*) AS BIGINT) AS n_both
             FROM g a JOIN g b ON a.uid = b.uid AND a.day = b.day
               AND a.et < b.et
             GROUP BY 1, 2)
      SELECT type_a, type_b, pa.n_type AS n_a, pb.n_type AS n_b, n_both,
        CAST((CAST(n_both AS HUGEINT) * n_grains * 1000000) //
          (CAST(pa.n_type AS HUGEINT) * pb.n_type) AS BIGINT) AS lift_micro
      FROM bt JOIN per pa ON bt.type_a = pa.et
              JOIN per pb ON bt.type_b = pb.et, tot
      ORDER BY type_a, type_b"""))
}
