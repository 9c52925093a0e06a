package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Dedup

/** Round-11 additions, part 39: time-weighted averaging over event
  * streams and vocabulary-novelty attribution over the corpus — both
  * exact-integer, both one-pass.
  */
object Pipeline74 {

  def all: Seq[QueryDef] = Seq(e40, t45)

  /** Per-user time-weighted average event value (TWAP): each event's
    * value holds until the user's next event (piecewise-constant
    * step), weighted by the exact microsecond duration; the last
    * event gets zero weight (the span ends there). Exact integers
    * throughout: cent values × microsecond durations ride
    * decimal(38,0)/HUGEINT (a cent-scale value held for a year is
    * ~3e16 — a handful of those overflow Int64), and the final
    * micro-cents division truncates toward zero identically in both
    * engines for NEGATIVE running values too (refund events — the
    * e17 discipline). Users with a single event (no span) are
    * excluded by definition.
    *
    * 100 TB shape: one user-partitioned lead window (the engine's
    * canonical adjacent-pair shuffle) into a user-keyed partial agg —
    * nothing after the window scales past one row per user. */
  val e40: QueryDef = QueryDef(
    "e40_twap",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .selectExpr("user_id", "ts", "event_id",
          "cast(round(value * 100) as bigint) AS cents")
        .withColumn("nxt", lead(col("ts"), 1).over(w))
        .filter(col("nxt").isNotNull)
        .selectExpr("user_id",
          "cast(cents as decimal(38,0))" +
            " * (unix_micros(nxt) - unix_micros(ts)) AS wv",
          "unix_micros(nxt) - unix_micros(ts) AS dur")
        .groupBy(col("user_id"))
        .agg((count(lit(1)) + 1).as("n_events"),
          sum(col("dur")).as("span_us"),
          sum(col("wv")).as("swv"))
        .filter(col("span_us") > 0)
        .selectExpr("user_id", "cast(n_events as bigint) AS n_events",
          "span_us",
          "cast((swv * 1000000) div span_us as bigint) AS twa_cents_micro")
        .orderBy(col("user_id"))
    },
    Some("""WITH e AS (SELECT user_id, ts, event_id,
               CAST(round(value * 100) AS BIGINT) AS cents,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
             FROM events),
      iv AS (SELECT user_id, CAST(cents AS HUGEINT) * epoch_us(nxt - ts) AS wv,
               epoch_us(nxt - ts) AS dur
             FROM e WHERE nxt IS NOT NULL),
      a AS (SELECT user_id, CAST(count(*) + 1 AS BIGINT) AS n_events,
              CAST(sum(dur) AS BIGINT) AS span_us,
              CAST(sum(wv) AS HUGEINT) AS swv
            FROM iv GROUP BY 1)
      SELECT user_id, n_events, span_us,
        CAST((swv * 1000000) // span_us AS BIGINT) AS twa_cents_micro
      FROM a WHERE span_us > 0 ORDER BY user_id"""))

  /** Per-source trigram novelty: which source INTRODUCES vocabulary.
    * Every distinct 3-shingle (60-bit hash, the d-family's exact
    * oracle-twin hashing) is attributed to the document where it
    * first appears (min doc_id — ingest order); a source's novelty is
    * the share of its shingle occurrences that are first sightings.
    * Boilerplate-heavy sources score near zero; the source that
    * coined the corpus's phrases scores high — the d24/p40 dedup
    * family's vocabulary-level complement.
    *
    * 100 TB shape: one tokenize+explode pass feeding two partial aggs
    * (per-doc occurrence counts; per-shingle min-doc then per-doc
    * first-sighting counts) — the vocabulary-sized frame collapses to
    * ≤1 row per doc BEFORE any join; the two joins back to the
    * documents dim are doc-keyed. No vocabulary-sized join against
    * the occurrence frame. */
  val t45: QueryDef = QueryDef(
    "t45_trigram_novelty",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val sh = Dedup.shingleHashSets(docs, "text", 3)
        .selectExpr("doc_id", "explode(hs) AS sgl")
      val occ = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("occ"))
      val nov = sh.groupBy(col("sgl")).agg(min(col("doc_id")).as("doc_id"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("novel"))
      docs.select(col("doc_id"), col("source"))
        .join(occ, Seq("doc_id"), "left")
        .join(nov, Seq("doc_id"), "left")
        .selectExpr("source", "coalesce(occ, 0L) AS occ",
          "coalesce(novel, 0L) AS novel")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("occ")).as("n_trigrams"),
          sum(col("novel")).as("n_novel"))
        .selectExpr("source", "n_docs", "n_trigrams", "n_novel",
          "cast(if(n_trigrams = 0, 0L," +
            " (cast(n_novel as decimal(38,0)) * 1000000) div n_trigrams)" +
            " as bigint) AS novelty_micro")
        .orderBy(col("source"))
    },
    Some(s"""WITH toks AS (SELECT doc_id, ${DuckOps.tokens("text")} AS t
               FROM documents),
      sh0 AS (SELECT doc_id, ${DuckOps.shingles("t", 3)} AS s FROM toks),
      e AS (SELECT doc_id, unnest(list_distinct(
              list_transform(s, x -> ${DuckOps.strHash60("x")}))) AS sgl
            FROM sh0),
      occ AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS occ FROM e GROUP BY 1),
      nov AS (SELECT first_doc AS doc_id, CAST(count(*) AS BIGINT) AS novel
              FROM (SELECT sgl, min(doc_id) AS first_doc FROM e GROUP BY 1)
              GROUP BY 1),
      m AS (SELECT d.source, COALESCE(occ.occ, 0) AS occ,
              COALESCE(nov.novel, 0) AS novel
            FROM documents d LEFT JOIN occ USING (doc_id)
              LEFT JOIN nov USING (doc_id)),
      a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(occ) AS BIGINT) AS n_trigrams,
              CAST(sum(novel) AS BIGINT) AS n_novel
            FROM m GROUP BY 1)
      SELECT source, n_docs, n_trigrams, n_novel,
        CAST(CASE WHEN n_trigrams = 0 THEN 0
          ELSE (CAST(n_novel AS HUGEINT) * 1000000) // n_trigrams
          END AS BIGINT) AS novelty_micro
      FROM a ORDER BY source"""))
}
