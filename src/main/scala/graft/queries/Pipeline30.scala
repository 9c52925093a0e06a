package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Joins, TextOps}

/** Round-10 additions, part 20: chunk-boundary overlap detection,
  * time-bounded conversion via the forward as-of, and the one-row
  * dataset card.
  */
object Pipeline30 {

  def all: Seq[QueryDef] = Seq(t32, e28, p32)

  /** Chunk-boundary overlap: doc pairs where one doc's trailing
    * 2-token boundary equals another's leading boundary — the
    * continuity signal a chunk-stitcher uses to re-join documents
    * split mid-passage (and a dedup signal for sliding-window chunk
    * corpora like p17's). Hash equi-join on the 60-bit boundary
    * fingerprint; docs shorter than 2 tokens emit nothing. */
  val t32: QueryDef = QueryDef(
    "t32_boundary_overlap",
    (s, d) => {
      val b = graft.operators.Storage.parallelFloor(Tables.documents(s, d))
        .selectExpr("doc_id", s"${TextOps.tokens("text")} AS t")
        .filter(col("t").isNotNull && expr("size(t) >= 2"))
        .selectExpr("doc_id",
          s"${TextOps.strHash60("concat_ws(' ', slice(t, 1, 2))")} AS pre",
          s"${TextOps.strHash60("concat_ws(' ', slice(t, -2, 2))")} AS suf")
      b.selectExpr("doc_id AS d1", "suf").join(
          b.selectExpr("doc_id AS d2", "pre"),
          col("suf") === col("pre") && col("d1") =!= col("d2"))
        .select(col("d1"), col("d2"))
        .orderBy(col("d1"), col("d2"))
    },
    Some(s"""WITH tk AS (SELECT doc_id, ${DuckOps.tokens("text")} AS t FROM documents),
      b AS (SELECT doc_id,
              ${DuckOps.strHash60("(t[1] || ' ' || t[2])")} AS pre,
              ${DuckOps.strHash60("(t[-2] || ' ' || t[-1])")} AS suf
            FROM tk WHERE len(t) >= 2)
      SELECT a.doc_id AS d1, c.doc_id AS d2
      FROM b a JOIN b c ON a.suf = c.pre AND a.doc_id <> c.doc_id
      ORDER BY d1, d2"""))

  /** Time-bounded conversion: per day the views whose user's NEXT
    * purchase (forward as-of, [[graft.operators.Joins.asOfForward]])
    * lands within one hour — the windowed funnel a growth team calls
    * "1-hour view→purchase CVR", in exact micro units. */
  val e28: QueryDef = QueryDef(
    "e28_windowed_conversion",
    (s, d) => {
      val ev = Tables.events(s, d)
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("p_ts"))
      Joins.asOfForward(views, purchases, Seq("user_id"), "ts", "p_ts")
        .selectExpr("cast(to_date(ts) as string) AS day",
          "if(asof_p_ts IS NOT NULL AND" +
            " unix_micros(asof_p_ts) - unix_micros(ts) <= 3600000000L, 1L, 0L)" +
            " AS conv")
        .groupBy(col("day"))
        .agg(count(lit(1)).as("n_views"), sum(col("conv")).as("n_converted"))
        .selectExpr("day", "n_views", "n_converted",
          "(n_converted * 1000000) div n_views AS cvr_micro")
        .orderBy(col("day"))
    },
    Some("""WITH v AS (SELECT user_id, event_id, ts FROM events
               WHERE event_type = 'view'),
      p AS (SELECT user_id, ts AS p_ts FROM events WHERE event_type = 'purchase'),
      j AS (SELECT v.ts, n.t FROM v LEFT JOIN LATERAL (
              SELECT min(p.p_ts) AS t FROM p
              WHERE p.user_id = v.user_id AND p.p_ts >= v.ts) n ON TRUE),
      g AS (SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
              CAST(count(*) AS BIGINT) AS n_views,
              CAST(sum(CASE WHEN t IS NOT NULL AND epoch_us(t - ts) <= 3600000000
                THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
            FROM j GROUP BY 1)
      SELECT day, n_views, n_converted,
        (n_converted * 1000000) // n_views AS cvr_micro
      FROM g ORDER BY day"""))

  /** Dataset card — the one-row corpus summary a release ships with:
    * doc/source/language counts, whitespace-token mass, milli mean
    * doc length, exact-duplicate doc count (docs minus distinct
    * token-fingerprints), and the dup share in micro units. Three
    * cheap aggs folded into one row. */
  val p32: QueryDef = QueryDef(
    "p32_dataset_card",
    (s, d) => {
      val base = Tables.documents(s, d).selectExpr("doc_id", "source", "lang",
        "cast(size(filter(split(text, '[ ]+'), x -> x != '')) as bigint) AS n_tokens",
        s"${TextOps.strHash60(s"concat_ws(' ', ${TextOps.tokens("text")})")} AS fp")
      base.agg(count(lit(1)).as("n_docs"),
          countDistinct(col("source")).as("n_sources"),
          countDistinct(col("lang")).as("n_langs"),
          sum(col("n_tokens")).as("total_tokens"),
          countDistinct(col("fp")).as("n_unique"))
        .selectExpr("n_docs", "n_sources", "n_langs", "total_tokens",
          "(total_tokens * 1000) div n_docs AS mean_tokens_milli",
          "n_docs - n_unique AS n_dup_docs",
          "((n_docs - n_unique) * 1000000) div n_docs AS dup_share_micro")
    },
    Some(s"""WITH b AS (SELECT doc_id, source, lang,
               CAST(len(list_filter(regexp_split_to_array(text, '[ ]+'),
                 x -> x <> '')) AS BIGINT) AS n_tokens,
               ${DuckOps.strHash60(s"array_to_string(${DuckOps.tokens("text")}, ' ')")} AS fp
             FROM documents)
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
        CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
        CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        (CAST(sum(n_tokens) AS BIGINT) * 1000) // CAST(count(*) AS BIGINT)
          AS mean_tokens_milli,
        CAST(count(*) - count(DISTINCT fp) AS BIGINT) AS n_dup_docs,
        ((CAST(count(*) AS BIGINT) - CAST(count(DISTINCT fp) AS BIGINT)) * 1000000)
          // CAST(count(*) AS BIGINT) AS dup_share_micro
      FROM b"""))
}
