package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Dedup, TextOps}

/** Round-10 additions, part 16: error-streak detection
  * (gaps-and-islands over value changes), LSH band health stats,
  * and positional token explode.
  */
object Pipeline26 {

  def all: Seq[QueryDef] = Seq(e24, d16, q56)

  /** Error-streak detection — runs-of-equal-values islands: per user
    * the events partition into maximal same-type runs (island id =
    * running count of type CHANGES), and the longest 'error' run plus
    * the error-run count rank the top 20 noisiest users. ONE
    * user-keyed window pass for the islands, grid aggs after. */
  val e24: QueryDef = QueryDef(
    "e24_error_streaks",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val runs = Tables.events(s, d)
        .withColumn("chg",
          when(lag(col("event_type"), 1).over(w).isNull ||
            lag(col("event_type"), 1).over(w) =!= col("event_type"), 1L)
            .otherwise(0L))
        .withColumn("sid", sum(col("chg")).over(w))
        .filter(col("event_type") === "error")
        .groupBy(col("user_id"), col("sid"))
        .agg(count(lit(1)).as("len"))
      val per = runs.groupBy(col("user_id"))
        .agg(max(col("len")).as("max_streak"), count(lit(1)).as("n_runs"))
        .orderBy(col("max_streak").desc, col("user_id").asc).limit(20)
      per.withColumn("rk", row_number().over(
          Window.orderBy(col("max_streak").desc, col("user_id").asc)).cast("long"))
        .select(col("rk"), col("user_id"), col("max_streak"), col("n_runs"))
        .orderBy(col("rk"))
    },
    Some("""WITH o AS (SELECT user_id, event_id, event_type, ts,
               CASE WHEN lag(event_type) OVER w IS NULL
                      OR lag(event_type) OVER w <> event_type
                    THEN 1 ELSE 0 END AS chg
             FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      isl AS (SELECT user_id, event_type,
                sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS sid
              FROM o),
      runs AS (SELECT user_id, sid, CAST(count(*) AS BIGINT) AS len
               FROM isl WHERE event_type = 'error' GROUP BY 1, 2),
      per AS (SELECT user_id, CAST(max(len) AS BIGINT) AS max_streak,
                CAST(count(*) AS BIGINT) AS n_runs
              FROM runs GROUP BY 1),
      top AS (SELECT user_id, max_streak, n_runs FROM per
              ORDER BY max_streak DESC, user_id LIMIT 20)
      SELECT CAST(row_number() OVER (ORDER BY max_streak DESC, user_id) AS BIGINT)
          AS rk, user_id, max_streak, n_runs
      FROM top ORDER BY rk"""))

  /** LSH band health ([[graft.operators.Dedup.lshBandStats]]): per
    * band the bucket count, fattest bucket, and candidate-pair mass
    * — the pre-join degeneracy check for the d03 instance. */
  val d16: QueryDef = QueryDef(
    "d16_band_stats",
    (s, d) => Dedup.lshBandStats(Tables.documents(s, d), "text", 3, 16, 4)
      .orderBy(col("band")),
    Some(s"""${Pipeline.minhashCtes},
      sz AS (SELECT CAST(b AS BIGINT) AS band, bucket,
               CAST(count(*) AS BIGINT) AS sz
             FROM bands GROUP BY 1, 2)
      SELECT band, CAST(count(*) AS BIGINT) AS n_buckets,
        CAST(sum(sz) AS BIGINT) AS n_docs,
        CAST(max(sz) AS BIGINT) AS max_bucket,
        CAST(sum(sz * (sz - 1) // 2) AS BIGINT) AS cand_pairs
      FROM sz GROUP BY 1 ORDER BY 1"""))

  /** Positional token explode — the generator-with-ordinality
    * surface: each doc's first five tokens with their positions
    * (`posexplode` ↔ ranged list indexing). Map-only. */
  val q56: QueryDef = QueryDef(
    "q56_posexplode_tokens",
    (s, d) => Tables.documents(s, d)
      .selectExpr("doc_id", s"${TextOps.tokens("text")} AS t")
      .selectExpr("doc_id", "posexplode(t) AS (pos, token)")
      .filter(col("pos") < 5)
      .selectExpr("doc_id", "cast(pos as bigint) AS pos", "token")
      .orderBy(col("doc_id"), col("pos")),
    Some(s"""WITH tk AS (SELECT doc_id, ${DuckOps.tokens("text")} AS t FROM documents)
      SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, t[i] AS token
      FROM tk, unnest(range(1, least(5, len(t)) + 1)) AS u(i)
      ORDER BY doc_id, pos"""))
}
