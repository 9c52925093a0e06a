package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.TextOps

/** Round-11 additions, part 43: audio quiet-run segmentation through
  * the real WAV codec, and the prefix-dedup scrub savings that close
  * the c17 fingerprint family (detect → attribute → cascade → scrub).
  */
object Pipeline78 {

  def all: Seq[QueryDef] = Seq(m17, p45)

  /** Quiet-run profile ([[graft.operators.Multimodal.quietRunAudit]])
    * over the canonical deterministic WAV corpus (the m15 sample
    * generator): per clip the quiet-sample count under |v| < 8000,
    * the number of maximal quiet runs, and the longest run — the
    * silence-segmentation numbers a speech pipeline chunks on. The
    * engine decodes REAL WAV bytes; the oracle replays the generator
    * analytically and finds runs with the islands-and-gaps window. */
  val m17: QueryDef = QueryDef(
    "m17_quiet_runs",
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
      Multimodal.quietRunAudit(media, 8000).toDF().orderBy(col("media_id"))
    },
    Some("""WITH sm AS (SELECT doc_id, j,
               GREATEST(-32767, LEAST(32767,
                 (doc_id * 53 + j * 29) % 70000 - 35000)) AS v
             FROM documents, unnest(range(0, 32 + (doc_id % 5) * 16)) AS t(j)),
      q AS (SELECT doc_id, j,
              CASE WHEN abs(v) < 8000 THEN 1 ELSE 0 END AS quiet FROM sm),
      r AS (SELECT doc_id, j, quiet,
              j - row_number() OVER (PARTITION BY doc_id, quiet ORDER BY j)
                AS grp
            FROM q),
      runs AS (SELECT doc_id, grp, CAST(count(*) AS BIGINT) AS len
               FROM r WHERE quiet = 1 GROUP BY doc_id, grp),
      ra AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_runs,
               CAST(max(len) AS BIGINT) AS max_run,
               CAST(sum(len) AS BIGINT) AS n_quiet
             FROM runs GROUP BY 1),
      base AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_samples
               FROM sm GROUP BY 1)
      SELECT base.doc_id AS media_id, base.n_samples,
        COALESCE(ra.n_quiet, 0) AS n_quiet,
        COALESCE(ra.n_runs, 0) AS n_runs,
        COALESCE(ra.max_run, 0) AS max_run
      FROM base LEFT JOIN ra ON base.doc_id = ra.doc_id
      ORDER BY 1"""))

  /** Prefix-dedup scrub savings: keep one doc per 40-token-prefix
    * fingerprint group (min doc_id — c17's edge universe, scrubbed),
    * and report per source what that costs: docs dropped and exact
    * token mass saved, in micro share of the source's tokens. The
    * scrub face that closes the prefix-dup family: d26/c17 ATTRIBUTE
    * the flows; this is the budget line for acting on them.
    *
    * 100 TB shape: one tokenize+hash pass, one fingerprint partial
    * agg, one fp-keyed equi-join back, one source-keyed fold. */
  val p45: QueryDef = QueryDef(
    "p45_prefix_dup_scrub",
    (s, d) => {
      val fp = Tables.documents(s, d)
        .selectExpr("doc_id", "source", s"${TextOps.tokens("text")} AS t")
        .selectExpr("doc_id", "source", "cast(size(t) as bigint) AS n_toks",
          s"${TextOps.strHash60("concat_ws(' ', slice(t, 1, 40))")} AS fp")
      val keep = fp.groupBy(col("fp")).agg(min(col("doc_id")).as("keeper"))
      fp.join(keep, Seq("fp"))
        .selectExpr("source", "n_toks",
          "cast(doc_id = keeper as bigint) AS kept")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("kept")).as("n_kept"),
          sum(col("n_toks")).as("tokens_total"),
          sum(expr("(1 - kept) * n_toks")).as("tokens_dropped"))
        .selectExpr("source", "n_docs", "n_kept", "n_docs - n_kept AS n_dropped",
          "tokens_total", "tokens_dropped",
          "cast(if(tokens_total = 0, 0," +
            " (cast(tokens_dropped as decimal(38,0)) * 1000000) div tokens_total)" +
            " as bigint) AS savings_micro")
        .orderBy(col("source"))
    },
    Some(s"""WITH tk AS (SELECT doc_id, source, ${DuckOps.tokens("text")} AS t
               FROM documents),
      fp AS (SELECT doc_id, source, CAST(len(t) AS BIGINT) AS n_toks,
               ${DuckOps.strHash60("array_to_string(t[1:40], ' ')")} AS fp
             FROM tk),
      keep AS (SELECT fp, min(doc_id) AS keeper FROM fp GROUP BY 1),
      m AS (SELECT source, n_toks,
              CASE WHEN doc_id = keeper THEN 1 ELSE 0 END AS kept
            FROM fp JOIN keep USING (fp)),
      a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(kept) AS BIGINT) AS n_kept,
              CAST(sum(n_toks) AS BIGINT) AS tokens_total,
              CAST(sum((1 - kept) * n_toks) AS BIGINT) AS tokens_dropped
            FROM m GROUP BY 1)
      SELECT source, n_docs, n_kept, n_docs - n_kept AS n_dropped,
        tokens_total, tokens_dropped,
        CAST(CASE WHEN tokens_total = 0 THEN 0
          ELSE (CAST(tokens_dropped AS HUGEINT) * 1000000) // tokens_total
          END AS BIGINT) AS savings_micro
      FROM a ORDER BY source"""))
}
