package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Curate, TextOps}

/** Round-11 additions, part 28: exact Gini inequality over order
  * values (bucketed global-order cumsum — the q74 machinery turned
  * from a hash line to a VALUE line), Simpson vocabulary diversity
  * per source (the entropy stand-in that hash-compares), and audio
  * zero-crossing rate through the real WAV codec.
  */
object Pipeline63 {

  def all: Seq[QueryDef] = Seq(q76, t43, m15)

  /** Exact Gini coefficient ([[graft.operators.Curate.giniExact]])
    * of the order-value distribution in cents — the revenue-
    * inequality number next to p34's HHI. The global ascending rank
    * never materializes per row: ties collapse per distinct cent
    * value, and the exclusive cumulative count decomposes into ≤257
    * value-range buckets cumsummed in parallel (+ a broadcast
    * offset frame) — the oracle computes the identical integers
    * with one flat window, so parity proves the decomposition is
    * the identity. */
  val q76: QueryDef = QueryDef(
    "q76_gini",
    (s, d) => Curate.giniExact(
      Tables.orders(s, d)
        .selectExpr("cast(round(o_totalprice * 100) as bigint) AS cents"),
      "cents"),
    Some("""WITH w AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c
               FROM orders),
      g AS (SELECT c, CAST(count(*) AS BIGINT) AS cnt FROM w GROUP BY 1),
      r AS (SELECT c, cnt,
              COALESCE(CAST(sum(cnt) OVER (ORDER BY c
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
                0) AS before
            FROM g),
      s AS (SELECT CAST(sum(cnt) AS BIGINT) AS n,
              CAST(sum(CAST(c AS HUGEINT) * cnt) AS HUGEINT) AS t,
              CAST(sum(CAST(c AS HUGEINT) *
                (cnt * (before + 1) + cnt * (cnt - 1) // 2)) AS HUGEINT) AS s1
            FROM r)
      SELECT n AS n_rows, CAST(t AS BIGINT) AS total_weight,
        CAST(CASE WHEN n < 2 OR t <= 0 THEN 0
          ELSE (2 * s1 - (n + 1) * t) * 1000000 // (n * t) END AS BIGINT)
          AS gini_micro
      FROM s"""))

  /** Simpson diversity of each source's token distribution
    * ([[graft.operators.TextOps.simpsonDiversity]]): the probability
    * two tokens drawn without replacement are the same type, exact
    * rational arithmetic instead of entropy's un-hashable log. High
    * repeat flags boilerplate-heavy sources before they skew a
    * training mix. */
  val t43: QueryDef = QueryDef(
    "t43_simpson_diversity",
    (s, d) => TextOps.simpsonDiversity(Tables.documents(s, d), "source", "text"),
    Some(s"""WITH toks AS (SELECT source, unnest(${DuckOps.tokens("text")}) AS tok
               FROM documents),
      cnt AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS n
              FROM toks GROUP BY 1, 2),
      agg AS (SELECT source, CAST(sum(n) AS BIGINT) AS n_tokens,
                CAST(count(*) AS BIGINT) AS n_types,
                CAST(sum(CAST(n AS HUGEINT) * (n - 1)) AS HUGEINT) AS rep
              FROM cnt GROUP BY 1)
      SELECT source, n_tokens, n_types,
        CAST(CASE WHEN n_tokens < 2 THEN 0
          ELSE rep * 1000000 //
            (CAST(n_tokens AS HUGEINT) * (n_tokens - 1)) END AS BIGINT)
          AS simpson_repeat_micro
      FROM agg ORDER BY source"""))

  /** Audio zero-crossing rate
    * ([[graft.operators.Multimodal.zeroCrossingAudit]]) over REAL
    * WAV payloads from m13's deterministic generator (clamping at
    * the rails never changes a sign, so both audits share one
    * corpus); the oracle replays the generator analytically with a
    * lag window and the identical strict-sign-flip rule. */
  val m15: QueryDef = QueryDef(
    "m15_zero_crossing",
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
      Multimodal.zeroCrossingAudit(media).toDF().orderBy(col("media_id"))
    },
    Some("""WITH sm AS (SELECT doc_id, j,
               GREATEST(-32767, LEAST(32767,
                 (doc_id * 53 + j * 29) % 70000 - 35000)) AS v
             FROM documents, unnest(range(0, 32 + (doc_id % 5) * 16)) AS t(j)),
      lg AS (SELECT doc_id, v,
               lag(v) OVER (PARTITION BY doc_id ORDER BY j) AS pv
             FROM sm)
      SELECT doc_id AS media_id, CAST(count(*) AS BIGINT) AS n_samples,
        CAST(sum(CASE WHEN pv * v < 0 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_crossings,
        CAST(CASE WHEN count(*) < 2 THEN 0
          ELSE CAST(sum(CASE WHEN pv * v < 0 THEN 1 ELSE 0 END) AS HUGEINT)
            * 1000000 // (count(*) - 1) END AS BIGINT) AS zcr_micro
      FROM lg GROUP BY 1 ORDER BY 1"""))
}
