package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Curate, Dedup, Events, TextOps}

/** Round-10 additions, part 6: dataset-integrity and ML-hygiene
  * operators — train/test leakage detection, order-insensitive table
  * fingerprints, and per-day peak session concurrency.
  */
object Pipeline16 {

  def all: Seq[QueryDef] = Seq(d13, q47, e12)

  /** Train/test leakage detection: d03's near-dup pairs that CROSS
    * p19's deterministic hash-split boundary — the docs whose
    * near-duplicates leak evaluation data into training. The oracle
    * nests BOTH generated chains (the minhash CTEs and p19's
    * mixed-hash bucket arithmetic), so drift in either breaks this
    * query identically. */
  val d13: QueryDef = QueryDef(
    "d13_split_leakage",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val splits = Curate.hashSplit(docs, "doc_id", "graft",
          trainPerMille = 800, valPerMille = 100)
        .select(col("doc_id"), col("split"))
      Dedup.minhashLshPairs(docs, "text", 3, 16, 4, 0.5)
        .select(col("d1"), col("d2"))
        .join(splits.selectExpr("doc_id AS d1", "split AS split1"), Seq("d1"))
        .join(splits.selectExpr("doc_id AS d2", "split AS split2"), Seq("d2"))
        .filter(col("split1") =!= col("split2"))
        .select(col("d1"), col("d2"), col("split1"), col("split2"))
        .orderBy(col("d1"), col("d2"))
    },
    Some(s"""${Pipeline.minhashCtes},
      sel AS (SELECT d1, d2 FROM est WHERE CAST(matches AS DOUBLE) / 16 >= 0.5),
      sp AS (SELECT doc_id,
               CASE WHEN bucket < 800 THEN 'train'
                    WHEN bucket < 900 THEN 'val'
                    ELSE 'test' END AS split
             FROM (SELECT doc_id,
                     (((${DuckOps.strHash60("('graft:' || CAST(doc_id AS VARCHAR))")} % 2147483648)
                       * 2654435761) % 2147483648) % 1000 AS bucket
                   FROM documents))
      SELECT p.d1, p.d2, a.split AS split1, b.split AS split2
      FROM sel p JOIN sp a ON p.d1 = a.doc_id JOIN sp b ON p.d2 = b.doc_id
      WHERE a.split <> b.split
      ORDER BY p.d1, p.d2"""))

  /** Order-insensitive per-source table fingerprint: row count, XOR of
    * per-row content hashes (`bit_xor` — commutative, overflow-free,
    * so partitioning and row order cannot change it), and the exact
    * char sum — the reconciliation primitive for cross-system
    * replication audits. Map-only until one partial-agg shuffle. */
  val q47: QueryDef = QueryDef(
    "q47_table_fingerprint",
    (s, d) => Tables.documents(s, d)
      .selectExpr("source",
        s"${TextOps.strHash60("concat_ws('|', cast(doc_id as string), text, lang)")} AS h",
        "n_chars")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(h)").as("xor_fingerprint"),
        sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("source")),
    Some(s"""SELECT source, CAST(count(*) AS BIGINT) AS n_rows,
        CAST(bit_xor(${DuckOps.strHash60(
          "(CAST(doc_id AS VARCHAR) || '|' || text || '|' || lang)")}) AS BIGINT)
          AS xor_fingerprint,
        CAST(sum(n_chars) AS BIGINT) AS sum_chars
      FROM documents GROUP BY 1 ORDER BY 1"""))

  /** Per-day peak session concurrency
    * ([[graft.operators.Events.peakConcurrency]]) over the st01
    * sessions: interval sweep with day-segmented sessions so the
    * running-sum window partitions by day, inclusive endpoint
    * overlap. The oracle nests st01's gaps-and-islands session chain
    * and replays the segment split and the sweep. */
  val e12: QueryDef = QueryDef(
    "e12_peak_concurrency",
    (s, d) => {
      import s.implicits._
      val sessions = graft.streaming.EventStreams
        .sessionizeBounded(Tables.events(s, d).as[graft.streaming.EventStreams.Event],
          gapMinutes = 30)
        .selectExpr("user_id", "unix_millis(session_start) AS s_ms",
          "unix_millis(session_end) AS e_ms")
      Events.peakConcurrency(sessions, "user_id", "s_ms", "e_ms")
        .orderBy(col("day"))
    },
    Some("""WITH e AS (
        SELECT user_id, epoch_ms(ts) AS t, event_id,
          CAST(round(value * 100) AS BIGINT) AS cents
        FROM events),
      flagged AS (
        SELECT user_id, t,
          CASE WHEN t - lag(t) OVER w > 1800000 OR lag(t) OVER w IS NULL
               THEN 1 ELSE 0 END AS new_session
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
      numbered AS (
        SELECT user_id, t,
          sum(new_session) OVER (PARTITION BY user_id ORDER BY t
                                 ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged),
      sess AS (SELECT min(t) AS s_ms, max(t) AS e_ms
               FROM numbered GROUP BY user_id, session_id),
      segs AS (SELECT day,
                 greatest(s_ms, epoch_ms(CAST(day AS TIMESTAMP))) AS seg_s,
                 least(e_ms, epoch_ms(CAST(day AS TIMESTAMP)) + 86399999) AS seg_e
               FROM (SELECT s_ms, e_ms,
                       CAST(unnest(generate_series(
                         CAST(make_timestamp(s_ms * 1000) AS DATE),
                         CAST(make_timestamp(e_ms * 1000) AS DATE),
                         INTERVAL 1 DAY)) AS DATE) AS day
                     FROM sess)),
      deltas AS (SELECT day, seg_s AS t_ms, CAST(1 AS BIGINT) AS delta FROM segs
                 UNION ALL
                 SELECT day, seg_e AS t_ms, CAST(-1 AS BIGINT) AS delta FROM segs),
      sweep AS (SELECT day, t_ms, delta,
                  sum(delta) OVER (PARTITION BY day ORDER BY t_ms ASC, delta DESC
                    ROWS UNBOUNDED PRECEDING) AS running
                FROM deltas)
      SELECT CAST(day AS VARCHAR) AS day,
        CAST(count(*) // 2 AS BIGINT) AS n_segments,
        CAST(max(running) AS BIGINT) AS peak_concurrent
      FROM sweep GROUP BY day ORDER BY day"""))
}
