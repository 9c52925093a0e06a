package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Curate, Dedup, Events, TextOps}

/** Round-10 additions, part 6: dataset-integrity and ML-hygiene
  * operators — train/test leakage detection, order-insensitive table
  * fingerprints, and per-day peak session concurrency.
  */
object Pipeline16 {

  def all: Seq[QueryDef] = Seq(d13, q47, e12, m08, q48, e13, q49)

  /** Integer-exact daily anomaly flags
    * ([[graft.operators.Events.dailyAnomalies]]): spike/dip verdicts
    * by pure-integer cross-multiplication against the trailing week —
    * deliberately NO stddev (engine implementations differ in float op
    * order; cross-multiplied integers cannot flip a boundary). */
  val e13: QueryDef = QueryDef(
    "e13_daily_anomaly",
    (s, d) => Events.dailyAnomalies(Tables.events(s, d), "event_type", "ts")
      .orderBy(col("day"), col("event_type")),
    Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
               CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2),
      wn AS (SELECT event_type, d, n,
               CAST(COALESCE(sum(n) OVER w, 0) AS BIGINT) AS trailing_n,
               CAST(count(n) OVER w AS BIGINT) AS trailing_days
             FROM daily
             WINDOW w AS (PARTITION BY event_type ORDER BY d
               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
      SELECT CAST(d AS VARCHAR) AS day, event_type, n, trailing_n, trailing_days,
        trailing_days >= 3 AND n * trailing_days > 2 * trailing_n AS spike,
        trailing_days >= 3 AND 2 * n * trailing_days < trailing_n AS dip
      FROM wn ORDER BY day, event_type"""))

  /** Exact robust statistics per event type: the interpolated median
    * of cent values and the median absolute deviation around it — two
    * exact-percentile passes (the q33-proven percentile ↔
    * quantile_cont parity), the medians broadcast back for the
    * second. */
  val q49: QueryDef = QueryDef(
    "q49_mad",
    (s, d) => {
      val cents = Tables.events(s, d)
        .selectExpr("event_type", "cast(round(value * 100) as long) AS c")
      val med = cents.groupBy(col("event_type"))
        .agg(expr("percentile(c, 0.5)").as("median_cents"),
          count(lit(1)).as("n"))
      cents.join(broadcast(med), Seq("event_type"))
        .selectExpr("event_type", "n", "median_cents", "abs(c - median_cents) AS dev")
        .groupBy(col("event_type"), col("n"), col("median_cents"))
        .agg(expr("percentile(dev, 0.5)").as("mad_cents"))
        .select(col("event_type"), col("n"), col("median_cents"), col("mad_cents"))
        .orderBy(col("event_type"))
    },
    Some("""WITH c AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
               FROM events),
      m AS (SELECT event_type, quantile_cont(c, 0.5) AS median_cents,
              CAST(count(*) AS BIGINT) AS n
            FROM c GROUP BY 1)
      SELECT c.event_type, m.n, m.median_cents,
        quantile_cont(abs(c.c - m.median_cents), 0.5) AS mad_cents
      FROM c JOIN m ON c.event_type = m.event_type
      GROUP BY c.event_type, m.n, m.median_cents
      ORDER BY c.event_type"""))

  /** Perceptual image hashing ([[graft.operators.Multimodal.imageAHash]])
    * over the real PPM decode: 8×8 average-hash in two 32-bit halves,
    * plus the same-hash group size (the image-dedup signal). The
    * oracle replays every sampled pixel from the corpus's generator
    * arithmetic (the m04 convention). */
  val m08: QueryDef = QueryDef(
    "m08_image_phash",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      graft.operators.Multimodal.imageAHash(
          graft.operators.Multimodal.mediaFromDocuments(Tables.documents(s, d)))
        .withColumn("n_same_hash", count(lit(1)).over(
          Window.partitionBy(col("hash_hi"), col("hash_lo"))).cast("long"))
        .orderBy(col("media_id"))
    },
    Some("""WITH im AS (SELECT doc_id AS mid FROM documents WHERE doc_id % 3 = 0),
      dims AS (SELECT mid, CAST(4 + mid % 29 AS BIGINT) AS w,
                 CAST(4 + mid % 23 AS BIGINT) AS h FROM im),
      px AS (SELECT mid, w, h, b,
               ((b % 8) * w) // 8 AS sx, ((b // 8) * h) // 8 AS sy
             FROM dims, unnest(range(0, 64)) AS t(b)),
      lum AS (SELECT mid, w, h, b,
               (299 * ((mid * 31 + ((sy * w + sx) * 3 + 0) * 7) % 256) +
                587 * ((mid * 31 + ((sy * w + sx) * 3 + 1) * 7) % 256) +
                114 * ((mid * 31 + ((sy * w + sx) * 3 + 2) * 7) % 256)) // 1000 AS l
             FROM px),
      st AS (SELECT mid, w, h, CAST(sum(l) AS BIGINT) // 64 AS mean
             FROM lum GROUP BY 1, 2, 3),
      bits AS (SELECT l.mid, l.b, CASE WHEN l.l > s.mean THEN 1 ELSE 0 END AS bit
               FROM lum l JOIN st s ON l.mid = s.mid),
      hx AS (SELECT mid,
               CAST(sum(CASE WHEN b >= 32 THEN bit * (CAST(1 AS BIGINT) << (b - 32))
                 ELSE 0 END) AS BIGINT) AS hash_hi,
               CAST(sum(CASE WHEN b < 32 THEN bit * (CAST(1 AS BIGINT) << b)
                 ELSE 0 END) AS BIGINT) AS hash_lo
             FROM bits GROUP BY 1)
      SELECT s.mid AS media_id, s.w AS width, s.h AS height,
        CAST(s.mean AS BIGINT) AS mean_luma, hx.hash_hi, hx.hash_lo,
        CAST(count(*) OVER (PARTITION BY hx.hash_hi, hx.hash_lo) AS BIGINT) AS n_same_hash
      FROM st s JOIN hx ON s.mid = hx.mid
      ORDER BY media_id"""))

  /** Referential-integrity audit: one row per FK relation with child
    * row counts and orphan counts (children whose parent key is
    * missing) — anti-join counts, the load-time data-quality gate.
    * Each relation is one left-anti equi-join + O(1)-row aggregates,
    * unioned. */
  val q48: QueryDef = QueryDef(
    "q48_integrity_audit",
    (s, d) => {
      def rel(name: String, child: org.apache.spark.sql.DataFrame, ck: String,
          parent: org.apache.spark.sql.DataFrame, pk: String) = {
        val n = child.agg(count(lit(1)).as("n_child"))
        val o = child.join(parent.select(col(pk)), col(ck) === col(pk), "left_anti")
          .agg(count(lit(1)).as("n_orphans"))
        n.crossJoin(o).selectExpr(s"'$name' AS relation", "n_child", "n_orphans")
      }
      rel("lineitem.partkey->part", Tables.lineitem(s, d), "l_partkey",
          Tables.part(s, d), "p_partkey")
        .unionByName(rel("lineitem.suppkey->supplier", Tables.lineitem(s, d), "l_suppkey",
          Tables.supplier(s, d), "s_suppkey"))
        .unionByName(rel("orders.custkey->customer", Tables.orders(s, d), "o_custkey",
          Tables.customer(s, d), "c_custkey"))
        .unionByName(rel("customer.nationkey->nation", Tables.customer(s, d), "c_nationkey",
          Tables.nation(s, d), "n_nationkey"))
        .orderBy(col("relation"))
    },
    Some("""SELECT 'customer.nationkey->nation' AS relation,
        (SELECT CAST(count(*) AS BIGINT) FROM customer) AS n_child,
        (SELECT CAST(count(*) AS BIGINT) FROM customer c
         WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)) AS n_orphans
      UNION ALL
      SELECT 'lineitem.partkey->part',
        (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
        (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
         WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
      UNION ALL
      SELECT 'lineitem.suppkey->supplier',
        (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
        (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
         WHERE NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey))
      UNION ALL
      SELECT 'orders.custkey->customer',
        (SELECT CAST(count(*) AS BIGINT) FROM orders),
        (SELECT CAST(count(*) AS BIGINT) FROM orders o
         WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
      ORDER BY relation"""))

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
