package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Dedup

/** Round-11 additions, part 21: the stream-stream interval join
  * through the real engine, and the MinHash signature-budget sweep.
  */
object Pipeline56 {

  def all: Seq[QueryDef] = Seq(st10, d25)

  /** Stream-stream interval join through the real engine:
    * [[graft.streaming.EventStreams.purchasesNearErrors]] (bucket
    * expansion supplies the equality key Structured Streaming
    * requires; event-time bounds keep state O(watermark × rate))
    * driven as a SELF-JOIN of one file-source stream across two
    * stopped-and-resumed drops. The cross-drop matches are the
    * point: a purchase in drop 2 must still find a drop-1 error
    * held in join state (the watermark horizon keeps error rows
    * until e_ts + 60 s falls behind), and state pruned beyond the
    * horizon must not lose any in-range pair. Inner-join append
    * emits each match exactly once; the oracle is the plain batch
    * interval join. */
  val st10: QueryDef = QueryDef(
    "st10_engine_interval_join",
    (s, d) => {
      val ev = Tables.events(s, d).select(col("ts"), col("event_type"), col("event_id"))
      val root = new java.io.File(Pipeline43.streamRoot, "st10")
      val streamDir = new java.io.File(root, "stream")
      val ckpt = new java.io.File(root, "ckpt")
      val sink = new java.io.File(root, "sink")
      Pipeline43.deleteRec(streamDir); Pipeline43.deleteRec(ckpt)
      Pipeline43.deleteRec(sink)
      val base = System.currentTimeMillis()
      // both drops materialized by ONE job (Pipeline43.prepareSlices)
      // and published as pure file copies — same bytes per drop, same
      // micro-batch boundaries
      Pipeline43.prepareSlices(root, ev.withColumn("__slice",
        when(col("ts") < lit("2024-01-16").cast("timestamp"), "batch1")
          .otherwise("batch2")))
      // single-lifetime waves (VERDICT r12 #5): the cross-drop
      // join-state retention point needs separate micro-batches, not
      // a restart — resume stays gated by st13, the join-matrix
      // chaos representative
      Pipeline43.driveWavesSized(s, streamDir,
        () => {
          val stream = s.readStream.schema(ev.schema).parquet(streamDir.toString)
          val joined = graft.streaming.EventStreams.purchasesNearErrors(stream)
            .selectExpr("e_id", "p_id",
              "(unix_micros(p_ts) - unix_micros(e_ts)) AS gap_us")
          joined.writeStream.outputMode("append")
            .option("checkpointLocation", ckpt.toString)
            .foreachBatch((df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                id: Long) =>
              df.write.mode("overwrite").parquet(s"$sink/batch=$id"))
            .start()
        },
        Seq(
          () => Pipeline43.dropSlice(root, streamDir, "batch1", base - 60000L),
          () => Pipeline43.dropSlice(root, streamDir, "batch2", base)))
      s.read.parquet(sink.toString)
        .select(col("e_id"), col("p_id"), col("gap_us"))
        .orderBy(col("e_id"), col("p_id"))
    },
    Some("""SELECT e.event_id AS e_id, p.event_id AS p_id,
        epoch_us(p.ts - e.ts) AS gap_us
      FROM events e JOIN events p
        ON e.event_type = 'error' AND p.event_type = 'purchase'
        AND p.ts >= e.ts AND p.ts < e.ts + INTERVAL 60 SECOND
      ORDER BY e_id, p_id"""))

  /** MinHash signature-budget sweep: the d23 calibration repeated at
    * k = 8 and k = 16 permutations (4 bands each), summarized per
    * budget — candidates, estimate-positive pairs (est >= 0.5), true
    * positives among candidates (exact set Jaccard >= 0.5), and the
    * estimate's precision/recall against that candidate-scoped
    * truth. The number that says whether half the signature bytes
    * buy the same dedup quality. One signature pass per k (bands
    * derived from it), truth via the d02-style exact-set verify
    * join. */
  val d25: QueryDef = QueryDef(
    "d25_minhash_k_sweep",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val sets = Dedup.shingleHashSets(docs, "text", 3)
        .selectExpr("doc_id", "hs", "cast(n_shingles as bigint) AS ns")
      def forK(k: Int) = {
        Dedup.minhashLshPairs(docs, "text", 3, k, 4, 0.0)
          .select(col("d1"), col("d2"), col("matches"))
          .join(sets.selectExpr("doc_id AS d1", "hs AS h1", "ns AS n1"), Seq("d1"))
          .join(sets.selectExpr("doc_id AS d2", "hs AS h2", "ns AS n2"), Seq("d2"))
          .selectExpr(s"${k}L AS k",
            s"cast(matches * 2 >= $k as bigint) AS est_pos",
            "cast(size(array_intersect(h1, h2)) as bigint) AS inter", "n1", "n2")
          .selectExpr("k", "est_pos",
            "cast(if(n1 + n2 - inter = 0, 1000000L, (inter * 1000000) div (n1 + n2 - inter)) >= 500000 as bigint) AS true_pos")
          .groupBy(col("k"))
          .agg(count(lit(1)).as("n_cands"),
            coalesce(sum(col("est_pos")), lit(0L)).as("n_est"),
            coalesce(sum(col("true_pos")), lit(0L)).as("n_true"),
            coalesce(sum(expr("est_pos * true_pos")), lit(0L)).as("n_both"))
      }
      forK(8).unionByName(forK(16))
        .selectExpr("k", "n_cands", "n_est", "n_true", "n_both",
          "if(n_est = 0, 1000000L, cast((cast(n_both as decimal(38,0)) * 1000000) div n_est as bigint)) AS precision_micro",
          "if(n_true = 0, 1000000L, cast((cast(n_both as decimal(38,0)) * 1000000) div n_true as bigint)) AS recall_micro")
        .orderBy(col("k"))
    },
    Some {
      def chain(k: Int): String = {
        val r = k / 4
        s"""sig$k AS (SELECT doc_id, ${DuckOps.minhashSig("h", k)} AS sig FROM hs),
      bands$k AS (SELECT doc_id, b,
                ${DuckOps.foldHash(s"sig[b * $r + 1 : b * $r + $r]")} AS bucket
              FROM sig$k, unnest(range(0, 4)) AS t(b)),
      cand$k AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
               FROM bands$k a JOIN bands$k b
               ON a.b = b.b AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
      p$k AS (SELECT CAST($k AS BIGINT) AS k,
              CASE WHEN CAST(len(list_filter(range(1, $k + 1),
                i -> s1.sig[i] = s2.sig[i])) AS BIGINT) * 2 >= $k
                THEN 1 ELSE 0 END AS est_pos,
              CASE WHEN (CASE WHEN len(h1.h) + len(h2.h)
                    - len(list_intersect(h1.h, h2.h)) = 0 THEN 1000000
                  ELSE (CAST(len(list_intersect(h1.h, h2.h)) AS HUGEINT) * 1000000)
                    // (len(h1.h) + len(h2.h) - len(list_intersect(h1.h, h2.h)))
                  END) >= 500000 THEN 1 ELSE 0 END AS true_pos
            FROM cand$k
              JOIN sig$k s1 ON cand$k.d1 = s1.doc_id
              JOIN sig$k s2 ON cand$k.d2 = s2.doc_id
              JOIN hs h1 ON cand$k.d1 = h1.doc_id
              JOIN hs h2 ON cand$k.d2 = h2.doc_id),
      a$k AS (SELECT k, CAST(count(*) AS BIGINT) AS n_cands,
              CAST(COALESCE(sum(est_pos), 0) AS BIGINT) AS n_est,
              CAST(COALESCE(sum(true_pos), 0) AS BIGINT) AS n_true,
              CAST(COALESCE(sum(est_pos * true_pos), 0) AS BIGINT) AS n_both
            FROM p$k GROUP BY 1)"""
      }
      s"""WITH toks AS (SELECT doc_id, ${DuckOps.tokens("text")} AS t FROM documents),
      sh AS (SELECT doc_id, ${DuckOps.shingles("t", 3)} AS s FROM toks),
      hs AS (SELECT doc_id, list_distinct(
               list_transform(s, x -> ${DuckOps.strHash60("x")})) AS h FROM sh),
      ${chain(8)},
      ${chain(16)},
      u AS (SELECT * FROM a8 UNION ALL SELECT * FROM a16)
      SELECT k, n_cands, n_est, n_true, n_both,
        CAST(CASE WHEN n_est = 0 THEN 1000000
          ELSE (CAST(n_both AS HUGEINT) * 1000000) // n_est END AS BIGINT)
          AS precision_micro,
        CAST(CASE WHEN n_true = 0 THEN 1000000
          ELSE (CAST(n_both AS HUGEINT) * 1000000) // n_true END AS BIGINT)
          AS recall_micro
      FROM u ORDER BY k"""
    })
}
