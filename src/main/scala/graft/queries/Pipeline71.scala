package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Round-11 additions, part 36: the FULL OUTER stream-stream
  * interval join — closing the join-type matrix the st-gates pin
  * through the real engine (inner st10, left outer st11, full
  * outer here).
  */
object Pipeline71 {

  def all: Seq[QueryDef] = Seq(st13)

  /** Stream-stream FULL OUTER interval join through the real engine
    * ([[graft.streaming.EventStreams.errorPurchaseFullOuter]]):
    * matched (purchase ← error) pairs within 60 s, NULL rows for
    * unmatched purchases AND for errors no purchase ever followed —
    * the both-sides eviction path neither st10 (inner) nor st11
    * (left) exercises. Same choreography as st11: a mid-month
    * split, the rest, then two typed sentinel-PAIR drops to raise
    * the global watermark and drain both sides' state. The errors
    * side explodes into ≤2 window buckets (the key that keeps join
    * state bucket-local at 100 TB), so the raw sink is
    * over-complete by construction — each unmatched error COPY
    * emits a NULL row; [[graft.streaming.EventStreams
    * .reconcileFullOuter]] collapses that multiplicity, and parity
    * against the plain batch FULL JOIN proves the
    * (bucketed-engine-join + reconciliation) pair reconstructs
    * exact full-outer semantics end to end. */
  val st13: QueryDef = QueryDef(
    "st13_engine_full_outer",
    (s, d) => {
      val ev = Tables.events(s, d).select(col("ts"), col("event_type"), col("event_id"))
      val root = new java.io.File(Pipeline43.streamRoot, "st13")
      val streamDir = new java.io.File(root, "stream")
      val ckpt = new java.io.File(root, "ckpt")
      val sink = new java.io.File(root, "sink")
      Pipeline43.deleteRec(streamDir); Pipeline43.deleteRec(ckpt)
      Pipeline43.deleteRec(sink)
      val base = System.currentTimeMillis()
      def run(): Unit = {
        val stream = s.readStream.schema(ev.schema).parquet(streamDir.toString)
        val joined = graft.streaming.EventStreams
          .errorPurchaseFullOuter(stream)
          .selectExpr("p_id", "e_id",
            "unix_micros(p_ts) - unix_micros(e_ts) AS gap_us")
        val q = joined.writeStream.outputMode("append")
          .option("checkpointLocation", ckpt.toString)
          .foreachBatch((df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
              id: Long) =>
            df.write.mode("overwrite").parquet(s"$sink/batch=$id"))
          .start()
        try q.processAllAvailable() finally q.stop()
      }
      // state partitions sized to the gate's watermark-bounded join
      // state (Pipeline43.driveWavesSized scaladoc); st13 KEEPS the
      // full stop-and-resume chaos — it is the join-matrix restart
      // representative (VERDICT r12 #5)
      def sentinel(days: Int) =
        ev.agg(max(col("ts")).as("m"))
          .selectExpr(s"timestampadd(DAY, $days, m) AS ts",
            "'error' AS event_type", s"-${days}L AS event_id")
          .unionAll(ev.agg(max(col("ts")).as("m"))
            .selectExpr(s"timestampadd(DAY, ${days + 1}, m) AS ts",
              "'purchase' AS event_type", s"-${days + 1}L AS event_id"))
      Pipeline43.withStatePartitions(s, 1) {
        // all four drops materialized by ONE job
        // (Pipeline43.prepareSlices) and published as pure file
        // copies; the stop-and-resume chaos choreography — the
        // semantics under test — is unchanged
        Pipeline43.prepareSlices(root, ev.withColumn("__slice",
            when(col("ts") < lit("2024-01-16").cast("timestamp"), "batch1")
              .otherwise("batch2"))
          .unionAll(sentinel(2).withColumn("__slice", lit("batch3")))
          .unionAll(sentinel(4).withColumn("__slice", lit("batch4"))))
        Pipeline43.dropSlice(root, streamDir, "batch1", base - 60000L)
        run()
        Pipeline43.dropSlice(root, streamDir, "batch2", base)
        run()
        for ((name, off) <- Seq(("batch3", 60000L), ("batch4", 120000L))) {
          Pipeline43.dropSlice(root, streamDir, name, base + off)
          run()
        }
      }
      graft.streaming.EventStreams.reconcileFullOuter(
          s.read.parquet(sink.toString))
        .filter((col("p_id").isNull || col("p_id") >= 0) &&
          (col("e_id").isNull || col("e_id") >= 0))
        .select(col("p_id"), col("e_id"), col("gap_us"))
        .orderBy(col("p_id"), col("e_id"))
    },
    Some("""WITH p AS (SELECT event_id AS p_id, ts AS p_ts FROM events
               WHERE event_type = 'purchase'),
      e AS (SELECT event_id AS e_id, ts AS e_ts FROM events
            WHERE event_type = 'error')
      SELECT p.p_id, e.e_id, epoch_us(p.p_ts - e.e_ts) AS gap_us
      FROM p FULL JOIN e
        ON p.p_ts >= e.e_ts AND p.p_ts < e.e_ts + INTERVAL 60 SECOND
      ORDER BY p_id, e_id"""))
}
