package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Round-11 additions, part 26: the stream-stream LEFT OUTER join
  * through the real engine — watermark-driven NULL emission and
  * join-state eviction, the semantic st10's inner join cannot reach.
  */
object Pipeline61 {

  def all: Seq[QueryDef] = Seq(st11)

  /** Stream-stream LEFT OUTER interval join through the real engine
    * ([[graft.streaming.EventStreams.purchasesWithErrorAttribution]]):
    * every purchase attributed to the errors it trails within 60 s,
    * or emitted ONCE with NULLs when the watermark proves no matching
    * error can still arrive. Driven across three stopped-and-resumed
    * drops: a mid-month split (cross-drop matches must survive in
    * join state), the rest, then far-future SENTINEL PAIRS whose
    * only job is to push the global watermark past every open match
    * horizon — the engine then emits the tail's unmatched purchases
    * as NULL rows from state, which is precisely the behavior under
    * test (an early stop would BUFFER them, not drop them). The
    * oracle is the plain batch left join; parity means
    * the engine's incremental NULL emission reconstructed the batch
    * answer exactly — no duplicate NULLs (matched-then-NULL) and no
    * lost tails. */
  val st11: QueryDef = QueryDef(
    "st11_engine_outer_join",
    (s, d) => {
      val ev = Tables.events(s, d).select(col("ts"), col("event_type"), col("event_id"))
      val root = new java.io.File(Pipeline43.streamRoot, "st11")
      val streamDir = new java.io.File(root, "stream")
      val ckpt = new java.io.File(root, "ckpt")
      val sink = new java.io.File(root, "sink")
      Pipeline43.deleteRec(streamDir); Pipeline43.deleteRec(ckpt)
      Pipeline43.deleteRec(sink)
      val base = System.currentTimeMillis()
      // Flush choreography (drops 3/4). Catalyst pushes the type
      // filters BELOW the watermark nodes, so a sentinel only
      // advances a side's watermark if it IS that side's type — each
      // flush drop is a real (error, purchase) pair, 2 and 3 days
      // past the corpus max (a day apart, so the sentinels can never
      // join each other or anything real). The global watermark is
      // the min across both sides, hence the PAIR; and a batch's
      // watermark only applies to the NEXT batch, hence TWO drops —
      // the first raises the watermark past every real horizon, the
      // second is the batch in which the engine drains the evicted
      // tail as NULL rows (with one drop the drain would ride the
      // optional no-data cleanup batch and race q.stop()). Negative
      // sentinel ids are excluded from the sink read; the sentinel
      // purchases themselves stay buffered in state, never emitted —
      // by the same rule under test. Single-lifetime waves (VERDICT
      // r12 #5): each drop still lands in its own micro-batch; resume
      // stays gated by st13, the join-matrix chaos representative.
      def sentinel(days: Int) =
        ev.agg(max(col("ts")).as("m"))
          .selectExpr(s"timestampadd(DAY, $days, m) AS ts",
            "'error' AS event_type", s"-${days}L AS event_id")
          .unionAll(ev.agg(max(col("ts")).as("m"))
            .selectExpr(s"timestampadd(DAY, ${days + 1}, m) AS ts",
              "'purchase' AS event_type", s"-${days + 1}L AS event_id"))
      // all four drops materialized by ONE job
      // (Pipeline43.prepareSlices): the split rides a CASE label over
      // a single scan, the sentinel pairs union on top; each wave is
      // then a pure file copy — same bytes per drop, same micro-batch
      // boundaries
      Pipeline43.prepareSlices(root, ev.withColumn("__slice",
          when(col("ts") < lit("2024-01-16").cast("timestamp"), "batch1")
            .otherwise("batch2"))
        .unionAll(sentinel(2).withColumn("__slice", lit("batch3")))
        .unionAll(sentinel(4).withColumn("__slice", lit("batch4"))))
      Pipeline43.driveWavesSized(s, streamDir,
        () => {
          val stream = s.readStream.schema(ev.schema).parquet(streamDir.toString)
          val joined = graft.streaming.EventStreams
            .purchasesWithErrorAttribution(stream)
            .selectExpr("p_id", "e_id",
              "unix_micros(p_ts) - unix_micros(e_ts) AS gap_us")
          joined.writeStream.outputMode("append")
            .option("checkpointLocation", ckpt.toString)
            .foreachBatch((df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                id: Long) =>
              df.write.mode("overwrite").parquet(s"$sink/batch=$id"))
            .start()
        },
        Seq(
          () => Pipeline43.dropSlice(root, streamDir, "batch1", base - 60000L),
          () => Pipeline43.dropSlice(root, streamDir, "batch2", base),
          () => Pipeline43.dropSlice(root, streamDir, "batch3", base + 60000L),
          () => Pipeline43.dropSlice(root, streamDir, "batch4", base + 120000L)))
      s.read.parquet(sink.toString)
        .filter(col("p_id") >= 0)
        .select(col("p_id"), col("e_id"), col("gap_us"))
        .orderBy(col("p_id"), col("e_id"))
    },
    Some("""WITH p AS (SELECT event_id AS p_id, ts AS p_ts FROM events
               WHERE event_type = 'purchase'),
      e AS (SELECT event_id AS e_id, ts AS e_ts FROM events
            WHERE event_type = 'error')
      SELECT p.p_id, e.e_id, epoch_us(p.p_ts - e.e_ts) AS gap_us
      FROM p LEFT JOIN e
        ON p.p_ts >= e.e_ts AND p.p_ts < e.e_ts + INTERVAL 60 SECOND
      ORDER BY p_id, e_id"""))
}
