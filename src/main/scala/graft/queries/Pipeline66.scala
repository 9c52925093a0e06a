package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Round-11 additions, part 31: the 2-D skyline (Pareto frontier)
  * operator family, and UPDATE output mode through the real
  * streaming engine — the one output mode the st-gates had not yet
  * pinned (st06 complete, st07/st09/st10/st11 append).
  */
object Pipeline66 {

  def all: Seq[QueryDef] = Seq(q79, st12)

  /** 2-D skyline / Pareto frontier (Börzsönyi et al., ICDE 2001) of
    * orders under (minimize order date, maximize value): the
    * record-setting orders no other order beats on both axes. The
    * classic O(n log n) decomposition replaces the naive N²
    * dominance test: per-day max (a date-domain-sized partial agg),
    * a running max over STRICTLY earlier days on that daily frame,
    * and an order survives iff it equals its day's max and strictly
    * exceeds every earlier day's. The oracle replays the same
    * windows; the spec cross-checks the window form against the N²
    * NOT EXISTS definition.
    *
    * 100 TB shape: one date-keyed partial agg + a broadcast of the
    * date-domain frame back onto the scan — the single-partition
    * window runs over days, never orders (the q75 discipline). */
  val q79: QueryDef = QueryDef(
    "q79_skyline",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val o = Tables.orders(s, d).selectExpr("o_orderkey",
        "cast(o_orderdate as string) AS day",
        "cast(round(o_totalprice * 100) as bigint) AS cents")
      val daily = o.groupBy(col("day")).agg(max(col("cents")).as("dmax"))
      val r = daily.withColumn("runprev", max(col("dmax")).over(
        Window.orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, -1)))
      o.join(broadcast(r), Seq("day"))
        .filter(col("cents") === col("dmax") &&
          (col("runprev").isNull || col("cents") > col("runprev")))
        .select(col("o_orderkey"), col("day"), col("cents"))
        .orderBy(col("day"), col("o_orderkey"))
    },
    Some("""WITH o AS (SELECT o_orderkey, CAST(o_orderdate AS VARCHAR) AS day,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
      daily AS (SELECT day, CAST(max(cents) AS BIGINT) AS dmax FROM o GROUP BY 1),
      r AS (SELECT day, dmax, CAST(max(dmax) OVER (ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT)
              AS runprev
            FROM daily)
      SELECT o.o_orderkey, o.day, o.cents
      FROM o JOIN r ON o.day = r.day
      WHERE o.cents = r.dmax AND (r.runprev IS NULL OR o.cents > r.runprev)
      ORDER BY o.day, o.o_orderkey"""))

  /** UPDATE output mode through the real engine: daily per-type
    * counts aggregated across two stopped-and-resumed drops (split
    * at the pinned mid-month boundary), emitted in update mode —
    * each micro-batch re-emits ONLY the keys it changed — and
    * reconstructed by last-emission-wins per key. The hash-compared
    * result pins the mode's delta semantics, not just the final
    * counts: `last_batch` is the batch id of each key's final
    * emission, so a key whose events all land in drop 1 MUST carry
    * batch 0 (complete mode would re-emit everything in the final
    * batch and flunk the column; append mode would emit nothing
    * until finalization). The pinned marker is the RUN index, not
    * the engine batch id — the engine interleaves no-data flush
    * batches whose ids are an implementation detail (observed: the
    * second run's data batch landed as id 2, not 1). The 30-day
    * watermark makes the aggregate update-compatible while provably
    * evicting nothing inside the one-month corpus. */
  val st12: QueryDef = QueryDef(
    "st12_engine_update_upsert",
    (s, d) => {
      val ev = Tables.events(s, d).select(col("ts"), col("event_type"), col("event_id"))
      val root = new java.io.File(Pipeline43.streamRoot, "st12")
      val streamDir = new java.io.File(root, "stream")
      val ckpt = new java.io.File(root, "ckpt")
      val sink = new java.io.File(root, "sink")
      Pipeline43.deleteRec(streamDir); Pipeline43.deleteRec(ckpt)
      Pipeline43.deleteRec(sink)
      val base = System.currentTimeMillis()
      def run(runId: Int): Unit = {
        val stream = s.readStream.schema(ev.schema).parquet(streamDir.toString)
        val agg = stream
          .withWatermark("ts", "30 days")
          .groupBy(window(col("ts"), "1 day"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .selectExpr("unix_millis(window.start) AS day_ms", "event_type", "n")
        val q = agg.writeStream.outputMode("update")
          .option("checkpointLocation", ckpt.toString)
          .foreachBatch((df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
              id: Long) =>
            df.withColumn("run_id", lit(runId.toLong))
              .withColumn("batch_id", lit(id))
              .write.mode("overwrite").parquet(s"$sink/batch=$id"))
          .start()
        try q.processAllAvailable() finally q.stop()
      }
      // state partitions sized to the gate's O(days × types) state
      // (Pipeline43.driveWavesSized scaladoc); the stop-and-resume
      // run_id choreography — the semantics under test — is unchanged
      Pipeline43.withStatePartitions(s, 1) {
        // both drops materialized by ONE job (Pipeline43.prepareSlices)
        // and published as pure file copies — same bytes per drop,
        // same micro-batch boundaries
        Pipeline43.prepareSlices(root, ev.withColumn("__slice",
          when(col("ts") < lit("2024-01-16").cast("timestamp"), "batch1")
            .otherwise("batch2")))
        Pipeline43.dropSlice(root, streamDir, "batch1", base - 60000L)
        run(0)
        Pipeline43.dropSlice(root, streamDir, "batch2", base)
        run(1)
      }
      import org.apache.spark.sql.expressions.Window
      s.read.parquet(sink.toString)
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("day_ms"), col("event_type"))
            .orderBy(col("run_id").desc, col("batch_id").desc)))
        .filter(col("rk") === 1)
        .selectExpr("day_ms", "event_type", "n", "run_id AS last_run")
        .orderBy(col("day_ms"), col("event_type"))
    },
    Some("""SELECT epoch_ms(date_trunc('day', ts)) AS day_ms, event_type,
        CAST(count(*) AS BIGINT) AS n,
        CAST(CASE WHEN max(ts) >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END
          AS BIGINT) AS last_run
      FROM events GROUP BY 1, 2 ORDER BY 1, 2"""))
}
