package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Round-11 additions, part 17: the ENGINE's session_window
  * sessionization under append-mode watermark finalization, and the
  * median absolute deviation.
  */
object Pipeline52 {

  def all: Seq[QueryDef] = Seq(st09, q69)

  /** Engine sessionization under append-mode finalization: st01/st02
    * gate the BATCH faces of gap sessionization; this drives the
    * real micro-batch engine — `session_window` state with session
    * MERGING across two stopped-and-resumed file drops (a session
    * spanning the pinned Jan-16 split is held open by run 1 and
    * extended by run 2), emitted exactly once when the watermark
    * passes the session end (last event + gap). The sink holds every
    * session that CLOSED before max(ts) − 1 s; sessions still inside
    * their gap window at stream end stay open forever — append
    * mode's defining tail, pinned cross-engine. The oracle replays
    * batch island sessionization (st01's SQL) filtered to closed
    * sessions. */
  val st09: QueryDef = QueryDef(
    "st09_engine_sessions",
    (s, d) => {
      val ev = Tables.events(s, d)
        .selectExpr("ts", "user_id", "cast(round(value * 100) as long) AS cents")
      val root = new java.io.File(Pipeline43.streamRoot, "st09")
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
      // single-lifetime waves (VERDICT r12 #5): cross-drop session
      // stitching only needs the drops in separate micro-batches;
      // resume itself stays gated by st07/st12/st13
      Pipeline43.driveWavesSized(s, streamDir,
        () => {
          val agg = s.readStream.schema(ev.schema).parquet(streamDir.toString)
            .withWatermark("ts", "1 second")
            .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
            .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("total_cents"))
            .selectExpr("user_id",
              "unix_millis(session_window.start) AS start_ms",
              "unix_millis(session_window.end - interval 30 minutes) AS end_ms",
              "n_events", "total_cents")
          agg.writeStream.outputMode("append")
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
        .select(col("user_id"), col("start_ms"), col("end_ms"),
          col("n_events"), col("total_cents"))
        .orderBy(col("user_id"), col("start_ms"))
    },
    Some("""WITH e AS (
        SELECT user_id, epoch_ms(ts) AS t, event_id,
          CAST(round(value * 100) AS BIGINT) AS cents
        FROM events),
      flagged AS (
        SELECT user_id, t, cents,
          CASE WHEN t - lag(t) OVER w > 1800000 OR lag(t) OVER w IS NULL
               THEN 1 ELSE 0 END AS new_session
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
      numbered AS (
        SELECT user_id, t, cents,
          sum(new_session) OVER (PARTITION BY user_id ORDER BY t
                                 ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged),
      sess AS (SELECT user_id, min(t) AS start_ms, max(t) AS end_ms,
                 CAST(count(*) AS BIGINT) AS n_events,
                 CAST(sum(cents) AS BIGINT) AS total_cents
               FROM numbered GROUP BY user_id, session_id),
      wm AS (SELECT epoch_ms(max(ts) - INTERVAL 1 SECOND) AS w FROM events)
      SELECT user_id, start_ms, end_ms, n_events, total_cents
      FROM sess, wm WHERE end_ms + 1800000 <= wm.w
      ORDER BY user_id, start_ms"""))

  /** Median absolute deviation — the robust scale estimate
    * (outlier-immune where stddev is not): MAD = median(|x − median|)
    * over order totals in cents. Both medians are the q33-proven
    * exact interpolated percentile (one IEEE chain from integers),
    * micro-quantized at the end; the deviation column stays exact
    * integer-ish (|cents − median| is one subtract on an exact
    * double). Two passes: a 1-row median broadcast, then the
    * deviation median. */
  val q69: QueryDef = QueryDef(
    "q69_mad",
    (s, d) => {
      val cents = Tables.orders(s, d)
        .selectExpr("cast(round(o_totalprice * 100) as bigint) AS c")
      val med = cents.agg(expr("percentile(c, 0.5)").as("m"))
      cents.crossJoin(broadcast(med))
        .selectExpr("abs(cast(c as double) - m) AS dev", "m")
        .groupBy(col("m"))
        .agg(count(lit(1)).as("n"), expr("percentile(dev, 0.5)").as("mad"))
        .selectExpr("n",
          "cast(round(m * 1000) as bigint) AS median_milli",
          "cast(round(mad * 1000) as bigint) AS mad_milli")
    },
    Some("""WITH c AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c
               FROM orders),
      m AS (SELECT quantile_cont(c, 0.5) AS m FROM c),
      d AS (SELECT abs(CAST(c.c AS DOUBLE) - m.m) AS dev, m.m FROM c, m)
      SELECT CAST(count(*) AS BIGINT) AS n,
        CAST(round(max(m) * 1000) AS BIGINT) AS median_milli,
        CAST(round(quantile_cont(dev, 0.5) * 1000) AS BIGINT) AS mad_milli
      FROM d"""))
}
