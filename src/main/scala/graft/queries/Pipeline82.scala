package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Curate

/** Round-11 additions, part 47: the RIGHT OUTER stream-stream join
  * (the last join mode Structured Streaming supports that the
  * st-gates hadn't pinned) and incremental Gini maintenance over
  * mergeable value-frequency states.
  */
object Pipeline82 {

  def all: Seq[QueryDef] = Seq(st15, q89)

  /** Stream-stream RIGHT OUTER interval join through the real engine
    * ([[graft.streaming.EventStreams.errorPurchaseRightOuter]]):
    * matched pairs plus NULL rows for errors no purchase followed —
    * with st10/st11/st13/st14 this closes the FULL join-mode matrix
    * (every stream-stream mode Spark supports, gated through the
    * engine). st13's choreography: mid-month split, the rest, then
    * two typed sentinel-pair drops to push the global watermark past
    * the error-side state; the exploded error copies make raw output
    * over-complete, collapsed by the same reconcileFullOuter (its
    * purchase-NULL branch is empty here). Oracle: the plain batch
    * RIGHT JOIN. */
  val st15: QueryDef = QueryDef(
    "st15_engine_right_outer",
    (s, d) => {
      val ev = Tables.events(s, d).select(col("ts"), col("event_type"), col("event_id"))
      val root = new java.io.File(Pipeline43.streamRoot, "st15")
      val streamDir = new java.io.File(root, "stream")
      val ckpt = new java.io.File(root, "ckpt")
      val sink = new java.io.File(root, "sink")
      Pipeline43.deleteRec(streamDir); Pipeline43.deleteRec(ckpt)
      Pipeline43.deleteRec(sink)
      val base = System.currentTimeMillis()
      // single-lifetime waves (VERDICT r12 #5): same sentinel-PAIR
      // flush choreography as st11/st13 (see Pipeline61's comment),
      // each drop still its own micro-batch; resume stays gated by
      // st13, the join-matrix chaos representative
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
            .errorPurchaseRightOuter(stream)
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
      graft.streaming.EventStreams.reconcileFullOuter(
          s.read.parquet(sink.toString))
        .filter((col("p_id").isNull || col("p_id") >= 0) &&
          col("e_id") >= 0)
        .select(col("p_id"), col("e_id"), col("gap_us"))
        .orderBy(col("p_id"), col("e_id"))
    },
    Some("""WITH p AS (SELECT event_id AS p_id, ts AS p_ts FROM events
               WHERE event_type = 'purchase'),
      e AS (SELECT event_id AS e_id, ts AS e_ts FROM events
            WHERE event_type = 'error')
      SELECT p.p_id, e.e_id, epoch_us(p.p_ts - e.e_ts) AS gap_us
      FROM p RIGHT JOIN e
        ON p.p_ts >= e.e_ts AND p.p_ts < e.e_ts + INTERVAL 60 SECOND
      ORDER BY p_id, e_id"""))

  /** Incremental Gini: the corpus split into two deterministic-hash
    * slices, each reduced to its value-frequency STATE (the mergeable
    * histogram), states merged by union+sum, and q76's exact Gini
    * computed FROM THE MERGED STATE
    * ([[graft.operators.Curate.giniExactFromCounts]]). The oracle is
    * the plain one-shot Gini over all orders — the hash match IS the
    * associativity proof, for a HOLISTIC order statistic that q43/q44
    * (algebraic rollups, sketched distinct) could not cover.
    *
    * 100 TB shape: a maintained state touches only the new slice's
    * values per update; the Gini read costs O(distinct values) from
    * the state, never a history re-scan. */
  val q89: QueryDef = QueryDef(
    "q89_incremental_gini",
    (s, d) => {
      val base = Tables.orders(s, d).selectExpr("o_orderkey",
        "cast(round(o_totalprice * 100) as bigint) AS c")
      def stateOf(pred: String) = base.filter(expr(pred))
        .groupBy(col("c")).agg(count(lit(1)).as("cnt"))
      val merged = stateOf("o_orderkey % 2 = 0")
        .unionByName(stateOf("o_orderkey % 2 = 1"))
        .groupBy(col("c")).agg(sum(col("cnt")).as("cnt"))
      Curate.giniExactFromCounts(merged)
    },
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
}
