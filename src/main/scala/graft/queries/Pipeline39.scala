package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Round-11 additions, part 4: the micro-batch streaming ENGINE under
  * the correctness gate.
  */
object Pipeline39 {

  def all: Seq[QueryDef] = Seq(st06)

  /** Streaming-engine daily rollup: st01–st05 register the BATCH
    * faces of the streaming operators; this query drives the actual
    * micro-batch engine end to end inside the correctness gate — a
    * `readStream` parquet source over the events table, the q43
    * rollup aggregation under `outputMode(complete)`, a memory sink
    * drained with `processAllAvailable`, and the sink table returned
    * as the result. The DuckDB oracle is the same single-pass rollup
    * q43 pins, so the gate asserts the ENGINE (source listing,
    * micro-batch planning, state store, complete-mode sink) agrees
    * cell-exactly with the batch plan.
    *
    * 100 TB shape: the aggregation state is O(days × types) rows
    * regardless of event volume (the [[graft.operators.Incremental]]
    * algebraic-state argument); in production the same plan runs
    * against a file/Kafka source with a watermark and an append sink
    * — complete-mode + memory sink here is the deterministic test
    * harness face, while the state-store behavior being gated is the
    * same. */
  val st06: QueryDef = QueryDef(
    "st06_engine_rollup",
    (s, d) => {
      val schema = Tables.events(s, d).schema
      val tbl = "st06_engine_rollup_sink"
      // stream the table dir with a name filter: the file-stream
      // source needs a DIRECTORY path (its per-batch relation takes
      // the stream path as basePath), so pointing at the file
      // directly trips the basePath-must-be-a-directory check
      val stream = s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(d)
      val agg = stream
        .selectExpr("cast(to_date(ts) as string) AS day", "event_type",
          "cast(round(value * 100) as long) AS cents")
        .groupBy(col("day"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"),
          min(col("cents")).as("min_cents"), max(col("cents")).as("max_cents"))
      val q = agg.writeStream.outputMode("complete").format("memory")
        .queryName(tbl).start()
      try q.processAllAvailable() finally q.stop()
      s.table(tbl).orderBy(col("day"), col("event_type"))
    },
    Some("""WITH e AS (SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
               event_type, CAST(round(value * 100) AS BIGINT) AS cents
             FROM events)
      SELECT day, event_type, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(cents) AS BIGINT) AS cents,
        CAST(min(cents) AS BIGINT) AS min_cents,
        CAST(max(cents) AS BIGINT) AS max_cents
      FROM e GROUP BY 1, 2 ORDER BY 1, 2"""))
}
