package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Bpe

/** Round-11 additions, part 8: the streaming engine's APPEND-mode
  * watermark finalization under the gate, the relational pivot
  * matrix, and tokenizer fertility through the trained BPE artifact.
  */
object Pipeline43 {

  def all: Seq[QueryDef] = Seq(st07, q65, t38)

  /** One shared per-JVM root for streaming-query file fixtures
    * (st07/st08 — the st06 / SparkEntry.fixtureRoot idiom: bench
    * reruns must not leak a temp dir per invocation). Removed on JVM
    * exit. */
  private[queries] lazy val streamRoot: java.io.File = {
    val dir = java.nio.file.Files.createTempDirectory("graft_st07").toFile
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def del(f: java.io.File): Unit = {
        val kids = f.listFiles()
        if (kids != null) kids.foreach(del)
        f.delete(): Unit
      }
      del(dir)
    }))
    dir
  }

  /** Write `df` as ONE parquet file named `<name>.parquet` under
    * `streamDir` with a controlled mod time (the file-stream source
    * picks files up oldest-first — mod times order the micro-batches;
    * the RESULT depends only on event times, never file times). */
  private[queries] def writeSlice(root: java.io.File, streamDir: java.io.File,
      df: org.apache.spark.sql.DataFrame, name: String, modTime: Long): Unit = {
    val tmp = new java.io.File(root, s"tmp_$name")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = tmp.listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .getOrElse(sys.error(s"no parquet part written under $tmp"))
    streamDir.mkdirs()
    val dst = new java.io.File(streamDir, s"$name.parquet")
    java.nio.file.Files.copy(part.toPath, dst.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    dst.setLastModified(modTime): Unit
  }

  private[queries] def deleteRec(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRec)
    f.delete(): Unit
  }

  /** Pre-compute ALL of a gate's stream-drop slices in ONE Spark job
    * (r17, guide §1.2: the fixtures were 2–4 separate
    * filter/agg + coalesce(1) writes, each its own job over the
    * events scan — pure fixture-prep overhead billed to the gate).
    * `df` carries a `__slice` column naming each row's drop; one
    * coalesce(1) partitioned write materializes every slice as a
    * single file under `root/tmp_slices/__slice=<name>/`.
    * [[dropSlice]] then publishes a slice into the stream dir as a
    * pure file copy at the wave boundary — no Spark job between
    * drains. The published bytes are row-identical to the former
    * per-slice writes (same rows, same data schema — partitionBy
    * stores the data columns in frame order minus `__slice`), so
    * micro-batch boundaries, watermark advancement and sink contents
    * — the semantics the gates prove — are untouched. */
  private[queries] def prepareSlices(root: java.io.File,
      df: org.apache.spark.sql.DataFrame): Unit =
    df.coalesce(1).write.mode("overwrite").partitionBy("__slice")
      .parquet(new java.io.File(root, "tmp_slices").toString)

  /** Publish a [[prepareSlices]] slice into `streamDir` with the
    * controlled mod time (the [[writeSlice]] contract, minus the
    * Spark job). */
  private[queries] def dropSlice(root: java.io.File, streamDir: java.io.File,
      name: String, modTime: Long): Unit = {
    val dir = new java.io.File(new java.io.File(root, "tmp_slices"), s"__slice=$name")
    val part = Option(dir.listFiles()).getOrElse(Array.empty)
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .getOrElse(sys.error(s"no parquet part written under $dir"))
    streamDir.mkdirs()
    val dst = new java.io.File(streamDir, s"$name.parquet")
    java.nio.file.Files.copy(part.toPath, dst.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    dst.setLastModified(modTime): Unit
  }

  /** SINGLE-LIFETIME multi-wave gate drive (VERDICT r12 #5): start
    * the streaming query ONCE over the (possibly still-empty) stream
    * dir, then for each wave write its file drop and drain with
    * `processAllAvailable` — the engine only discovers a drop after
    * the previous wave's drain, so each drop is still its OWN
    * micro-batch and watermark advancement between drops is preserved
    * exactly as in the stopped-and-resumed form, at a fraction of the
    * choreography cost (no checkpoint replay / stream re-init per
    * drop; r12 measured the st gates at 38% of the headline bench).
    * STOP-AND-RESUME chaos coverage deliberately stays on the class
    * representatives that test resume itself: st07 (append-mode
    * watermark carried across a resume), st12 (the run_id upsert
    * face), st13 (the join-matrix restart gate), plus
    * StreamingCompactionSpec's task-attempt chaos. */
  private[queries] def driveWaves(streamDir: java.io.File,
      start: () => org.apache.spark.sql.streaming.StreamingQuery,
      waves: Seq[() => Unit]): Unit = {
    streamDir.mkdirs()
    val q = start()
    try waves.foreach { w => w(); q.processAllAvailable() }
    finally q.stop()
  }

  /** [[driveWaves]] with the state-store partition count sized to the
    * gate's state: a stream-stream join commits EVERY state partition
    * of EVERY stateful operator on EVERY micro-batch (HDFS-backed
    * store: one delta file + CRC each), so a 32-partition session
    * pays hundreds of tiny synchronous writes per batch for state
    * that fits in a handful of partitions — measured 60-70% of the
    * r12 st-gate wall-clock. Partition count is a physical knob with
    * no semantic face (every gate's oracle is partition-count
    * independent, and a 100 TB deployment sizes it to state volume,
    * exactly as done here); the session's original setting is
    * restored after the drive. The deployable form of the sizing rule
    * is [[graft.streaming.EventStreams.stateStorePartitions]] /
    * `withStateStorePartitions` (VERDICT r13 #6) — the gates keep a
    * small fixed constant only because their state is a handful of
    * keys and the checkpoint freezes the count at first start.
    * Round 17 (VERDICT r16 #2): the constant drops 4 → 1 — per-batch
    * state-store open/commit file ops are per partition, and the
    * KB-scale gate state never needs parallelism (measured quick n≥3:
    * st13 7.47→6.61, st15 6.36→5.74, st11 6.06→5.52, st gate set
    * 36.7→33.9 s; oracles re-proven at sf0.01 AND sf0.001 — every
    * gate's result is partition-count independent). */
  private[queries] def withStatePartitions[T](s: org.apache.spark.sql.SparkSession,
      n: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val old = s.conf.get(key)
    s.conf.set(key, n.toString)
    try body finally s.conf.set(key, old)
  }

  private[queries] def driveWavesSized(s: org.apache.spark.sql.SparkSession,
      streamDir: java.io.File,
      start: () => org.apache.spark.sql.streaming.StreamingQuery,
      waves: Seq[() => Unit], statePartitions: Int = 1): Unit =
    withStatePartitions(s, statePartitions)(driveWaves(streamDir, start, waves))

  /** One STOPPED-AND-RESUMED run of the append-mode daily rollup
    * over whatever files `streamDir` currently holds: start from
    * `ckpt` (watermark and window state restored from the commit
    * log — the memory sink refuses recovery, so the sink is the
    * StreamingCompactionSpec idempotent per-batch-directory parquet
    * recipe), drain, stop. Calling it once per file drop guarantees
    * each drop is its own micro-batch — the watermark advance
    * between drops is the semantics under test (a single
    * `processAllAvailable` over a multi-file directory fuses the
    * files into one batch, where nothing is ever late). Batch ids
    * continue across the resume, so every finalized window lands in
    * exactly one `batch=N` directory under `sinkDir`. */
  private[queries] def appendDailyStart(s: org.apache.spark.sql.SparkSession,
      streamDir: java.io.File, ckpt: java.io.File, sinkDir: java.io.File,
      schema: org.apache.spark.sql.types.StructType)
      : () => org.apache.spark.sql.streaming.StreamingQuery = () => {
    val agg = s.readStream.schema(schema).parquet(streamDir.toString)
      .withWatermark("ts", "1 second")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
      .selectExpr("cast(to_date(window.start) as string) AS day",
        "event_type", "n", "cents")
    agg.writeStream.outputMode("append")
      .option("checkpointLocation", ckpt.toString)
      .foreachBatch((df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          id: Long) =>
        df.write.mode("overwrite").parquet(s"$sinkDir/batch=$id"))
      .start()
  }

  private[queries] def runAppendDaily(s: org.apache.spark.sql.SparkSession,
      streamDir: java.io.File, ckpt: java.io.File, sinkDir: java.io.File,
      schema: org.apache.spark.sql.types.StructType): Unit = {
    val q = appendDailyStart(s, streamDir, ckpt, sinkDir, schema)()
    try q.processAllAvailable() finally q.stop()
  }

  /** Streaming APPEND-mode watermark finalization, end to end
    * through the real micro-batch engine: st06 gated complete-mode
    * state; this gates the harder semantics — event-time watermark
    * advancement, window FINALIZATION (a window is emitted exactly
    * once, when the watermark passes its end), and state + watermark
    * carried across a STOP-AND-RESUME between two file drops split
    * at a pinned day boundary — each drop drains in its own run from
    * the shared checkpoint, guaranteeing the separation (one run
    * over both files can fuse them into a single micro-batch where
    * nothing is ever late; no late data here by construction, so
    * finalized windows hold their full-data contents). The engine's no-data
    * flush batch after the last file advances the watermark to
    * max(ts) - 1s, so the sink holds every daily window that closed
    * strictly before the stream's end — which is exactly what the
    * DuckDB oracle computes from the batch table: days whose window
    * end <= max(ts) - 1s. The LAST day never finalizes (its window
    * outlives the watermark) — that open tail is the defining
    * semantics of append mode, pinned here cross-engine.
    *
    * 100 TB shape: identical to st06's state argument — O(days ×
    * types) state regardless of volume, and append mode (unlike
    * complete) emits each window once and forgets it: the production
    * output mode for unbounded retention. */
  val st07: QueryDef = QueryDef(
    "st07_append_watermark",
    (s, d) => {
      val ev = Tables.events(s, d)
        .selectExpr("ts", "event_type", "cast(round(value * 100) as long) AS cents")
      val root = new java.io.File(streamRoot, "st07")
      val streamDir = new java.io.File(root, "stream")
      val ckpt = new java.io.File(root, "ckpt")
      val sink = new java.io.File(root, "sink")
      deleteRec(streamDir); deleteRec(ckpt); deleteRec(sink) // fresh per invocation
      // pinned clean split: drop 1 = days < Jan 16, drop 2 = the
      // rest; each drop is drained by its OWN stopped-and-resumed
      // run, so the watermark provably advances between them
      val base = System.currentTimeMillis()
      // state partitions sized to the gate's O(days × types) state
      // (see driveWavesSized scaladoc); the stop-and-resume
      // choreography itself — the semantics under test — is unchanged
      withStatePartitions(s, 1) {
        // both drops materialized by ONE job ([[prepareSlices]]) and
        // published as pure file copies — same bytes per drop as the
        // former two filter+write jobs, same micro-batch boundaries
        prepareSlices(root, ev.withColumn("__slice",
          when(col("ts") < lit("2024-01-16").cast("timestamp"), "batch1")
            .otherwise("batch2")))
        dropSlice(root, streamDir, "batch1", base - 60000L)
        runAppendDaily(s, streamDir, ckpt, sink, ev.schema)
        dropSlice(root, streamDir, "batch2", base)
        runAppendDaily(s, streamDir, ckpt, sink, ev.schema)
      }
      s.read.parquet(sink.toString)
        .select(col("day"), col("event_type"), col("n"), col("cents"))
        .orderBy(col("day"), col("event_type"))
    },
    Some("""WITH wm AS (SELECT max(ts) - INTERVAL 1 SECOND AS w FROM events),
      e AS (SELECT CAST(ts AS DATE) AS d, event_type,
              CAST(round(value * 100) AS BIGINT) AS cents FROM events)
      SELECT CAST(d AS VARCHAR) AS day, event_type,
        CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS cents
      FROM e, wm WHERE CAST(d AS TIMESTAMP) + INTERVAL 1 DAY <= wm.w
      GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Relational PIVOT: the order count matrix status × priority —
    * `groupBy.pivot` with the priority domain PINNED (never inferred:
    * inference is a extra distinct scan AND makes the output schema
    * data-dependent — at 100 TB the domain is a catalog, not a
    * discovery). Absent combinations are exact zeros on both sides. */
  val q65: QueryDef = QueryDef(
    "q65_pivot_matrix",
    (s, d) => Tables.orders(s, d)
      .groupBy(col("o_orderstatus"))
      .pivot("o_orderpriority",
        Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("o_orderstatus")),
    Some("""SELECT o_orderstatus,
        CAST(count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS BIGINT) AS "1-URGENT",
        CAST(count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS BIGINT) AS "2-HIGH",
        CAST(count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS BIGINT) AS "3-MEDIUM",
        CAST(count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS BIGINT) AS "4-NOT SPECIFIED",
        CAST(count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS BIGINT) AS "5-LOW"
      FROM orders GROUP BY 1 ORDER BY 1"""))

  /** Tokenizer fertility per source through the TRAINED tokenizer
    * ([[graft.operators.Bpe.encodeDocs]] under t13's merge table):
    * subwords-per-word and chars-per-subword — the two numbers that
    * price a tokenizer against a corpus slice (high fertility =
    * expensive tokens; the per-source split shows domain mismatch).
    * The encode is the t15-proven pure map; this adds one partial
    * agg by source. The oracle replays the full train+apply chain
    * (the shared Pipeline5 CTEs) and aggregates identically. */
  val t38: QueryDef = QueryDef(
    "t38_tokenizer_fertility",
    (s, d) => {
      import graft.operators.TextOps
      Bpe.encodeDocs(Tables.documents(s, d), "text", Pipeline5.BpeSteps)
        .selectExpr("source",
          s"cast(size(${TextOps.tokens("text")}) as bigint) AS nw",
          "cast(size(subwords) as bigint) AS ns",
          "aggregate(subwords, cast(0 as bigint), (a, x) -> a + length(x)) AS nc")
        .groupBy(col("source"))
        .agg(coalesce(sum(col("nw")), lit(0L)).as("n_words"),
          coalesce(sum(col("ns")), lit(0L)).as("n_subwords"),
          coalesce(sum(col("nc")), lit(0L)).as("n_chars"))
        .selectExpr("source", "n_words", "n_subwords",
          "cast((cast(n_subwords as decimal(38,0)) * 1000000) div n_words as bigint) AS fertility_micro",
          "cast((cast(n_chars as decimal(38,0)) * 1000000) div n_subwords as bigint) AS chars_per_subword_micro")
        .orderBy(col("source"))
    },
    Some {
      val steps = (1 to Pipeline5.BpeSteps)
        .map(k => Pipeline5.bpeStepSql(k, last = k == Pipeline5.BpeSteps)).mkString
      val applies = (1 to Pipeline5.BpeSteps)
        .map(k => Pipeline5.bpeApplySql(s"x$k", s"x${k - 1}", k)).mkString
      s"""${Pipeline5.bpePrefixSql}$steps,
      t0 AS (SELECT doc_id, ${DuckOps.tokens("text")} AS tl FROM documents),
      x0 AS (SELECT doc_id, i,
               list_transform(range(1, length(tl[i]) + 1), q -> substr(tl[i], q, 1)) AS syms
             FROM t0, unnest(range(1, len(tl) + 1)) AS u(i))$applies,
      enc AS (SELECT doc_id, flatten(list(syms ORDER BY i)) AS sub
              FROM x${Pipeline5.BpeSteps} GROUP BY doc_id),
      agg AS (SELECT d.source,
          CAST(sum(coalesce(len(t.tl), 0)) AS BIGINT) AS n_words,
          CAST(sum(coalesce(len(e.sub), 0)) AS BIGINT) AS n_subwords,
          CAST(sum(coalesce(list_sum(list_transform(e.sub, s -> length(s))), 0)) AS BIGINT) AS n_chars
        FROM documents d
          LEFT JOIN t0 t ON d.doc_id = t.doc_id
          LEFT JOIN enc e ON d.doc_id = e.doc_id
        GROUP BY 1)
      SELECT source, n_words, n_subwords,
        CAST((CAST(n_subwords AS HUGEINT) * 1000000) // n_words AS BIGINT)
          AS fertility_micro,
        CAST((CAST(n_chars AS HUGEINT) * 1000000) // n_subwords AS BIGINT)
          AS chars_per_subword_micro
      FROM agg ORDER BY source"""
    })
}
