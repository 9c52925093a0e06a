package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-stream analytics over the batch `events` table — the
  * funnel / cohort / operational layer that sits beside the streaming
  * sessionization operators ([[graft.streaming.EventStreams]]): the
  * questions a product team asks of the same event log the pipeline
  * ingests.
  *
  * All operators are compositions of equi-joins and partial
  * aggregations keyed by user or day — no driver-side state beyond
  * the stage list, no windows over unbounded partitions, nothing
  * quadratic. Timestamp arithmetic is exact integer microseconds
  * (differences of timestamps are TZ-offset-free), so results
  * hash-compare across engines.
  */
object Events {

  /** Ordered conversion funnel: stage i counts users whose earliest
    * qualifying stage-i event falls STRICTLY after their stage-(i−1)
    * time (the classic "did the click happen after the view"
    * semantics; an equal timestamp does not qualify). Returns one row
    * per stage: (stage_idx from 1, stage, n_users).
    *
    * 100 TB shape: per stage ONE type-filtered scan + an equi-join on
    * the shrinking per-user frontier + a user-keyed partial agg — the
    * frontier frame is at most one row per user, and each stage's
    * count is an O(1)-row aggregate. Stage count is the tiny driver
    * constant (the list you pass), never data-dependent. */
  def funnel(events: DataFrame, typeCol: String, userCol: String,
      tsCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct.size == stages.size, s"duplicate funnel stage in $stages")
    var frontier = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol).as("uid"))
      .agg(min(col(tsCol)).as("t"))
    val counts = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def stageCount(i: Int, f: DataFrame): DataFrame =
      f.agg(count(lit(1)).as("n_users"))
        .selectExpr(s"${i + 1}L AS stage_idx", s"'${stages(i)}' AS stage", "n_users")
    counts += stageCount(0, frontier)
    stages.zipWithIndex.drop(1).foreach { case (st, i) =>
      frontier = events.filter(col(typeCol) === st)
        .select(col(userCol).as("uid"), col(tsCol).as("ets"))
        .join(frontier, Seq("uid"))
        .filter(col("ets") > col("t"))
        .groupBy(col("uid"))
        .agg(min(col("ets")).as("t"))
      counts += stageCount(i, frontier)
    }
    counts.reduce(_ unionByName _)
  }

  /** The [[funnel]] frontier with the stage-0 anchor time carried
    * through: returns one row per user who completed EVERY stage —
    * (uid, t0 = earliest stage-0 time, t = the completing stage's
    * earliest qualifying time). Same per-stage equi-join shape; the
    * anchor rides the frontier as a min-aggregated constant. */
  def funnelCompletions(events: DataFrame, typeCol: String, userCol: String,
      tsCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct.size == stages.size, s"duplicate funnel stage in $stages")
    var frontier = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol).as("uid"))
      .agg(min(col(tsCol)).as("t"))
      .withColumn("t0", col("t"))
    stages.drop(1).foreach { st =>
      frontier = events.filter(col(typeCol) === st)
        .select(col(userCol).as("uid"), col(tsCol).as("ets"))
        .join(frontier, Seq("uid"))
        .filter(col("ets") > col("t"))
        .groupBy(col("uid"))
        .agg(min(col("ets")).as("t"), min(col("t0")).as("t0"))
    }
    frontier.select(col("uid"), col("t0"), col("t"))
  }

  /** [[funnel]] broken down by a small user dimension: each stage's
    * surviving frontier joins the BROADCAST (uid, segment) dim and
    * counts per segment — (stage_idx, stage, segment, n_users). Same
    * per-stage equi-join shape as [[funnel]]; the extra cost per stage
    * is one broadcast probe + a segment-keyed partial agg over the
    * one-row-per-user frontier. */
  def funnelBy(events: DataFrame, typeCol: String, userCol: String,
      tsCol: String, stages: Seq[String], dim: DataFrame): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct.size == stages.size, s"duplicate funnel stage in $stages")
    var frontier = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol).as("uid"))
      .agg(min(col(tsCol)).as("t"))
    def stageCounts(i: Int, f: DataFrame): DataFrame =
      f.join(broadcast(dim), Seq("uid"))
        .groupBy(col("segment"))
        .agg(count(lit(1)).as("n_users"))
        .selectExpr(s"${i + 1}L AS stage_idx", s"'${stages(i)}' AS stage",
          "segment", "n_users")
    val counts = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    counts += stageCounts(0, frontier)
    stages.zipWithIndex.drop(1).foreach { case (st, i) =>
      frontier = events.filter(col(typeCol) === st)
        .select(col(userCol).as("uid"), col(tsCol).as("ets"))
        .join(frontier, Seq("uid"))
        .filter(col("ets") > col("t"))
        .groupBy(col("uid"))
        .agg(min(col("ets")).as("t"))
      counts += stageCounts(i, frontier)
    }
    counts.reduce(_ unionByName _)
  }

  /** Session-scoped funnel: like [[funnel]], but the whole stage
    * chain must complete inside ONE gap-based session (the st01
    * sessionization semantics — a new session starts after
    * `gapMinutes` of user inactivity). Sessions are assigned by the
    * classic gaps-and-islands recurrence (per-user lag + cumulative
    * flag sum — ONE user-keyed window shuffle, spillable external
    * sort), then the [[funnel]] frontier runs keyed by
    * (user, session). Returns (stage_idx, stage, n_sessions).
    *
    * Equal-timestamp ties need no tie-break for CORRECTNESS here: a
    * tied pair contributes lag-delta 0 < gap in either order, so both
    * rows land in the same session whichever way the engine orders
    * them. */
  def sessionFunnel(events: DataFrame, typeCol: String, userCol: String,
      tsCol: String, stages: Seq[String], gapMinutes: Long): DataFrame = {
    require(gapMinutes >= 1L, s"gapMinutes must be >= 1, got $gapMinutes")
    val gapMs = gapMinutes * 60000L
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol))
    val prev = lag(col("t_ms"), 1).over(w)
    val keyed = events
      .withColumn("t_ms", expr(s"unix_millis($tsCol)"))
      .withColumn("ns",
        when(prev.isNull || col("t_ms") - prev > gapMs, 1L).otherwise(0L))
      .withColumn("sid", sum(col("ns")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .withColumn("skey", concat_ws("#", col(userCol), col("sid")))
    funnel(keyed, typeCol, "skey", tsCol, stages)
      .withColumnRenamed("n_users", "n_sessions")
  }

  /** Day-grain retention cohorts: users grouped by their FIRST active
    * day, counted on each later day-offset they were active
    * (0 = the cohort day itself). Returns
    * (cohort_day 'yyyy-MM-dd', day_offset, n_users) for offsets in
    * [0, maxOffset]. One user-keyed agg for first days, one distinct
    * over (user, day), one equi-join, one partial-agg shuffle. */
  def retentionCohorts(events: DataFrame, userCol: String, tsCol: String,
      maxOffset: Int): DataFrame = {
    require(maxOffset >= 0, s"maxOffset must be >= 0, got $maxOffset")
    val first = events.groupBy(col(userCol).as("uid"))
      .agg(min(to_date(col(tsCol))).as("d0"))
    val active = events
      .select(col(userCol).as("uid"), to_date(col(tsCol)).as("d"))
      .distinct()
    active.join(first, Seq("uid"))
      .selectExpr("d0", "datediff(d, d0) AS day_offset")
      .filter(col("day_offset").between(0, maxOffset))
      .groupBy(col("d0"), col("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .selectExpr("cast(d0 as string) AS cohort_day",
        "cast(day_offset as bigint) AS day_offset", "n_users")
  }

  /** RFM (recency / frequency / monetary) segmentation: per user the
    * days since last activity (vs the corpus's own max day), event
    * count, and exact cent total, each scored 1–4 against the EXACT
    * interpolated quartiles of the per-user distribution, composed
    * into the classic 3-digit segment code (recency digit inverted so
    * 4 = most recent).
    *
    * 100 TB shape: one user-keyed partial agg to O(users) rows, one
    * 1-row quartile aggregate over that (exact `percentile` — the
    * q33-proven cross-engine parity with DuckDB's quantile_cont),
    * broadcast back for a map-side bucket compare. NO global ntile
    * window — a rank-based quartile would collapse the whole user
    * table into one sort partition; threshold comparison keeps the
    * scoring embarrassingly parallel. */
  def rfmSegments(events: DataFrame, userCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val per = events
      .selectExpr(s"$userCol AS user_id", s"to_date($tsCol) AS d",
        s"cast(round($valueCol * 100) as long) AS cents")
      .groupBy(col("user_id"))
      .agg(max(col("d")).as("last_d"),
        count(lit(1)).as("freq"),
        sum(col("cents")).as("monetary_cents"))
    val maxD = events.agg(max(to_date(col(tsCol))).as("corpus_max_d"))
    val aged = per.crossJoin(broadcast(maxD))
      .selectExpr("user_id", "cast(datediff(corpus_max_d, last_d) as bigint) AS age_days",
        "freq", "monetary_cents")
    val qs = aged.agg(
      expr("percentile(age_days, 0.25)").as("aq1"),
      expr("percentile(age_days, 0.5)").as("aq2"),
      expr("percentile(age_days, 0.75)").as("aq3"),
      expr("percentile(freq, 0.25)").as("fq1"),
      expr("percentile(freq, 0.5)").as("fq2"),
      expr("percentile(freq, 0.75)").as("fq3"),
      expr("percentile(monetary_cents, 0.25)").as("mq1"),
      expr("percentile(monetary_cents, 0.5)").as("mq2"),
      expr("percentile(monetary_cents, 0.75)").as("mq3"))
    aged.crossJoin(broadcast(qs))
      .selectExpr("user_id", "age_days", "freq", "monetary_cents",
        "cast(4 - (if(age_days > aq1, 1, 0) + if(age_days > aq2, 1, 0) +" +
          " if(age_days > aq3, 1, 0)) as bigint) AS r_score",
        "cast(1 + (if(freq > fq1, 1, 0) + if(freq > fq2, 1, 0) +" +
          " if(freq > fq3, 1, 0)) as bigint) AS f_score",
        "cast(1 + (if(monetary_cents > mq1, 1, 0) + if(monetary_cents > mq2, 1, 0) +" +
          " if(monetary_cents > mq3, 1, 0)) as bigint) AS m_score")
      .selectExpr("user_id", "age_days", "freq", "monetary_cents",
        "r_score", "f_score", "m_score",
        "r_score * 100 + f_score * 10 + m_score AS segment")
  }

  /** Typed extraction from a semi-structured JSON-ish props column via
    * an engine-portable regex (`"key": <int>`), aggregated per event
    * type: count, present-count, and exact integer sum/min/max of the
    * extracted value. Map-only until one partial-agg shuffle. */
  def propsKeyStats(events: DataFrame, typeCol: String, propsCol: String,
      key: String): DataFrame =
    events
      // DataFrame-API regexp_extract: the pattern is a plain JVM
      // string, bypassing SQL string-literal escaping entirely (the
      // SQL-side equivalent needs '\\s' under Spark's escaped
      // literals but '\s' in DuckDB's standard-SQL literals)
      .select(col(typeCol),
        regexp_extract(col(propsCol), "\"" + key + "\":\\s*(-?\\d+)", 1).as("kvs"))
      // regexp_extract yields '' on no match, and under ANSI semantics
      // a direct cast of '' throws — gate the cast like the oracle's
      // TRY_CAST
      .select(col(typeCol),
        when(length(col("kvs")) === 0, lit(null))
          .otherwise(col("kvs")).cast("long").as("kv"))
      .groupBy(col(typeCol))
      .agg(count(lit(1)).as("n_events"),
        count(col("kv")).as("n_with_key"),
        coalesce(sum(col("kv")), lit(0L)).as("k_sum"),
        min(col("kv")).as("k_min"),
        max(col("kv")).as("k_max"))

  /** First-order Markov transition matrix over each user's
    * time-ordered event stream: for every observed (from_type,
    * to_type) pair, the transition count, the from-type total, and the
    * transition probability in exact integer micro units
    * (`n · 1e6 div from_total` — BIGINT floor division, identical in
    * both engines). Ties on the timestamp are broken by the unique
    * `idCol`, so the sequence each user contributes is total-ordered
    * and the result hashes deterministically.
    *
    * 100 TB shape: ONE user-keyed window shuffle over the event log
    * (spillable external sort — the st01 sessionization shape), then a
    * (from,to)-keyed partial agg down to at most T² rows. The
    * from-type totals are a window over that tiny aggregated frame,
    * never over the log. */
  def transitionMatrix(events: DataFrame, typeCol: String, userCol: String,
      tsCol: String, idCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    events
      .select(col(userCol), col(tsCol), col(idCol), col(typeCol).as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("from_total", sum(col("n")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("from_type"))))
      .selectExpr("from_type", "to_type", "n", "from_total",
        "(n * 1000000) div from_total AS p_micro")
  }

  /** Distribution drift between two time slices: the per-category
    * chi-square contribution of each event type across the
    * before/after split (the classic Pearson independence statistic —
    * the drift alarm a training-data pipeline runs when a new crawl
    * snapshot lands). Returns per type the two observed counts and
    * `chi2_micro`, the type's summed (o−e)²∕e over both cells in micro
    * units.
    *
    * Determinism: counts are exact BIGINTs; each cell's statistic is a
    * FIXED chain of individually correctly-rounded IEEE-754 ops
    * (rowTot·colTot exact below 2^53, one divide, one subtract, one
    * multiply, one divide, one round) — identical bit patterns in any
    * IEEE engine, so the micro-rounded BIGINT sum hash-matches. The
    * order-sensitive step (summing the two cells) is over exact
    * integers. One partial-agg shuffle to T·2 cells; the marginals are
    * a broadcast O(T)-row frame. */
  def typeDriftChi2(events: DataFrame, typeCol: String, tsCol: String,
      splitTs: String): DataFrame = {
    val cells = events
      .selectExpr(s"$typeCol AS t",
        s"if($tsCol < timestamp'$splitTs', 0L, 1L) AS half")
      .groupBy(col("t"), col("half"))
      .agg(count(lit(1)).as("o"))
    val rowTot = cells.groupBy(col("t")).agg(sum(col("o")).as("row_tot"))
    val colTot = cells.groupBy(col("half")).agg(sum(col("o")).as("col_tot"))
    val grand = cells.agg(sum(col("o")).as("n_total"))
    // full T×2 grid: a type absent from one half still owes that
    // cell's (0−e)²∕e term
    rowTot.crossJoin(broadcast(colTot))
      .join(cells, Seq("t", "half"), "left")
      .na.fill(0L, Seq("o"))
      .crossJoin(broadcast(grand))
      // e = rowTot*colTot/N; contrib = round(1e6 * (o-e)^2/e) — each
      // op correctly rounded, see scaladoc
      .selectExpr("t", "half", "o",
        "cast(round(((o - (row_tot * col_tot) / n_total) *" +
          " (o - (row_tot * col_tot) / n_total)) /" +
          " ((row_tot * col_tot) / n_total) * 1000000) as bigint) AS cell_micro")
      .groupBy(col("t").as("event_type"))
      .agg(sum(when(col("half") === 0L, col("o")).otherwise(0L)).as("n_before"),
        sum(when(col("half") === 1L, col("o")).otherwise(0L)).as("n_after"),
        sum(col("cell_micro")).as("chi2_micro"))
  }

  /** Top event-type n-gram paths: the most frequent length-`n`
    * consecutive type sequences across all users' (ts, id)-ordered
    * streams ([[transitionMatrix]] generalized from pairs to paths —
    * the "what do users actually do" sequence-mining staple). Returns
    * the top `topN` by (count desc, then the path lexicographically) —
    * a strict total order, so the cut is deterministic.
    *
    * 100 TB shape: ONE user-keyed window shuffle evaluates all n−1
    * leads together, then a path-keyed partial agg to at most T^n
    * rows; the ranking window runs over that tiny frame. */
  def typePaths(events: DataFrame, typeCol: String, userCol: String,
      tsCol: String, idCol: String, n: Int, topN: Int): DataFrame = {
    require(n >= 2, s"n must be >= 2, got $n")
    require(topN >= 1, s"topN must be >= 1, got $topN")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val stepCols = (1 until n).map(i => s"t$i")
    // all leads in ONE select so they share a single Window operator
    // (chained withColumn risks splitting into several user-keyed
    // shuffles — PlanAuditSpec pins exactly one)
    val base = events.select(col(userCol), col(tsCol), col(idCol),
      col(typeCol).as("t0"))
    val df = base.select(col("t0") +:
      (1 until n).map(i => lead(col("t0"), i).over(w).as(s"t$i")): _*)
    val pathCols = "t0" +: stepCols
    val counted = df.filter(col(s"t${n - 1}").isNotNull)
      .groupBy(pathCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
    val rankW = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").desc +: pathCols.map(col(_).asc): _*)
    counted.withColumn("rk", row_number().over(rankW).cast("long"))
      .filter(col("rk") <= topN)
  }

  /** DAU/WAU stickiness: per day, the distinct daily actives, the
    * distinct TRAILING-7-day actives, and their exact micro ratio —
    * the classic engagement metric. The sliding distinct is computed
    * by replicating each (user, day) activity row to the <= 7 days it
    * can serve (a BOUNDED explode — never a window distinct, which
    * Spark cannot do exactly, and never a per-day rescan), then one
    * (day, user) distinct + partial agg.
    *
    * 100 TB shape: one (user, day) distinct of the log, a 7× bounded
    * fan-out projection, one distinct + one partial-agg shuffle; all
    * frames day-grain afterward. Days with no activity have no row
    * (gap-fill composes via [[hourlyGapFill]]'s spine pattern). */
  def stickiness(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val dayUser = events
      .selectExpr(s"to_date($tsCol) AS d", s"$userCol AS u")
      .distinct()
    val dau = dayUser.groupBy(col("d")).agg(count(lit(1)).as("dau"))
    val wau = dayUser
      .selectExpr("explode(sequence(d, date_add(d, 6))) AS d", "u")
      .distinct()
      .groupBy(col("d")).agg(count(lit(1)).as("wau"))
    // inner join: only days that themselves had activity report
    dau.join(wau, Seq("d"))
      .selectExpr("cast(d as string) AS day", "dau", "wau",
        "(dau * 1000000) div wau AS stickiness_micro")
  }

  /** Integer-exact daily anomaly flags: per (type, day), compare the
    * day's count against the trailing-week window by PURE-INTEGER
    * cross-multiplication — `n · trailing_days > 2 · trailing_n` is a
    * spike (today more than 2× the trailing mean), `2 · n ·
    * trailing_days < trailing_n` a dip — no float mean, no stddev
    * (engine stddev implementations differ in op order, which can flip
    * a micro-rounded boundary; cross-multiplied integers cannot).
    * Days with under `minDays` of trailing history never flag.
    *
    * 100 TB shape: one partial-agg shuffle to (type, day) rows, then a
    * type-partitioned 7-row window over that tiny frame. */
  def dailyAnomalies(events: DataFrame, typeCol: String, tsCol: String,
      minDays: Int = 3): DataFrame = {
    require(minDays >= 1, s"minDays must be >= 1, got $minDays")
    val daily = events
      .selectExpr(s"$typeCol AS event_type", s"to_date($tsCol) AS d")
      .groupBy(col("event_type"), col("d"))
      .agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("d"))
      .rowsBetween(-7, -1)
    daily
      .withColumn("trailing_n", coalesce(sum(col("n")).over(w), lit(0L)))
      .withColumn("trailing_days", count(col("n")).over(w))
      .selectExpr("cast(d as string) AS day", "event_type", "n",
        "trailing_n", "trailing_days",
        s"trailing_days >= $minDays AND n * trailing_days > 2 * trailing_n AS spike",
        s"trailing_days >= $minDays AND 2 * n * trailing_days < trailing_n AS dip")
  }

  /** Per-day peak session concurrency — the classic interval-sweep
    * (+1 at session start, −1 after session end, running sum, max),
    * made partition-friendly: every session is SPLIT into per-day
    * segments first, so the sweep window partitions by day instead of
    * one global total order (the 100 TB shape — a single unpartitioned
    * sweep would collapse the whole timeline into one sort partition).
    * Midnight-spanning sessions contribute a full segment to each day
    * they touch, so within-day concurrency is exact. Overlap is
    * INCLUSIVE at endpoints: at equal timestamps starts order before
    * ends (delta desc), so back-to-back touching sessions count as
    * concurrent. Equal-delta ties need no further order — identical
    * deltas commute, so the running-sum multiset (and its max) is
    * deterministic.
    *
    * @param sessions (userCol, startMsCol, endMsCol) epoch-ms session
    *                 intervals, start <= end
    * @return (day 'yyyy-MM-dd', n_segments, peak_concurrent)
    */
  def peakConcurrency(sessions: DataFrame, userCol: String,
      startMsCol: String, endMsCol: String): DataFrame = {
    val segs = sessions
      .selectExpr(s"$startMsCol AS s_ms", s"$endMsCol AS e_ms")
      .selectExpr("s_ms", "e_ms",
        "explode(sequence(to_date(timestamp_millis(s_ms)), " +
          "to_date(timestamp_millis(e_ms)))) AS day")
      .selectExpr("day",
        "greatest(s_ms, unix_millis(to_timestamp(day))) AS seg_s",
        "least(e_ms, unix_millis(to_timestamp(day)) + 86399999L) AS seg_e")
    val deltas = segs.selectExpr("day", "seg_s AS t_ms", "1L AS delta")
      .unionByName(segs.selectExpr("day", "seg_e AS t_ms", "-1L AS delta"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("day")).orderBy(col("t_ms").asc, col("delta").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    deltas
      .withColumn("running", sum(col("delta")).over(w))
      .groupBy(col("day"))
      .agg((count(lit(1)) / 2).cast("long").as("n_segments"),
        max(col("running")).as("peak_concurrent"))
      .selectExpr("cast(day as string) AS day", "n_segments", "peak_concurrent")
  }

  /** Cumulative distinct users per (type, day) — the "count distinct
    * over a running window" Spark does not support natively, expressed
    * by the classic first-seen decomposition: a user counts on exactly
    * the FIRST day they appear for a type, and the running sum of
    * first-seen counts IS the running distinct count. Exact, no
    * sketch.
    *
    * 100 TB shape: one (type, user)-keyed partial agg (first day), one
    * (type, day) partial agg, one distinct over (type, day), an
    * equi-join of two day-grain frames, and a running-sum window over
    * O(types · days) rows — the event log is never windowed. */
  def cumulativeDistinct(events: DataFrame, typeCol: String, userCol: String,
      tsCol: String): DataFrame = {
    val firstDay = events
      .selectExpr(s"$typeCol AS t", s"$userCol AS u", s"to_date($tsCol) AS d")
      .groupBy(col("t"), col("u")).agg(min(col("d")).as("d0"))
      .groupBy(col("t"), col("d0").as("d")).agg(count(lit(1)).as("new_users"))
    val activeDays = events
      .selectExpr(s"$typeCol AS t", s"to_date($tsCol) AS d").distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("t")).orderBy(col("d"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    activeDays.join(firstDay, Seq("t", "d"), "left")
      .na.fill(0L, Seq("new_users"))
      .withColumn("cum_users", sum(col("new_users")).over(w))
      .selectExpr("cast(d as string) AS day", "t AS event_type",
        "new_users", "cum_users")
  }

  /** Hourly calendar gap-fill: the complete (hour, type) spine from
    * the corpus's own min to max hour, with zero-filled counts, the
    * exact cent sum where data exists, and a carry-forward of the last
    * known cent sum (running ignore-nulls `last`, leading gap stays
    * NULL) — the time-series completion step before any trend model.
    *
    * 100 TB shape: the spine is generated (T types × H hours — tiny
    * vs the log) from a broadcast 1-row min/max aggregate; counts are
    * one partial-agg shuffle; the spine-to-counts join is an
    * equi-join; the carry window partitions by type over H rows. */
  def hourlyGapFill(events: DataFrame, typeCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val bounds = events.agg(
      expr(s"min(date_trunc('hour', $tsCol))").as("h0"),
      expr(s"max(date_trunc('hour', $tsCol))").as("h1"))
    val types = events.select(col(typeCol).as("event_type")).distinct()
    val spine = types.crossJoin(broadcast(bounds))
      .selectExpr("event_type",
        "explode(sequence(h0, h1, interval 1 hour)) AS h")
    val agg = events
      .selectExpr(s"date_trunc('hour', $tsCol) AS h", s"$typeCol AS event_type",
        s"cast(round($valueCol * 100) as long) AS cents")
      .groupBy(col("h"), col("event_type"))
      .agg(count(lit(1)).as("n_raw"), sum(col("cents")).as("cents"))
    val carryW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("h"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    spine.join(agg, Seq("event_type", "h"), "left")
      .withColumn("carry_cents", last(col("cents"), ignoreNulls = true).over(carryW))
      .selectExpr("unix_millis(h) AS hour_ms", "event_type",
        "coalesce(n_raw, 0L) AS n_events", "n_raw IS NOT NULL AS had_data",
        "cents", "carry_cents")
  }

  /** Last-touch attribution: each conversion event (type ==
    * `convType`) is credited to the user's most recent PRECEDING
    * non-conversion event type ((ts, idCol)-ordered, strictly before
    * the conversion row); conversions with no preceding touch drop.
    * Returns per channel the conversion count and exact cent total.
    *
    * 100 TB shape: ONE user-keyed window shuffle (ignore-nulls `last`
    * over an unbounded-preceding frame — computed in one running pass,
    * no per-row rescan), then a channel-keyed partial agg to at most
    * T rows. */
  def lastTouchAttribution(events: DataFrame, typeCol: String, userCol: String,
      tsCol: String, idCol: String, valueCol: String, convType: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    events
      .select(col(userCol), col(tsCol), col(idCol), col(typeCol).as("t"),
        expr(s"cast(round($valueCol * 100) as long)").as("cents"))
      .withColumn("touch",
        last(when(col("t") =!= convType, col("t")), ignoreNulls = true).over(w))
      .filter(col("t") === convType && col("touch").isNotNull)
      .groupBy(col("touch").as("channel"))
      .agg(count(lit(1)).as("n_conversions"), sum(col("cents")).as("cents"))
  }

  /** Cohort lifetime-value curves: users cohorted by the ISO week
    * (Monday-start) of their first purchase; per (cohort,
    * weeks-since-first-purchase) the active purchaser count, exact
    * cent revenue, running cumulative cents, and cumulative cents per
    * cohort member — the LTV curve a growth team reads. Age is pure
    * integer day arithmetic (`datediff div 7`), never an interval
    * divide, so it hash-compares across engines. The per-member
    * division is well-defined for NEGATIVE cumulative cents too
    * (refund-dominated cohorts): Spark's `div` and DuckDB's `//`
    * both truncate toward zero (verified: (-7)//2 = -3 in DuckDB),
    * pinned by the negative-value differential fuzz in EventsSpec.
    *
    * 100 TB shape: one user-keyed partial agg for the first-purchase
    * frame, one equi-join back (the first frame is ≤1 row/user —
    * broadcastable at dimension scale), one (cohort, age)-keyed
    * partial agg, then a window over the TINY (cohorts × ages) grid
    * — never over raw events. */
  def cohortLtv(events: DataFrame, typeCol: String, userCol: String,
      tsCol: String, valueCol: String, purchaseType: String): DataFrame = {
    val p = events.filter(col(typeCol) === purchaseType)
      .select(col(userCol).as("uid"), to_date(col(tsCol)).as("od"),
        expr(s"cast(round($valueCol * 100) as long)").as("cents"))
    val first = p.groupBy(col("uid")).agg(min(col("od")).as("cd"))
    val cohortSize = first
      .selectExpr("cast(trunc(cd, 'week') as string) AS cohort_wk")
      .groupBy(col("cohort_wk")).agg(count(lit(1)).as("cohort_users"))
    val grid = p.join(first, Seq("uid"))
      .selectExpr("cast(trunc(cd, 'week') as string) AS cohort_wk",
        "cast(datediff(od, cd) div 7 as bigint) AS age_wk",
        "uid", "cents")
      .groupBy(col("cohort_wk"), col("age_wk"))
      .agg(countDistinct(col("uid")).as("n_active"), sum(col("cents")).as("cents"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cohort_wk")).orderBy(col("age_wk"))
    grid.join(broadcast(cohortSize), Seq("cohort_wk"))
      .withColumn("cum_cents", sum(col("cents")).over(w))
      .selectExpr("cohort_wk", "age_wk", "cohort_users", "n_active", "cents",
        "cum_cents", "cum_cents div cohort_users AS ltv_cents_per_user")
  }

  /** Session-length histogram — batch sessionization by inactivity
    * gap: per user the events sorted by (ts, event id), a new session
    * starts when the gap from the previous event exceeds
    * `gapSeconds` (exact integer microseconds on BOTH sides of the
    * comparison — `unix_micros` here, `epoch_us` in the oracle — so
    * sub-second timestamps bucket identically), sessions counted by
    * their event count into (n_events → n_sessions) rows with the
    * micro share of all sessions. The "how long are visits" answer
    * that sits beside the streaming sessionizers.
    *
    * 100 TB shape: ONE user-partitioned sort-window pass assigns
    * session ids (lag + running sum — no self-join), one
    * (user, session) partial agg, then the histogram agg over
    * session rows and a 1-row broadcast total. Nothing is ever keyed
    * on less than the user, so skew is bounded by the busiest user's
    * event count — the same bound the sessionization window already
    * requires. */
  def sessionLengthHistogram(events: DataFrame, userCol: String,
      tsCol: String, idCol: String, gapSeconds: Long): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds must be positive, got $gapSeconds")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("uid")).orderBy(col("ts"), col("eid"))
    val sess = events
      .select(col(userCol).as("uid"), col(tsCol).as("ts"), col(idCol).as("eid"))
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .selectExpr("uid", "ts", "eid",
        "if(prev IS NULL OR unix_micros(ts) - unix_micros(prev) > " +
          s"${gapSeconds * 1000000L}, 1L, 0L) AS new_sess")
      .withColumn("sess_id", sum(col("new_sess")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("uid"), col("sess_id")).agg(count(lit(1)).as("n_events"))
    val h = sess.groupBy(col("n_events")).agg(count(lit(1)).as("n_sessions"))
    val tot = h.agg(sum(col("n_sessions")).as("total"))
    h.crossJoin(broadcast(tot))
      .selectExpr("n_events", "n_sessions",
        "cast((cast(n_sessions as decimal(38,0)) * 1000000) div total" +
          " as bigint) AS share_micro")
      .orderBy(col("n_events"))
  }

  /** Event-type co-occurrence with lift: the (user, day) grain is the
    * unit of observation; for each unordered type pair the number of
    * grains containing BOTH types, each type's own grain count, and
    * the exact-integer lift
    * `n_both · n_grains · 1e6 div (n_a · n_b)` (1e6 = independence;
    * above = the types travel together). The feature-affinity matrix
    * a product team reads, and a drift check for event taxonomies.
    *
    * 100 TB shape: one distinct (user, day, type) shuffle, then a
    * grain-keyed self equi-join whose fan-out is bounded by the TYPE
    * VOCABULARY squared per grain (taxonomies are tens of types, not
    * data-sized), two tiny per-type joins, one 1-row broadcast total.
    * Lift numerator and denominator are 128-bit (decimal(38) here,
    * HUGEINT in the oracle) — `n_a · n_b` alone wraps Int64 once both
    * types pass ~3e9 grains. */
  def typeCooccurrence(events: DataFrame, typeCol: String, userCol: String,
      tsCol: String): DataFrame = {
    val g = events.selectExpr(s"$userCol AS uid",
        s"cast(to_date($tsCol) as string) AS day", s"$typeCol AS et")
      .distinct()
    val per = g.groupBy(col("et")).agg(count(lit(1)).as("n_type"))
    val tot = g.select(col("uid"), col("day")).distinct()
      .agg(count(lit(1)).as("n_grains"))
    g.as("a").join(g.as("b"),
        col("a.uid") === col("b.uid") && col("a.day") === col("b.day") &&
          col("a.et") < col("b.et"))
      .selectExpr("a.et AS type_a", "b.et AS type_b")
      .groupBy(col("type_a"), col("type_b")).agg(count(lit(1)).as("n_both"))
      .join(per.select(col("et").as("type_a"), col("n_type").as("n_a")),
        Seq("type_a"))
      .join(per.select(col("et").as("type_b"), col("n_type").as("n_b")),
        Seq("type_b"))
      .crossJoin(broadcast(tot))
      .selectExpr("type_a", "type_b", "n_a", "n_b", "n_both",
        "cast((cast(n_both as decimal(38,0)) * n_grains * 1000000) div " +
          "(cast(n_a as decimal(38,0)) * n_b) as bigint) AS lift_micro")
      .orderBy(col("type_a"), col("type_b"))
  }

  /** Daily operational share of one event type (e.g. errors) in exact
    * micro units: per day, total events, matching events, and
    * `matching · 1e6 div total`. One partial-agg shuffle. */
  def dailyTypeShare(events: DataFrame, typeCol: String, tsCol: String,
      matchType: String): DataFrame =
    events
      .selectExpr(s"cast(to_date($tsCol) as string) AS day",
        s"if($typeCol = '$matchType', 1L, 0L) AS hit")
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_events"), sum(col("hit")).as("n_match"))
      .selectExpr("day", "n_events", "n_match",
        "(n_match * 1000000) div n_events AS share_micro")

  /** Per-entity peak burst rate — the rate-limiting / abuse-detection
    * primitive: each user's MAXIMUM event count inside any trailing
    * `windowMicros` interval (an exact RANGE-frame window, event-time
    * anchored at each event — the standard exact formulation of
    * "max requests per 10 minutes"), reported as a pinned-bucket
    * histogram over users (1, 2, 3, 4, 5–9 → 5, >= 10 → 10).
    *
    * 100 TB shape: ONE shuffle by user + an in-partition sort; the
    * RANGE frame is streaming state bounded by the window's event
    * count, and the histogram is a partial agg over user maxima. A
    * pathological single user concentrates one partition — the same
    * skew class q32's salting demo handles; here per-user event
    * counts are rate-bounded by definition of the metric.
    *
    * Returns `bucket, n_users` (ordered). */
  /** Conversion latency distribution: per user, first `fromType`
    * event → first `toType` event STRICTLY after it; reported as one
    * row of exact-integer stats — converter count, mean seconds
    * (exact BIGINT division), and micro-quantized exact quartiles
    * (`percentile` over BIGINT seconds ↔ DuckDB `quantile_cont`, the
    * q33-proven parity; the interpolated value is an exact rational
    * of integers, one IEEE chain, so the micro rounding matches).
    *
    * 100 TB shape: two type-filtered partial aggs + one user-keyed
    * equi-join + a 1-row fold — never a per-event window. */
  def timeToConvert(events: DataFrame, typeCol: String, userCol: String,
      tsCol: String, fromType: String, toType: String): DataFrame = {
    val v = events.filter(col(typeCol) === fromType)
      .groupBy(col(userCol).as("u")).agg(min(col(tsCol)).as("vts"))
    val lat = events.filter(col(typeCol) === toType)
      .select(col(userCol).as("u"), col(tsCol).as("ts"))
      .join(v, Seq("u"))
      .filter(col("ts") > col("vts"))
      .groupBy(col("u"), col("vts")).agg(min(col("ts")).as("pts"))
      .selectExpr("(unix_micros(pts) - unix_micros(vts)) div 1000000 AS lat_s")
    lat.agg(count(lit(1)).as("n_converters"),
        coalesce(sum(col("lat_s")), lit(0L)).as("s"),
        expr("percentile(lat_s, 0.25)").as("q1"),
        expr("percentile(lat_s, 0.5)").as("q2"),
        expr("percentile(lat_s, 0.75)").as("q3"))
      .selectExpr("n_converters",
        "if(n_converters = 0, 0L, s div n_converters) AS mean_s",
        "cast(round(q1 * 1000000) as bigint) AS p25_s_micro",
        "cast(round(q2 * 1000000) as bigint) AS p50_s_micro",
        "cast(round(q3 * 1000000) as bigint) AS p75_s_micro")
  }

  /** Per-entity interval-UNION time: each event opens a
    * `intervalMicros` activity window; returns each user's merged
    * union length in micros (`u`, `active_us`) via the running-max-
    * end island technique — ONE window pass, no self-join. Ties on
    * the start timestamp are harmless: tied events share an end, so
    * island boundaries are order-invariant. */
  def activeTimeUnion(events: DataFrame, userCol: String, tsCol: String,
      intervalMicros: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(intervalMicros >= 1, s"interval must be positive, got $intervalMicros")
    val wPrev = Window.partitionBy(col("u")).orderBy(col("st"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(col("u")).orderBy(col("st"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .selectExpr(s"$userCol AS u", s"unix_micros($tsCol) AS st",
        s"unix_micros($tsCol) + $intervalMicros AS en")
      .withColumn("pmax", max(col("en")).over(wPrev))
      .withColumn("new_i", expr("cast(pmax is null or st > pmax as bigint)"))
      .withColumn("isl", sum(col("new_i")).over(wRun))
      .groupBy(col("u"), col("isl"))
      .agg((max(col("en")) - min(col("st"))).as("len_us"))
      .groupBy(col("u"))
      .agg(coalesce(sum(col("len_us")), lit(0L)).as("active_us"))
  }

  /** Daily-active-users OLS trend: distinct users per day, then the
    * exact least-squares slope over (day index, dau) — every moment
    * an exact BIGINT sum, the slope one integer micro division
    * (users/day growth in micro units). The "is this corpus/product
    * growing" number with zero float accumulation. A single-day
    * window has zero x-variance; slope pins to 0. One distinct agg +
    * one tiny fold. Returns 1 row:
    * `n_days, sum_x, sum_y, sum_xy, sum_x2, slope_micro_per_day`. */
  def dailyActiveTrend(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val daily = events.selectExpr(s"to_date($tsCol) AS day", s"$userCol AS u")
      .distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val d0 = daily.agg(min(col("day")).as("d0"))
    daily.crossJoin(broadcast(d0))
      .selectExpr("cast(datediff(day, d0) as bigint) AS x", "dau AS y")
      .agg(count(lit(1)).as("n_days"),
        sum(col("x")).as("sum_x"), sum(col("y")).as("sum_y"),
        sum(expr("x * y")).as("sum_xy"), sum(expr("x * x")).as("sum_x2"))
      .selectExpr("n_days", "sum_x", "sum_y", "sum_xy", "sum_x2",
        "if(cast(n_days as decimal(38,0)) * sum_x2 - cast(sum_x as decimal(38,0)) * sum_x = 0, 0L, " +
          "cast(((cast(n_days as decimal(38,0)) * sum_xy - cast(sum_x as decimal(38,0)) * sum_y) * 1000000) " +
          "div (cast(n_days as decimal(38,0)) * sum_x2 - cast(sum_x as decimal(38,0)) * sum_x) as bigint)) " +
          "AS slope_micro_per_day")
  }

  def peakUserBurst(events: DataFrame, userCol: String, tsCol: String,
      windowMicros: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(windowMicros >= 1, s"window must be positive, got $windowMicros")
    val w = Window.partitionBy(col("u")).orderBy(col("tus"))
      .rangeBetween(-(windowMicros - 1), 0)
    events.selectExpr(s"$userCol AS u", s"unix_micros($tsCol) AS tus")
      .withColumn("c", count(lit(1)).over(w))
      .groupBy(col("u")).agg(max(col("c")).as("mb"))
      .selectExpr(
        "cast(case when mb >= 10 then 10 when mb >= 5 then 5 else mb end as bigint) AS bucket")
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_users"))
      .orderBy(col("bucket"))
  }
}
