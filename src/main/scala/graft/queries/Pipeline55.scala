package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Similarity

/** Round-11 additions, part 20: interval-union active time, the
  * SemDeDup threshold sweep, and error-recovery latency.
  */
object Pipeline55 {

  def all: Seq[QueryDef] = Seq(q72, s33, e37, p40)

  /** Contamination rollup by source: t37's per-eval-doc n-gram
    * overlap audit aggregated to the release-review grain — per
    * source of the pinned eval slice, how many docs are contaminated
    * and the mean overlap. Composes the audited t37 machinery (one
    * source of truth: the oracle nests t37's chain; the Spark side
    * joins its verdicts back to the doc table for the source
    * column). */
  val p40: QueryDef = QueryDef(
    "p40_contamination_by_source",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val audit = graft.operators.Decontaminate.ngramOverlapAudit(
        docs.filter(col("doc_id") < 50), docs.filter(col("doc_id") >= 50),
        "text", 5, 500000L)
      audit.join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_eval_docs"),
          coalesce(sum(expr("cast(contaminated as bigint)")), lit(0L)).as("n_contaminated"),
          coalesce(sum(col("overlap_micro")), lit(0L)).as("so"))
        .selectExpr("source", "n_eval_docs", "n_contaminated",
          "cast((cast(n_contaminated as decimal(38,0)) * 1000000) div n_eval_docs as bigint) AS contaminated_micro",
          "so div n_eval_docs AS mean_overlap_micro")
        .orderBy(col("source"))
    },
    Some(s"""WITH t37 AS (SELECT * FROM (${Pipeline41.t37.oracle.get}) AS x),
      j AS (SELECT d.source, t37.overlap_micro,
              CASE WHEN t37.contaminated THEN 1 ELSE 0 END AS c
            FROM t37 JOIN documents d ON t37.doc_id = d.doc_id)
      SELECT source, CAST(count(*) AS BIGINT) AS n_eval_docs,
        CAST(COALESCE(sum(c), 0) AS BIGINT) AS n_contaminated,
        CAST((CAST(COALESCE(sum(c), 0) AS HUGEINT) * 1000000) // count(*)
          AS BIGINT) AS contaminated_micro,
        CAST(COALESCE(sum(overlap_micro), 0) // count(*) AS BIGINT)
          AS mean_overlap_micro
      FROM j GROUP BY 1 ORDER BY 1"""))

  /** Interval-UNION active time: each event opens a 5-minute
    * activity interval; a user's active time is the length of the
    * UNION of their intervals (the classic merge-overlapping-
    * intervals problem, solved with the running-max-end island
    * technique — one window pass, no self-join). Reported as the
    * corpus summary: users, total merged active seconds, and the
    * max/mean per user — the "true engagement time" metric that
    * naive per-event × 5min double-counts. All arithmetic exact
    * integer micros. */
  val q72: QueryDef = QueryDef(
    "q72_active_time_union",
    (s, d) => {
      val per = graft.operators.Events.activeTimeUnion(
        Tables.events(s, d), "user_id", "ts", 300000000L)
      per.agg(count(lit(1)).as("n_users"),
          coalesce(sum(col("active_us")), lit(0L)).as("tot_us"),
          max(col("active_us")).as("max_us"))
        .selectExpr("n_users", "tot_us div 1000000 AS total_active_s",
          "max_us div 1000000 AS max_user_active_s",
          "(tot_us div n_users) div 1000 AS mean_user_active_ms")
    },
    Some("""WITH iv AS (SELECT user_id AS u, epoch_us(ts) AS st,
               epoch_us(ts) + 300000000 AS en FROM events),
      x AS (SELECT u, st, en,
              max(en) OVER (PARTITION BY u ORDER BY st
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
            FROM iv),
      f AS (SELECT u, st, en,
              CASE WHEN pmax IS NULL OR st > pmax THEN 1 ELSE 0 END AS new_i
            FROM x),
      n AS (SELECT u, st, en,
              sum(new_i) OVER (PARTITION BY u ORDER BY st
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
            FROM f),
      isla AS (SELECT u, isl, max(en) - min(st) AS len_us
               FROM n GROUP BY 1, 2),
      per AS (SELECT u, CAST(sum(len_us) AS BIGINT) AS active_us
              FROM isla GROUP BY 1),
      agg AS (SELECT CAST(count(*) AS BIGINT) AS n_users,
                CAST(sum(active_us) AS BIGINT) AS tot_us,
                CAST(max(active_us) AS BIGINT) AS max_us FROM per)
      SELECT n_users, tot_us // 1000000 AS total_active_s,
        max_us // 1000000 AS max_user_active_s,
        (tot_us // n_users) // 1000 AS mean_user_active_ms
      FROM agg"""))

  /** SemDeDup threshold sweep (the d15 discipline on the embedding
    * side): ONE coarse assignment + ONE within-cluster pair pass
    * reused across thresholds — per tau the candidate-pair count at
    * cos >= tau and the docs dropped by the keep-lowest-id policy.
    * The curve that picks s07's tau before committing a semantic
    * dedup run. Cosines micro-quantize once (the Pipeline12 idiom);
    * thresholds compare in exact integers. */
  val s33: QueryDef = QueryDef(
    "s33_semdedup_sweep",
    (s, d) => {
      val a = Similarity.assignCentroids(Tables.embeddings(s, d), 16)
        .select(col("vec_id"), col("v"), col("nrm"), col("centroid"))
      val pairs = a.as("x").join(a.as("y"),
          col("x.centroid") === col("y.centroid") &&
            col("x.vec_id") < col("y.vec_id"))
        .selectExpr("y.vec_id AS d2",
          s"cast(round((${Similarity.cosExpr.format("x.v", "y.v", "x.nrm", "y.nrm")}) * 1000000) as bigint) AS cm")
        .filter(col("cm") >= 300000L)
      // LEFT-join the pinned tau grid so the output SHAPE is
      // data-independent (an empty tau emits a zero row, not nothing)
      val taus = s.range(0, 3).selectExpr(
        "element_at(array(300000L, 450000L, 600000L), cast(id as int) + 1) AS tau")
      taus.join(
          pairs.selectExpr("d2", "cm", "explode(array(300000L, 450000L, 600000L)) AS tau")
            .filter(col("cm") >= col("tau"))
            .groupBy(col("tau"))
            .agg(count(lit(1)).as("n_pairs"), countDistinct(col("d2")).as("n_dropped")),
          Seq("tau"), "left")
        .na.fill(0L, Seq("n_pairs", "n_dropped"))
        .selectExpr("tau AS tau_micro", "n_pairs", "n_dropped")
        .orderBy(col("tau_micro"))
    },
    Some(s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
                        FROM embeddings),
      n AS (SELECT vec_id, v, ${DuckOps.norm2("v")} AS nrm FROM e),
      c AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n WHERE vec_id < 16),
      asg AS (SELECT vec_id, v, nrm, cid AS centroid FROM (
          SELECT a.vec_id, a.v, a.nrm, c.cid,
            row_number() OVER (PARTITION BY a.vec_id
              ORDER BY ${DuckOps.dot("a.v", "c.cv")} / (sqrt(a.nrm) * sqrt(c.cn)) DESC,
                       c.cid ASC) AS rn
          FROM n a CROSS JOIN c
          WHERE NOT isnan(${DuckOps.dot("a.v", "c.cv")} / (sqrt(a.nrm) * sqrt(c.cn)))) WHERE rn = 1),
      p AS (SELECT y.vec_id AS d2,
              CAST(round((CASE WHEN x.nrm = 0 OR y.nrm = 0 THEN NULL
                ELSE ${DuckOps.dot("x.v", "y.v")} / (sqrt(x.nrm) * sqrt(y.nrm))
                END) * 1000000) AS BIGINT) AS cm
            FROM asg x JOIN asg y
            ON x.centroid = y.centroid AND x.vec_id < y.vec_id),
      q AS (SELECT d2, cm, tau FROM p, unnest([300000, 450000, 600000]) AS t(tau)
            WHERE cm >= 300000 AND cm >= tau),
      agg AS (SELECT CAST(tau AS BIGINT) AS tau_micro,
                CAST(count(*) AS BIGINT) AS n_pairs,
                CAST(count(DISTINCT d2) AS BIGINT) AS n_dropped
              FROM q GROUP BY 1),
      grid AS (SELECT CAST(tau AS BIGINT) AS tau_micro
               FROM unnest([300000, 450000, 600000]) AS t(tau))
      SELECT grid.tau_micro,
        CAST(COALESCE(agg.n_pairs, 0) AS BIGINT) AS n_pairs,
        CAST(COALESCE(agg.n_dropped, 0) AS BIGINT) AS n_dropped
      FROM grid LEFT JOIN agg ON grid.tau_micro = agg.tau_micro
      ORDER BY 1"""))

  /** Error-recovery latency: for every error event, the gap to the
    * user's NEXT non-error event (the "how fast do users recover"
    * operational metric) — a conditional forward-looking window min
    * (no self-join), folded to one row of exact stats: error count,
    * recovered share, exact-integer mean and micro-quantized
    * interpolated p50/p90 seconds. */
  val e37: QueryDef = QueryDef(
    "e37_recovery_time",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("u")).orderBy(col("tus"), col("eid"))
        .rowsBetween(1, Window.unboundedFollowing)
      val lat = Tables.events(s, d)
        .selectExpr("user_id AS u", "unix_micros(ts) AS tus",
          "event_id AS eid", "event_type AS et")
        .withColumn("nxt_ok",
          min(expr("if(et != 'error', tus, cast(null as bigint))")).over(w))
        .filter(col("et") === "error")
        .selectExpr("(nxt_ok - tus) div 1000000 AS lat_s")
      lat.agg(count(lit(1)).as("n_errors"),
          count(col("lat_s")).as("n_recovered"),
          coalesce(sum(col("lat_s")), lit(0L)).as("sl"),
          expr("percentile(lat_s, 0.5)").as("p50"),
          expr("percentile(lat_s, 0.9)").as("p90"))
        .selectExpr("n_errors", "n_recovered",
          "cast((cast(n_recovered as decimal(38,0)) * 1000000) div n_errors as bigint) AS recovered_micro",
          "if(n_recovered = 0, 0L, sl div n_recovered) AS mean_s",
          "cast(round(p50 * 1000000) as bigint) AS p50_s_micro",
          "cast(round(p90 * 1000000) as bigint) AS p90_s_micro")
    },
    Some("""WITH e AS (SELECT user_id AS u, epoch_us(ts) AS tus, event_id AS eid,
               event_type AS et FROM events),
      x AS (SELECT u, tus, et,
              min(CASE WHEN et <> 'error' THEN tus END)
                OVER (PARTITION BY u ORDER BY tus, eid
                  ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nxt_ok
            FROM e),
      l AS (SELECT (nxt_ok - tus) // 1000000 AS lat_s FROM x
            WHERE et = 'error'),
      m AS (SELECT CAST(count(*) AS BIGINT) AS n_errors,
              CAST(count(lat_s) AS BIGINT) AS n_recovered,
              CAST(COALESCE(sum(lat_s), 0) AS BIGINT) AS sl,
              quantile_cont(lat_s, 0.5) AS p50,
              quantile_cont(lat_s, 0.9) AS p90
            FROM l)
      SELECT n_errors, n_recovered,
        CAST((CAST(n_recovered AS HUGEINT) * 1000000) // n_errors AS BIGINT)
          AS recovered_micro,
        CAST(CASE WHEN n_recovered = 0 THEN 0 ELSE sl // n_recovered END
          AS BIGINT) AS mean_s,
        CAST(round(p50 * 1000000) AS BIGINT) AS p50_s_micro,
        CAST(round(p90 * 1000000) AS BIGINT) AS p90_s_micro
      FROM m"""))
}
