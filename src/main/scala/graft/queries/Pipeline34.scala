package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.TextOps

/** Round-10 additions, part 24: winsorized robust means,
  * deterministic bootstrap replicates, and the hour-of-day profile.
  */
object Pipeline34 {

  def all: Seq[QueryDef] = Seq(q62, p34, e30)

  /** Winsorized mean — the robust-stats companion to q49's MAD:
    * order totals clamped to the corpus-wide exact [p10, p90]
    * (interpolated percentiles rounded ONCE to integer cents,
    * broadcast), then per-priority plain vs winsorized milli means —
    * how much tail mass each stratum carries. */
  val q62: QueryDef = QueryDef(
    "q62_winsorized_mean",
    (s, d) => {
      val o = Tables.orders(s, d).selectExpr("o_orderpriority AS pri",
        "cast(round(o_totalprice * 100) as long) AS cents")
      val thr = o.agg(
        expr("cast(round(percentile(cents, 0.1)) as long)").as("lo"),
        expr("cast(round(percentile(cents, 0.9)) as long)").as("hi"))
      o.crossJoin(broadcast(thr))
        .selectExpr("pri", "cents", "greatest(lo, least(hi, cents)) AS wcents")
        .groupBy(col("pri"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"),
          sum(col("wcents")).as("wcents"))
        .selectExpr("pri", "n", "cents", "wcents",
          "(cents * 1000) div n AS mean_milli",
          "(wcents * 1000) div n AS wmean_milli")
        .orderBy(col("pri"))
    },
    Some("""WITH o AS (SELECT o_orderpriority AS pri,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
      thr AS (SELECT CAST(round(quantile_cont(cents, 0.1)) AS BIGINT) AS lo,
                CAST(round(quantile_cont(cents, 0.9)) AS BIGINT) AS hi FROM o),
      w AS (SELECT pri, cents, greatest(lo, least(hi, cents)) AS wcents
            FROM o, thr)
      SELECT pri, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(cents) AS BIGINT) AS cents,
        CAST(sum(wcents) AS BIGINT) AS wcents,
        (CAST(sum(cents) AS BIGINT) * 1000) // CAST(count(*) AS BIGINT)
          AS mean_milli,
        (CAST(sum(wcents) AS BIGINT) * 1000) // CAST(count(*) AS BIGINT)
          AS wmean_milli
      FROM w GROUP BY 1 ORDER BY 1"""))

  /** Deterministic bootstrap: three pseudo-replicates, each admitting
    * a doc iff its salted 60-bit hash lands under 63% — the
    * reproducible resampling a pipeline uses to put error bars on
    * corpus statistics without randomness. Per replicate the doc
    * count and token mass; the replicate spread IS the uncertainty
    * estimate. */
  val p34: QueryDef = QueryDef(
    "p34_bootstrap_stats",
    (s, d) => {
      val base = Tables.documents(s, d).selectExpr("doc_id",
        "cast(size(filter(split(text, '[ ]+'), x -> x != '')) as bigint) AS n_tokens")
      val reps = base.selectExpr("doc_id", "n_tokens",
        "explode(sequence(0, 2)) AS r")
      val h = TextOps.strHash60(
        "concat('boot', ':', cast(r as string), ':', cast(doc_id as string))")
      reps.filter(expr(s"$h % 100 < 63"))
        .groupBy(col("r").cast("long").as("replicate"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tokens"))
        .selectExpr("replicate", "n_docs", "tokens",
          "(tokens * 1000) div n_docs AS mean_tokens_milli")
        .orderBy(col("replicate"))
    },
    Some(s"""WITH base AS (SELECT doc_id,
               CAST(len(list_filter(regexp_split_to_array(text, '[ ]+'),
                 x -> x <> '')) AS BIGINT) AS n_tokens
             FROM documents),
      reps AS (SELECT doc_id, n_tokens, r
               FROM base, unnest(range(0, 3)) AS t(r)),
      hit AS (SELECT CAST(r AS BIGINT) AS replicate, n_tokens FROM reps
              WHERE ${DuckOps.strHash60(
                "('boot:' || CAST(r AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR))")}
                % 100 < 63)
      SELECT replicate, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(n_tokens) AS BIGINT) AS tokens,
        (CAST(sum(n_tokens) AS BIGINT) * 1000) // CAST(count(*) AS BIGINT)
          AS mean_tokens_milli
      FROM hit GROUP BY 1 ORDER BY 1"""))

  /** Hour-of-day traffic profile: per (hour, type) the event count
    * and its micro share within the type — the diurnal companion of
    * e23's day-of-week profile. Hour from exact µs arithmetic. */
  val e30: QueryDef = QueryDef(
    "e30_hourly_profile",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val g = Tables.events(s, d)
        .selectExpr("event_type",
          "(unix_micros(ts) div 3600000000L) % 24 AS hour")
        .groupBy(col("event_type"), col("hour"))
        .agg(count(lit(1)).as("n"))
      g.withColumn("type_total",
          sum(col("n")).over(Window.partitionBy(col("event_type"))))
        .selectExpr("event_type", "cast(hour as bigint) AS hour", "n",
          "(n * 1000000) div type_total AS share_micro")
        .orderBy(col("event_type"), col("hour"))
    },
    Some("""WITH g AS (SELECT event_type,
               (epoch_us(ts) // 3600000000) % 24 AS hour,
               CAST(count(*) AS BIGINT) AS n
             FROM events GROUP BY 1, 2)
      SELECT event_type, CAST(hour AS BIGINT) AS hour, n,
        (n * 1000000) // CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT)
          AS share_micro
      FROM g ORDER BY event_type, hour"""))
}
