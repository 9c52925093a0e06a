package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Similarity

/** Round-10 additions, part 13: windowed-aggregate moving median,
  * feature adoption curves, and the int8 quantization error audit.
  */
object Pipeline23 {

  def all: Seq[QueryDef] = Seq(q53, e22, s24)

  /** Moving 7-day median of daily purchase revenue — an AGGREGATE
    * used as a window function (interpolated percentile over a
    * ROWS 6-preceding frame), the q33 percentile parity applied
    * windowed. The window runs over the ≤31-row day grid. */
  val q53: QueryDef = QueryDef(
    "q53_moving_median",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.events(s, d).filter(col("event_type") === "purchase")
        .groupBy(expr("cast(to_date(ts) as string)").as("day"))
        .agg(sum(expr("cast(round(value * 100) as long)")).as("cents"))
      val w = Window.orderBy(col("day")).rowsBetween(-6, 0)
      daily
        .withColumn("med7_cents", expr("percentile(cents, 0.5)").over(w))
        .withColumn("n_days_in_frame", count(lit(1)).over(w))
        .orderBy(col("day"))
    },
    Some("""WITH daily AS (SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
             FROM events WHERE event_type = 'purchase' GROUP BY 1)
      SELECT day, cents,
        quantile_cont(cents, 0.5) OVER (ORDER BY day
          ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS med7_cents,
        CAST(count(*) OVER (ORDER BY day
          ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_days_in_frame
      FROM daily ORDER BY day"""))

  /** Feature adoption curves: per event type the first-time-user
    * count per day and the cumulative adopters — one (user, type)
    * min-date agg, a (type, day) grid agg, and a window over that
    * tiny grid. */
  val e22: QueryDef = QueryDef(
    "e22_adoption_curve",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val first = Tables.events(s, d)
        .groupBy(col("user_id"), col("event_type"))
        .agg(min(to_date(col("ts"))).as("d0"))
      val g = first.groupBy(col("event_type"), col("d0"))
        .agg(count(lit(1)).as("new_users"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("d0"))
      g.withColumn("cum_adopters", sum(col("new_users")).over(w))
        .selectExpr("event_type", "cast(d0 as string) AS day",
          "new_users", "cum_adopters")
        .orderBy(col("event_type"), col("day"))
    },
    Some("""WITH f AS (SELECT user_id, event_type, min(CAST(ts AS DATE)) AS d0
             FROM events GROUP BY 1, 2),
      g AS (SELECT event_type, d0, CAST(count(*) AS BIGINT) AS new_users
            FROM f GROUP BY 1, 2)
      SELECT event_type, CAST(d0 AS VARCHAR) AS day, new_users,
        CAST(sum(new_users) OVER (PARTITION BY event_type ORDER BY d0) AS BIGINT)
          AS cum_adopters
      FROM g ORDER BY event_type, day"""))

  /** Int8 quantization error audit — the eval half of the s08/s20
    * scalar quantizer: per vector the max elementwise reconstruction
    * error and the sum of squared errors, micro-quantized ONCE per
    * row after identical-shape double folds, worst 20 vectors.
    * Map-only + TakeOrdered. */
  val s24: QueryDef = QueryDef(
    "s24_quant_error",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val worst = Similarity.quantizeInt8(Tables.embeddings(s, d))
        .selectExpr("vec_id",
          "zip_with(v, q, (x, c) -> x - (cast(c as double) * maxabs) / 127.0d) AS errs")
        .selectExpr("vec_id",
          "cast(round(aggregate(errs, cast(0 as double), (m, x) -> greatest(m, abs(x))) * 1000000) as long) AS maxerr_micro",
          "cast(round(aggregate(errs, cast(0 as double), (a, x) -> a + x * x) * 1000000) as long) AS sse_micro")
        .orderBy(col("maxerr_micro").desc, col("vec_id").asc).limit(20)
      worst.withColumn("rk", row_number().over(
          Window.orderBy(col("maxerr_micro").desc, col("vec_id").asc)).cast("long"))
        .select(col("rk"), col("vec_id"), col("maxerr_micro"), col("sse_micro"))
        .orderBy(col("rk"))
    },
    Some(s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
                        FROM embeddings),
      mx AS (SELECT vec_id, v,
               list_reduce(list_concat([0.0::DOUBLE],
                 list_transform(v, x -> abs(x))), (a, b) -> greatest(a, b)) AS maxabs
             FROM e),
      q AS (SELECT vec_id, v, maxabs,
              CASE WHEN maxabs = 0 THEN list_transform(v, x -> 0)
                ELSE list_transform(v, x -> CAST(round((x * 127) / maxabs) AS INTEGER))
              END AS q
            FROM mx),
      er AS (SELECT vec_id,
               list_transform(range(1, len(v) + 1),
                 i -> v[i] - (CAST(q[i] AS DOUBLE) * maxabs) / 127) AS errs
             FROM q),
      m AS (SELECT vec_id,
              CAST(round(list_reduce(list_concat([0.0::DOUBLE],
                list_transform(errs, x -> abs(x))), (a, b) -> greatest(a, b))
                * 1000000) AS BIGINT) AS maxerr_micro,
              CAST(round(list_reduce(list_concat([0.0::DOUBLE],
                list_transform(errs, x -> x * x)), (a, b) -> a + b)
                * 1000000) AS BIGINT) AS sse_micro
            FROM er),
      top AS (SELECT vec_id, maxerr_micro, sse_micro FROM m
              ORDER BY maxerr_micro DESC, vec_id LIMIT 20)
      SELECT CAST(row_number() OVER (ORDER BY maxerr_micro DESC, vec_id) AS BIGINT)
          AS rk, vec_id, maxerr_micro, sse_micro
      FROM top ORDER BY rk"""))
}
