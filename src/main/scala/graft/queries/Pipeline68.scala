package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Round-11 additions, part 33: rolling regression — the windowed
  * face of e33's global OLS trend.
  */
object Pipeline68 {

  def all: Seq[QueryDef] = Seq(q80)

  /** Trailing 7-day OLS slope of daily revenue (q75's daily frame,
    * e33's exact integer least-squares, composed): per day the
    * regression slope over its last 7 daily totals, micro-cents per
    * day-index step. Slope is translation-invariant in x, so the
    * ABSOLUTE dense day index works inside every window (no
    * per-window re-centering); all moments are exact integer frame
    * sums, the final ratio rides decimal(38,0)/HUGEINT, and the
    * signed `div`/`//` truncate identically (negative slopes
    * hash-compare — the e33-verified behavior). Windows shorter
    * than 7 days are excluded (a 2-point "trend" is noise, and the
    * n=7 filter makes the output shape explicit).
    *
    * 100 TB shape: one date-keyed partial-agg shuffle; every window
    * runs over the date-domain-sized daily frame (the q75
    * discipline), never the order table. */
  val q80: QueryDef = QueryDef(
    "q80_rolling_ols",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.orders(s, d).groupBy(col("o_orderdate"))
        .agg(sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("cents"))
        .selectExpr("cast(o_orderdate as string) AS day", "cents")
      val idx = daily.withColumn("i",
        row_number().over(Window.orderBy(col("day"))).cast("long"))
      val f = Window.orderBy(col("i")).rowsBetween(-6, 0)
      idx
        .withColumn("n", count(lit(1)).over(f))
        .withColumn("sx", sum(col("i")).over(f))
        .withColumn("sy", sum(col("cents")).over(f))
        .withColumn("sxy", sum(expr("i * cents")).over(f))
        .withColumn("sx2", sum(expr("i * i")).over(f))
        .filter(col("n") === 7)
        .selectExpr("day", "cents",
          "cast((cast(n as decimal(38,0)) * sxy - cast(sx as decimal(38,0)) * sy)" +
            " * 1000000 div (cast(n as decimal(38,0)) * sx2" +
            " - cast(sx as decimal(38,0)) * sx) as bigint) AS slope_micro")
        .orderBy(col("day"))
    },
    Some("""WITH daily AS (SELECT CAST(o_orderdate AS VARCHAR) AS day,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS cents
             FROM orders GROUP BY 1),
      idx AS (SELECT day, cents,
                CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i FROM daily),
      w AS (SELECT day, cents, i,
              CAST(count(*) OVER f AS BIGINT) AS n,
              CAST(sum(i) OVER f AS BIGINT) AS sx,
              CAST(sum(cents) OVER f AS BIGINT) AS sy,
              CAST(sum(i * cents) OVER f AS BIGINT) AS sxy,
              CAST(sum(i * i) OVER f AS BIGINT) AS sx2
            FROM idx
            WINDOW f AS (ORDER BY i ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
      SELECT day, cents,
        CAST((CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy) * 1000000
          // (CAST(n AS HUGEINT) * sx2 - CAST(sx AS HUGEINT) * sx) AS BIGINT)
          AS slope_micro
      FROM w WHERE n = 7 ORDER BY day"""))
}
