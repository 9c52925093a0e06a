package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Round-11 additions, part 45: the winsorized mean (the clamp face
  * of the bucketed rank family, beside q81's trimmed drop face) and
  * lag-1 autoregression of daily revenue (the AR(1) slope as exact
  * integer least squares on the tiny daily frame).
  */
object Pipeline80 {

  def all: Seq[QueryDef] = Seq(q86, q87)

  /** 10% winsorized mean of line-item price cents: the bottom k and
    * top k values (k = n div 10) are CLAMPED to the rank-(k+1) and
    * rank-(n−k) values — q81 drops the tails, this one pins them —
    * and the mean is exact integer. Both cut values and both partial
    * masses come from ONE bucketed cumsum over the collapsed
    * distinct-value frame via a 3-row broadcast rank lookup (`M(r) =
    * mass_before + (r − before)·v`, the q85 partial-row identity):
    * `winsorized_sum = k·v(k+1) + (M(n−k) − M(k)) + k·v(n−k)`.
    * Tie-exact; truncating division in both engines.
    *
    * 100 TB shape: one distinct-value partial agg, one bucketed
    * window, broadcast-only lookups — no global sort. */
  val q86: QueryDef = QueryDef(
    "q86_winsorized_mean",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val v = Tables.lineitem(s, d)
        .selectExpr("cast(round(l_extendedprice * 100) as bigint) AS c")
      val g = v.groupBy(col("c")).agg(count(lit(1)).as("cnt"))
      val gb = g.crossJoin(broadcast(g.agg(max(col("c")).as("mx"))))
        .withColumn("b", expr("c div greatest(1L, (mx div 256) + 1L)"))
      val offs = gb.groupBy(col("b"))
        .agg(sum(col("cnt")).as("bcnt"),
          sum(expr("cast(c as decimal(38,0)) * cnt")).as("bmass"))
        .withColumn("off", coalesce(sum(col("bcnt")).over(
          Window.orderBy(col("b")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
        .withColumn("moff", coalesce(sum(col("bmass")).over(
          Window.orderBy(col("b")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0).cast("decimal(38,0)")))
      val win = Window.partitionBy(col("b")).orderBy(col("c"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val cum = gb.join(broadcast(offs.select(col("b"), col("off"), col("moff"))),
          Seq("b"))
        .withColumn("before",
          col("off") + coalesce(sum(col("cnt")).over(win), lit(0L)))
        .withColumn("mass_before",
          col("moff") + coalesce(sum(expr("cast(c as decimal(38,0)) * cnt"))
            .over(win), lit(0).cast("decimal(38,0)")))
      val tot = v.agg(count(lit(1)).as("n"))
      val marks = s.range(0, 3).toDF("i")
        .crossJoin(broadcast(tot))
        .selectExpr("n", "n div 10 AS k",
          "element_at(array(n div 10, n div 10 + 1, n - n div 10)," +
            " cast(i as int) + 1) AS rk",
          "element_at(array('mk', 'lo', 'hi'), cast(i as int) + 1) AS role")
      val looked = broadcast(marks)
        .join(cum, col("before") < col("rk") &&
          col("before") + col("cnt") >= col("rk"))
        .selectExpr("n", "k", "role", "c",
          "mass_before + (rk - before) * cast(c as decimal(38,0)) AS m")
      looked.groupBy(col("n"), col("k"))
        .agg(max(when(col("role") === "lo", col("c"))).as("v_lo"),
          max(when(col("role") === "hi", col("c"))).as("v_hi"),
          max(when(col("role") === "mk", col("m"))).as("m_k"),
          max(when(col("role") === "hi", col("m"))).as("m_nk"))
        .selectExpr("n AS n_rows", "k", "v_lo", "v_hi",
          "cast((k * cast(v_lo as decimal(38,0)) + (m_nk - m_k)" +
            " + k * cast(v_hi as decimal(38,0))) div n as bigint)" +
            " AS winsorized_mean_cents")
    },
    Some("""WITH v AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS c
               FROM lineitem),
      g AS (SELECT c, CAST(count(*) AS BIGINT) AS cnt FROM v GROUP BY 1),
      cum AS (SELECT c, cnt,
          COALESCE(CAST(sum(cnt) OVER (ORDER BY c
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
            AS before,
          COALESCE(CAST(sum(CAST(c AS HUGEINT) * cnt) OVER (ORDER BY c
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS HUGEINT), 0)
            AS mass_before
        FROM g),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
      marks AS (SELECT n, n // 10 AS k,
          CASE r WHEN 0 THEN n // 10 WHEN 1 THEN n // 10 + 1
            ELSE n - n // 10 END AS rk,
          CASE r WHEN 0 THEN 'mk' WHEN 1 THEN 'lo' ELSE 'hi' END AS role
        FROM tot, unnest([0, 1, 2]) AS t(r)),
      lk AS (SELECT n, k, role, c,
               mass_before + (rk - before) * CAST(c AS HUGEINT) AS m
             FROM marks JOIN cum ON before < rk AND before + cnt >= rk)
      SELECT n AS n_rows, k,
        max(CASE WHEN role = 'lo' THEN c END) AS v_lo,
        max(CASE WHEN role = 'hi' THEN c END) AS v_hi,
        CAST((k * CAST(max(CASE WHEN role = 'lo' THEN c END) AS HUGEINT)
          + (max(CASE WHEN role = 'hi' THEN m END)
             - max(CASE WHEN role = 'mk' THEN m END))
          + k * CAST(max(CASE WHEN role = 'hi' THEN c END) AS HUGEINT)) // n
          AS BIGINT) AS winsorized_mean_cents
      FROM lk GROUP BY n, k"""))

  /** AR(1) slope of daily order revenue: consecutive observed days'
    * (rev_t, rev_{t+1}) pairs through exact integer least squares —
    * `slope = (nΣxy − ΣxΣy) ∕ (nΣx² − (Σx)²)` in micro units, the
    * momentum number (≈0 memoryless, →1e6 trending). Revenue is
    * WHOLE DOLLARS (`cents div 100`, truncation pinned) so the
    * decimal(38,0)/HUGEINT cross-products stay exact past 1e11
    * dollars/day × 1e5 days. The daily frame is calendar-bounded
    * (thousands of rows), so its one flat window is O(days), not
    * O(orders).
    *
    * 100 TB shape: one day-keyed partial agg over the scan; the lead
    * window and the fold live on the tiny daily frame. */
  val q87: QueryDef = QueryDef(
    "q87_revenue_ar1",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.orders(s, d)
        .selectExpr("cast(o_orderdate as date) AS day",
          "cast(round(o_totalprice * 100) as bigint) AS cents")
        .groupBy(col("day")).agg(expr("sum(cents) div 100").as("x"))
      val pairs = daily
        .withColumn("y", lead(col("x"), 1).over(Window.orderBy(col("day"))))
        .filter(col("y").isNotNull)
      pairs.agg(count(lit(1)).as("n"),
          sum(expr("cast(x as decimal(38,0))")).as("sx"),
          sum(expr("cast(y as decimal(38,0))")).as("sy"),
          sum(expr("cast(x as decimal(38,0)) * y")).as("sxy"),
          sum(expr("cast(x as decimal(38,0)) * x")).as("sx2"))
        .selectExpr("n AS n_pairs", "cast(sx div n as bigint) AS mean_dollars",
          "cast(((n * sxy - sx * sy) * 1000000)" +
            " div (n * sx2 - sx * sx) as bigint) AS ar1_slope_micro")
    },
    Some("""WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 // 100 AS x
             FROM orders GROUP BY 1),
      p AS (SELECT x, lead(x) OVER (ORDER BY day) AS y FROM daily),
      pf AS (SELECT x, y FROM p WHERE y IS NOT NULL),
      a AS (SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
              CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
              CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
              CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sx2
            FROM pf)
      SELECT n AS n_pairs, CAST(sx // n AS BIGINT) AS mean_dollars,
        CAST(((n * sxy - sx * sy) * 1000000)
          // (n * sx2 - sx * sx) AS BIGINT) AS ar1_slope_micro
      FROM a"""))
}
