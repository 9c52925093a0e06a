package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Round-11 additions, part 41: the exact Lorenz curve as the
  * per-decile face of the q76 value-range-bucketed rank family, and
  * per-type inter-event gap dispersion (the exact-integer CV²).
  */
object Pipeline76 {

  def all: Seq[QueryDef] = Seq(q85, e41)

  /** Exact Lorenz curve of order values at the deciles: for each
    * k/10 of orders (ascending by value), the exact cumulative cent
    * mass and its micro share — the curve q76's Gini integrates,
    * point-queryable. The rank→value lookup rides the collapsed
    * distinct-value frame with the q76 bucketed cumsum (count AND
    * mass cumulated in one window pass), deciles resolve through a
    * 10-row broadcast non-equi join (`before < r_k ≤ before + cnt`),
    * and partial rows at the cut value contribute `(r_k − before)·v`
    * exactly — tie-exact, no interpolation contract.
    *
    * 100 TB shape: one distinct-value partial agg, one bucketed
    * window over the collapsed frame, one broadcast 10-row join, one
    * 1-row total broadcast. No global sort, no per-row window. */
  val q85: QueryDef = QueryDef(
    "q85_lorenz_curve",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val v = Tables.orders(s, d)
        .selectExpr("cast(round(o_totalprice * 100) as bigint) AS c")
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
      val tot = v.agg(count(lit(1)).as("n"),
        sum(expr("cast(c as decimal(38,0))")).as("total"))
      val deciles = s.range(1, 11).toDF("decile")
      broadcast(deciles.crossJoin(broadcast(tot))
          .selectExpr("decile", "n", "total", "(decile * n) div 10 AS rk"))
        .join(cum, col("before") < col("rk") &&
          col("before") + col("cnt") >= col("rk"))
        .selectExpr("decile", "rk AS cut_rank",
          "cast(mass_before + (rk - before) * cast(c as decimal(38,0))" +
            " as bigint) AS cum_cents",
          "cast(((mass_before + (rk - before) * cast(c as decimal(38,0)))" +
            " * 1000000) div total as bigint) AS share_micro")
        .orderBy(col("decile"))
    },
    Some("""WITH v AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c
               FROM orders),
      g AS (SELECT c, CAST(count(*) AS BIGINT) AS cnt FROM v GROUP BY 1),
      cum AS (SELECT c, cnt,
          COALESCE(CAST(sum(cnt) OVER (ORDER BY c
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
            AS before,
          COALESCE(CAST(sum(CAST(c AS HUGEINT) * cnt) OVER (ORDER BY c
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS HUGEINT), 0)
            AS mass_before
        FROM g),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CAST(c AS HUGEINT)) AS HUGEINT) AS total FROM v),
      dk AS (SELECT CAST(range AS BIGINT) AS decile, n, total,
               (CAST(range AS BIGINT) * n) // 10 AS rk
             FROM range(1, 11), tot)
      SELECT decile, rk AS cut_rank,
        CAST(mass_before + (rk - before) * CAST(c AS HUGEINT) AS BIGINT)
          AS cum_cents,
        CAST(((mass_before + (rk - before) * CAST(c AS HUGEINT)) * 1000000)
          // total AS BIGINT) AS share_micro
      FROM dk JOIN cum ON before < rk AND before + cnt >= rk
      ORDER BY decile"""))

  /** Per-type inter-event gap dispersion: for each event type, the
    * count, exact mean (truncated seconds), and the squared
    * coefficient of variation `CV² = n·Σg²∕(Σg)² − 1` in micro units
    * — the burstiness number (CV² ≈ 1 is Poisson, ≫ 1 bursty,
    * ≪ 1 metronomic). Gaps are whole seconds between a user's
    * consecutive same-type events (`us div 1e6`, truncation pinned
    * on both engines); the CV² chain rides decimal(38,0)/HUGEINT —
    * exact while `(n·Σg² − (Σg)²)·1e6 < 10³⁸`, i.e. past 1e10 gaps
    * of ~1e6 s, far beyond any per-type event horizon.
    *
    * 100 TB shape: one (user, type)-partitioned lead window into a
    * type-keyed partial agg — the e40 shuffle discipline with a
    * composite key. */
  val e41: QueryDef = QueryDef(
    "e41_gap_dispersion",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("nxt", lead(col("ts"), 1).over(w))
        .filter(col("nxt").isNotNull)
        .selectExpr("event_type",
          "(unix_micros(nxt) - unix_micros(ts)) div 1000000 AS g")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_gaps"),
          sum(expr("cast(g as decimal(38,0))")).as("sg"),
          sum(expr("cast(g as decimal(38,0)) * g")).as("sg2"))
        .selectExpr("event_type", "n_gaps",
          "cast(sg div n_gaps as bigint) AS mean_gap_s",
          "cast(if(sg = 0, 0," +
            " ((n_gaps * sg2 - sg * sg) * 1000000) div (sg * sg))" +
            " as bigint) AS cv2_micro")
        .orderBy(col("event_type"))
    },
    Some("""WITH e AS (SELECT user_id, event_type, ts, event_id,
               lead(ts) OVER (PARTITION BY user_id, event_type
                 ORDER BY ts, event_id) AS nxt
             FROM events),
      gp AS (SELECT event_type,
               epoch_us(nxt - ts) // 1000000 AS g
             FROM e WHERE nxt IS NOT NULL),
      a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
              CAST(sum(CAST(g AS HUGEINT)) AS HUGEINT) AS sg,
              CAST(sum(CAST(g AS HUGEINT) * g) AS HUGEINT) AS sg2
            FROM gp GROUP BY 1)
      SELECT event_type, n_gaps,
        CAST(sg // n_gaps AS BIGINT) AS mean_gap_s,
        CAST(CASE WHEN sg = 0 THEN 0
          ELSE ((n_gaps * sg2 - sg * sg) * 1000000) // (sg * sg)
          END AS BIGINT) AS cv2_micro
      FROM a ORDER BY event_type"""))
}
