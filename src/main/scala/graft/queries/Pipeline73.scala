package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Round-11 additions, part 38: the remaining classical rank
  * statistics as exact-integer faces — Goodman–Kruskal gamma /
  * Kendall tau-a over a bounded joint domain, and the Mann–Whitney U
  * two-sample test riding the q76/q82 bucketed midrank machinery.
  */
object Pipeline73 {

  def all: Seq[QueryDef] = Seq(q83, q84)

  /** Goodman–Kruskal gamma + Kendall tau-a between line-item quantity
    * and discount percent — concordance statistics whose classic
    * definitions are O(N²) pair counts, collapsed here to the BOUNDED
    * joint domain: quantity (~50 distinct) × discount points (~11
    * distinct) group to ≤ a few hundred cells, every pair statistic
    * is a cell-pair product sum over that broadcast frame, and ties
    * come from the marginals. `gamma = (C − D) ∕ (C + D)` and
    * `tau_a = (C − D) ∕ n₀` are reported in micro units with
    * decimal(38,0)/HUGEINT products (C ~ n²∕2 overflows Int64 past
    * ~6B rows); both engines truncate toward zero on the signed
    * numerator. The in-plan identity
    * `n₀ = C + D + tieX + tieY − tieXY` is asserted by PlanAudit.
    *
    * 100 TB shape: one partial agg to the bounded cell frame, one
    * broadcast non-equi self-join over cells (|X|·|Y| ≤ ~550 rows —
    * data-independent), three marginal folds, one 1-row fold. The
    * corpus is touched exactly once. */
  val q83: QueryDef = QueryDef(
    "q83_kendall_gamma",
    (s, d) => {
      val v = Tables.lineitem(s, d).selectExpr(
        "cast(round(l_quantity) as bigint) AS x",
        "cast(round(l_discount * 100) as bigint) AS y")
      val cells = v.groupBy(col("x"), col("y"))
        .agg(count(lit(1)).as("n"))
      val b = cells.selectExpr("x AS x2", "y AS y2", "n AS n2")
      val cd = cells.join(broadcast(b), col("x") < col("x2"))
        .agg(
          coalesce(sum(when(col("y") < col("y2"),
            expr("cast(n as decimal(38,0)) * n2"))), lit(0).cast("decimal(38,0)"))
            .as("c"),
          coalesce(sum(when(col("y") > col("y2"),
            expr("cast(n as decimal(38,0)) * n2"))), lit(0).cast("decimal(38,0)"))
            .as("dd"))
      def tiePairs(df: org.apache.spark.sql.DataFrame, keys: Seq[String],
          out: String) =
        df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("t"))
          .agg(coalesce(sum(expr(
            "cast(t as decimal(38,0)) * (t - 1) div 2")),
            lit(0).cast("decimal(38,0)")).as(out))
      val tx = tiePairs(v, Seq("x"), "tie_x")
      val ty = tiePairs(v, Seq("y"), "tie_y")
      val txy = cells.agg(coalesce(sum(expr(
        "cast(n as decimal(38,0)) * (n - 1) div 2")),
        lit(0).cast("decimal(38,0)")).as("tie_xy"))
      val n = v.agg(count(lit(1)).as("n_rows"))
      n.crossJoin(broadcast(cd)).crossJoin(broadcast(tx))
        .crossJoin(broadcast(ty)).crossJoin(broadcast(txy))
        .selectExpr("n_rows",
          "cast(c as bigint) AS concordant",
          "cast(dd as bigint) AS discordant",
          "cast(tie_x as bigint) AS tie_pairs_x",
          "cast(tie_y as bigint) AS tie_pairs_y",
          "cast(tie_xy as bigint) AS tie_pairs_xy",
          "cast(if(c + dd = 0, 0, ((c - dd) * 1000000) div (c + dd)) as bigint)" +
            " AS gamma_micro",
          "cast(((c - dd) * 1000000)" +
            " div (cast(n_rows as decimal(38,0)) * (n_rows - 1) div 2)" +
            " as bigint) AS tau_a_micro")
    },
    Some("""WITH v AS (SELECT CAST(round(l_quantity) AS BIGINT) AS x,
               CAST(round(l_discount * 100) AS BIGINT) AS y FROM lineitem),
      cells AS (SELECT x, y, CAST(count(*) AS BIGINT) AS n FROM v GROUP BY 1, 2),
      cd AS (SELECT
          COALESCE(sum(CASE WHEN a.y < b.y
            THEN CAST(a.n AS HUGEINT) * b.n END), 0) AS c,
          COALESCE(sum(CASE WHEN a.y > b.y
            THEN CAST(a.n AS HUGEINT) * b.n END), 0) AS dd
        FROM cells a JOIN cells b ON a.x < b.x),
      tx AS (SELECT COALESCE(sum(CAST(t AS HUGEINT) * (t - 1) // 2), 0) AS tie_x
        FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM v GROUP BY x)),
      ty AS (SELECT COALESCE(sum(CAST(t AS HUGEINT) * (t - 1) // 2), 0) AS tie_y
        FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM v GROUP BY y)),
      txy AS (SELECT COALESCE(sum(CAST(n AS HUGEINT) * (n - 1) // 2), 0) AS tie_xy
        FROM cells),
      m AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM v)
      SELECT n_rows, CAST(c AS BIGINT) AS concordant,
        CAST(dd AS BIGINT) AS discordant,
        CAST(tie_x AS BIGINT) AS tie_pairs_x,
        CAST(tie_y AS BIGINT) AS tie_pairs_y,
        CAST(tie_xy AS BIGINT) AS tie_pairs_xy,
        CAST(CASE WHEN c + dd = 0 THEN 0
          ELSE ((c - dd) * 1000000) // (c + dd) END AS BIGINT) AS gamma_micro,
        CAST(((c - dd) * 1000000)
          // (CAST(n_rows AS HUGEINT) * (n_rows - 1) // 2) AS BIGINT)
          AS tau_a_micro
      FROM m, cd, tx, ty, txy"""))

  /** Mann–Whitney U between returned ('R') and shipped-clean ('N')
    * line items on price cents — the two-sample rank test, exact
    * under ties via the DOUBLED midrank (`2·before + cnt + 1` per
    * distinct value, the q82 trick) over the COMBINED sample:
    * `2·U_R = ΣR₂(R) − n_R(n_R + 1)` stays integer even when
    * midranks are halves. Output pins both doubled U's (their
    * identity `U_R + U_N = n_R·n_N` — doubled: `2·n_R·n_N` — is
    * asserted by PlanAudit) and the common-language effect size
    * `U_R ∕ (n_R n_N)` in micro units.
    *
    * 100 TB shape: one distinct-value partial agg (the combined rank
    * map over the value-range bucketed cumsum — no single-partition
    * window), one value-keyed equi-join back onto the scan, one
    * 2-row group fold, one 1-row pivot. */
  val q84: QueryDef = QueryDef(
    "q84_mann_whitney",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val v = Tables.lineitem(s, d)
        .filter(col("l_returnflag").isin("R", "N"))
        .selectExpr("l_returnflag AS flag",
          "cast(round(l_extendedprice * 100) as bigint) AS cents")
      val g = v.groupBy(col("cents")).agg(count(lit(1)).as("cnt"))
      val gb = g.crossJoin(broadcast(g.agg(max(col("cents")).as("mx"))))
        .withColumn("b", expr("cents div greatest(1L, (mx div 256) + 1L)"))
      val offs = gb.groupBy(col("b")).agg(sum(col("cnt")).as("bcnt"))
        .withColumn("off",
          coalesce(sum(col("bcnt")).over(Window.orderBy(col("b"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      val win = Window.partitionBy(col("b")).orderBy(col("cents"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val ranks = gb
        .join(broadcast(offs.select(col("b"), col("off"))), Seq("b"))
        .withColumn("before",
          col("off") + coalesce(sum(col("cnt")).over(win), lit(0L)))
        .selectExpr("cents", "2 * before + cnt + 1 AS r2")
      val per = v.join(ranks, Seq("cents"))
        .groupBy(col("flag"))
        .agg(count(lit(1)).as("n"),
          sum(expr("cast(r2 as decimal(38,0))")).as("sr2"))
      per.agg(
          max(when(col("flag") === "R", col("n"))).as("n_r"),
          max(when(col("flag") === "N", col("n"))).as("n_n"),
          max(when(col("flag") === "R", col("sr2"))).as("sr_r"),
          max(when(col("flag") === "N", col("sr2"))).as("sr_n"))
        .selectExpr("n_r", "n_n",
          "cast(sr_r - cast(n_r as decimal(38,0)) * (n_r + 1) as bigint) AS u_r_x2",
          "cast(sr_n - cast(n_n as decimal(38,0)) * (n_n + 1) as bigint) AS u_n_x2",
          "cast(((sr_r - cast(n_r as decimal(38,0)) * (n_r + 1)) * 1000000)" +
            " div (2 * cast(n_r as decimal(38,0)) * n_n) as bigint) AS cles_micro")
    },
    Some("""WITH v AS (SELECT l_returnflag AS flag,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
             FROM lineitem WHERE l_returnflag IN ('R', 'N')),
      g AS (SELECT cents, CAST(count(*) AS BIGINT) AS cnt FROM v GROUP BY 1),
      r AS (SELECT cents, 2 * COALESCE(CAST(sum(cnt) OVER (ORDER BY cents
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
              + cnt + 1 AS r2 FROM g),
      per AS (SELECT flag, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CAST(r2 AS HUGEINT)) AS HUGEINT) AS sr2
              FROM v JOIN r ON v.cents = r.cents GROUP BY 1),
      m AS (SELECT
          max(CASE WHEN flag = 'R' THEN n END) AS n_r,
          max(CASE WHEN flag = 'N' THEN n END) AS n_n,
          max(CASE WHEN flag = 'R' THEN sr2 END) AS sr_r,
          max(CASE WHEN flag = 'N' THEN sr2 END) AS sr_n
        FROM per)
      SELECT n_r, n_n,
        CAST(sr_r - CAST(n_r AS HUGEINT) * (n_r + 1) AS BIGINT) AS u_r_x2,
        CAST(sr_n - CAST(n_n AS HUGEINT) * (n_n + 1) AS BIGINT) AS u_n_x2,
        CAST(((sr_r - CAST(n_r AS HUGEINT) * (n_r + 1)) * 1000000)
          // (2 * CAST(n_r AS HUGEINT) * n_n) AS BIGINT) AS cles_micro
      FROM m"""))
}
