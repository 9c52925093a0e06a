package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Second relational batch: analytic window frames, ntile/percent_rank,
  * outer/cross joins, IN-subqueries, conditional aggregation, and the
  * wider string-function surface — completing SURVEY §2.5–§2.8's
  * extended inventory. Same determinism contract as [[Relational]]. */
object Relational2 {

  def all: Seq[QueryDef] = Seq(q23, q24, q25, q26, q27, q28, q29, q30, q31, q32, q33, q34, q35, q36, q37, q40)

  /** SCD Type-2 dimension merge — the warehouse upsert-with-history
    * primitive: an update batch lands on a current dimension snapshot;
    * rows whose tracked attribute actually CHANGED are closed
    * (valid_to = the batch date) and re-inserted as the new current
    * version; no-op updates (same value) and untouched keys pass
    * through. The update batch here is synthetic-but-deterministic:
    * every 10th customer re-arrives, and every 20th re-arrives with
    * its UNCHANGED segment (exercising the no-op path). 100 TB shape:
    * one equi-join to classify, one anti-join for the untouched
    * complement, unions — no windows over the whole dimension, no
    * driver state; at scale the update batch side broadcasts. */
  val q40: QueryDef = QueryDef(
    "q40_scd2_merge",
    (s, d) => {
      import org.apache.spark.sql.functions._
      val dim = Tables.customer(s, d).selectExpr(
        "cast(c_custkey as bigint) AS k", "c_mktsegment AS seg",
        "cast('2024-01-01' as date) AS valid_from",
        "cast(null as date) AS valid_to")
      val upd = Tables.customer(s, d).filter(col("c_custkey") % 10 === 0)
        .selectExpr("cast(c_custkey as bigint) AS k",
          "if(c_custkey % 20 = 0, c_mktsegment, concat(c_mktsegment, '_V2')) AS nseg")
      val changed = dim.join(upd, Seq("k")).filter(col("seg") =!= col("nseg"))
      val closed = changed.selectExpr("k", "seg", "valid_from",
        "cast('2024-06-01' as date) AS valid_to")
      val fresh = changed.selectExpr("k", "nseg AS seg",
        "cast('2024-06-01' as date) AS valid_from", "cast(null as date) AS valid_to")
      val untouched = dim.join(changed.select("k"), Seq("k"), "left_anti")
        .select("k", "seg", "valid_from", "valid_to")
      untouched.unionByName(closed).unionByName(fresh)
        .selectExpr("k", "seg", "cast(valid_from as string) AS valid_from",
          "cast(valid_to as string) AS valid_to", "valid_to IS NULL AS is_current")
        .orderBy(col("k"), col("valid_from"), col("seg"))
    },
    Some("""WITH dim AS (SELECT CAST(c_custkey AS BIGINT) AS k, c_mktsegment AS seg,
               DATE '2024-01-01' AS valid_from, CAST(NULL AS DATE) AS valid_to
             FROM customer),
      upd AS (SELECT CAST(c_custkey AS BIGINT) AS k,
                CASE WHEN c_custkey % 20 = 0 THEN c_mktsegment
                     ELSE c_mktsegment || '_V2' END AS nseg
              FROM customer WHERE c_custkey % 10 = 0),
      changed AS (SELECT dim.k, dim.seg, dim.valid_from, upd.nseg
                  FROM dim JOIN upd ON dim.k = upd.k WHERE dim.seg <> upd.nseg),
      merged AS (
        SELECT d.k, d.seg, d.valid_from, d.valid_to
        FROM dim d ANTI JOIN changed c ON d.k = c.k
        UNION ALL
        SELECT k, seg, valid_from, DATE '2024-06-01' FROM changed
        UNION ALL
        SELECT k, nseg, DATE '2024-06-01', CAST(NULL AS DATE) FROM changed)
      SELECT k, seg, CAST(valid_from AS VARCHAR) AS valid_from,
        CAST(valid_to AS VARCHAR) AS valid_to, valid_to IS NULL AS is_current
      FROM merged ORDER BY k, valid_from, seg"""))

  /** Sketch aggregates (HLL distinct, approx quantile). Raw estimates
    * are engine-specific, so the oracle-checkable contract is the
    * sketch's ERROR BOUND: emit exact counts (cross-engine-stable)
    * plus booleans asserting each estimate lands within 5% of the
    * exact value computed in the same plan. DuckDB computes the same
    * exact counts and expects every bound to hold — sketch accuracy
    * becomes a hash-matched invariant instead of an untested number
    * (VERDICT r2 "What's wrong" #3). */
  val q37: QueryDef = QueryDef(
    "q37_approx_sketches",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      def within(approx: org.apache.spark.sql.Column, exact: org.apache.spark.sql.Column) =
        abs(approx.cast("double") - exact.cast("double")) / exact.cast("double") < lit(0.05)
      li.groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("exact_parts"),
          approx_count_distinct(col("l_partkey")).as("ap"),
          countDistinct(col("l_orderkey")).as("exact_orders"),
          approx_count_distinct(col("l_orderkey"), 0.01).as("ao"),
          expr("percentile(l_extendedprice, 0.5)").as("ep50"),
          expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("ap50"),
          expr("percentile(l_extendedprice, 0.95)").as("ep95"),
          expr("approx_percentile(l_extendedprice, 0.95, 1000)").as("ap95"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag").as("flag"),
          col("exact_parts"), col("exact_orders"),
          within(col("ap"), col("exact_parts")).as("parts_ok"),
          within(col("ao"), col("exact_orders")).as("orders_ok"),
          within(col("ap50"), col("ep50")).as("p50_ok"),
          within(col("ap95"), col("ep95")).as("p95_ok"),
          col("n"))
        .orderBy(col("flag"))
    },
    Some("""SELECT l_returnflag AS flag,
        count(DISTINCT l_partkey) AS exact_parts,
        count(DISTINCT l_orderkey) AS exact_orders,
        TRUE AS parts_ok, TRUE AS orders_ok, TRUE AS p50_ok, TRUE AS p95_ok,
        count(*) AS n
      FROM lineitem GROUP BY 1 ORDER BY 1"""))

  /** Date/time function suite: diffs, arithmetic, calendar fields —
    * carefully aligned across engines (weekday: Spark weekday==Mon-0,
    * DuckDB isodow-1; week: both ISO). */
  val q36: QueryDef = QueryDef(
    "q36_datetime_suite",
    (s, d) => {
      val o = Tables.orders(s, d).filter(col("o_orderkey") < 500)
      o.select(col("o_orderkey"),
          datediff(lit("2002-01-01").cast("date"), col("o_orderdate")).cast("long").as("days_to_2002"),
          date_format(date_add(col("o_orderdate"), 90), "yyyy-MM-dd").as("plus90"),
          date_format(add_months(col("o_orderdate"), 2), "yyyy-MM-dd").as("plus2mo"),
          expr("weekday(o_orderdate)").cast("long").as("wd"),
          weekofyear(col("o_orderdate")).cast("long").as("iso_week"),
          quarter(col("o_orderdate")).cast("long").as("qtr"),
          date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"),
          date_format(date_trunc("week", col("o_orderdate")), "yyyy-MM-dd").as("week_start"))
        .orderBy(col("o_orderkey"))
    },
    Some("""SELECT o_orderkey,
        CAST(datediff('day', o_orderdate, DATE '2002-01-01') AS BIGINT) AS days_to_2002,
        strftime(o_orderdate + INTERVAL 90 DAY, '%Y-%m-%d') AS plus90,
        strftime(o_orderdate + INTERVAL 2 MONTH, '%Y-%m-%d') AS plus2mo,
        CAST(isodow(o_orderdate) - 1 AS BIGINT) AS wd,
        CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
        CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
        strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
        strftime(date_trunc('week', o_orderdate), '%Y-%m-%d') AS week_start
      FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey"""))

  /** Explicit GROUPING SETS (beyond rollup/cube). */
  val q34: QueryDef = QueryDef(
    "q34_grouping_sets",
    (s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem_v")
      s.sql("""SELECT coalesce(l_returnflag, 'ALL') AS flag,
          coalesce(l_linestatus, 'ALL') AS status,
          count(*) AS n,
          CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents
        FROM lineitem_v
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY flag, status""")
    },
    Some("""SELECT coalesce(l_returnflag, 'ALL') AS flag,
        coalesce(l_linestatus, 'ALL') AS status,
        count(*) AS n,
        CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents
      FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      ORDER BY flag, status"""))

  /** Deterministic array aggregation: sorted distinct element lists,
    * joined to strings so the driver's pandas compare can hash the
    * cells (arrays are unhashable there). */
  val q35: QueryDef = QueryDef(
    "q35_array_agg",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      li.groupBy(col("l_returnflag"))
        .agg(
          concat_ws(",", sort_array(collect_set(col("l_linestatus")))).as("statuses"),
          concat_ws(",",
            transform(sort_array(collect_set(col("l_suppkey") % 10)), _.cast("string"))).as("supp_mod"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag,
        array_to_string(list_sort(list_distinct(list(l_linestatus))), ',') AS statuses,
        array_to_string(list_sort(list_distinct(list(l_suppkey % 10))), ',') AS supp_mod,
        count(*) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Exact percentiles (continuous interpolation) over exact cents —
    * Spark `percentile` == DuckDB `quantile_cont` on integer inputs. */
  val q33: QueryDef = QueryDef(
    "q33_percentiles",
    (s, d) => {
      val o = Tables.orders(s, d)
      o.withColumn("cents", round(col("o_totalprice") * 100, 0).cast("long"))
        .groupBy(col("o_orderstatus"))
        .agg(
          expr("percentile(cents, 0.5)").as("p50"),
          expr("percentile(cents, 0.9)").as("p90"),
          expr("percentile(cents, 0.99)").as("p99"),
          min(col("cents")).as("lo"),
          max(col("cents")).as("hi"))
        .orderBy(col("o_orderstatus"))
    },
    Some("""SELECT o_orderstatus,
        quantile_cont(CAST(round(o_totalprice * 100) AS BIGINT), 0.5) AS p50,
        quantile_cont(CAST(round(o_totalprice * 100) AS BIGINT), 0.9) AS p90,
        quantile_cont(CAST(round(o_totalprice * 100) AS BIGINT), 0.99) AS p99,
        min(CAST(round(o_totalprice * 100) AS BIGINT)) AS lo,
        max(CAST(round(o_totalprice * 100) AS BIGINT)) AS hi
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** Skew-salted join ([[graft.operators.Skew.saltedJoin]]): same
    * semantics as a plain join — the oracle is the UNSALTED SQL, so
    * the salting technique's correctness is itself oracle-proven. */
  val q32: QueryDef = QueryDef(
    "q32_salted_join",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_orderpriority"))
      graft.operators.Skew.saltedJoin(
          li.withColumnRenamed("l_orderkey", "o_orderkey"), o,
          "o_orderkey", Seq("o_orderkey", "l_linenumber"), 8)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("l_quantity") * 100, 0).cast("long")).as("qty_cents"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""SELECT o_orderpriority, count(*) AS n,
        CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** As-of join (custom composed operator, [[graft.operators.Joins.asOf]]):
    * for each purchase event, the user's most recent click at or
    * before it — oracle is DuckDB's native ASOF JOIN. */
  val q31: QueryDef = QueryDef(
    "q31_asof_join",
    (s, d) => {
      val e = Tables.events(s, d).withColumn("tms", expr("unix_millis(ts)"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("tms"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("tms"))
      graft.operators.Joins.asOf(purchases, clicks, Seq("user_id"), "tms", "tms")
        .select(col("event_id"), col("user_id"), col("tms"),
          col("asof_tms").as("last_click_ms"))
        .orderBy(col("event_id"))
    },
    Some("""WITH e AS (SELECT event_id, user_id, event_type, epoch_ms(ts) AS tms FROM events),
      p AS (SELECT event_id, user_id, tms FROM e WHERE event_type = 'purchase'),
      c AS (SELECT user_id, tms FROM e WHERE event_type = 'click')
      SELECT p.event_id, p.user_id, p.tms, c.tms AS last_click_ms
      FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.tms >= c.tms
      ORDER BY p.event_id"""))

  /** lag/lead + moving-average frame (rows between 2 preceding). */
  val q23: QueryDef = QueryDef(
    "q23_window_frames",
    (s, d) => {
      val li = Tables.lineitem(s, d).filter(col("l_suppkey") <= 10)
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      val wf = w.rowsBetween(-2, Window.currentRow)
      li.withColumn("qty_c", round(col("l_quantity") * 100, 0).cast("long"))
        .withColumn("prev_qty_c", lag(col("qty_c"), 1).over(w))
        .withColumn("next_qty_c", lead(col("qty_c"), 1).over(w))
        .withColumn("ma3_c", sum(col("qty_c")).over(wf))
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("qty_c"), col("prev_qty_c"), col("next_qty_c"), col("ma3_c"))
        .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
    },
    Some("""SELECT l_suppkey, l_orderkey, l_linenumber,
        CAST(round(l_quantity * 100) AS BIGINT) AS qty_c,
        lag(CAST(round(l_quantity * 100) AS BIGINT), 1) OVER w AS prev_qty_c,
        lead(CAST(round(l_quantity * 100) AS BIGINT), 1) OVER w AS next_qty_c,
        CAST(sum(CAST(round(l_quantity * 100) AS BIGINT))
             OVER (PARTITION BY l_suppkey
                   ORDER BY l_shipdate, l_orderkey, l_linenumber
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS ma3_c
      FROM lineitem WHERE l_suppkey <= 10
      WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber)
      ORDER BY l_suppkey, l_orderkey, l_linenumber"""))

  /** ntile + rank + dense_rank + percent_rank (exact: integer-derived). */
  val q24: QueryDef = QueryDef(
    "q24_ranking_suite",
    (s, d) => {
      val o = Tables.orders(s, d).filter(col("o_orderkey") < 2000)
      val w = Window.orderBy(col("o_totalprice").desc, col("o_orderkey"))
      o.select(col("o_orderkey"), col("o_totalprice"),
          ntile(4).over(w).cast("long").as("quartile"),
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"),
          percent_rank().over(w).as("prnk"))
        .orderBy(col("o_orderkey"))
    },
    Some("""SELECT o_orderkey, o_totalprice,
        CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        CAST(rank() OVER w AS BIGINT) AS rnk,
        CAST(dense_rank() OVER w AS BIGINT) AS drnk,
        percent_rank() OVER w AS prnk
      FROM orders WHERE o_orderkey < 2000
      WINDOW w AS (ORDER BY o_totalprice DESC, o_orderkey)
      ORDER BY o_orderkey"""))

  /** FULL OUTER join: high-balance customers vs big-order customers. */
  val q25: QueryDef = QueryDef(
    "q25_full_outer",
    (s, d) => {
      val c = Tables.customer(s, d).filter(col("c_acctbal") > 9000)
        .select(col("c_custkey"), col("c_acctbal"))
      val o = Tables.orders(s, d).filter(col("o_totalprice") > 450000)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_big"))
      c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
        .select(coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
          coalesce(col("c_acctbal"), lit(-1d)).as("acctbal"),
          coalesce(col("n_big"), lit(0L)).as("n_big"))
        .orderBy(col("custkey"))
    },
    Some("""WITH c AS (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 9000),
      o AS (SELECT o_custkey, count(*) AS n_big FROM orders
            WHERE o_totalprice > 450000 GROUP BY o_custkey)
      SELECT coalesce(c_custkey, o_custkey) AS custkey,
        coalesce(c_acctbal, -1) AS acctbal,
        coalesce(n_big, 0) AS n_big
      FROM c FULL OUTER JOIN o ON c_custkey = o_custkey
      ORDER BY custkey"""))

  /** CROSS join of the two small dims (cartesian product operator). */
  val q26: QueryDef = QueryDef(
    "q26_cross_join",
    (s, d) => {
      val r = Tables.region(s, d)
      val n = Tables.nation(s, d)
      r.crossJoin(n)
        .select(col("r_name"), col("n_name"),
          (col("r_regionkey") === col("n_regionkey")).cast("long").as("is_home"))
        .orderBy(col("r_name"), col("n_name"))
    },
    Some("""SELECT r_name, n_name,
        CAST(r_regionkey = n_regionkey AS BIGINT) AS is_home
      FROM region CROSS JOIN nation ORDER BY r_name, n_name"""))

  /** IN-subquery (decorrelates to a semi join): orders from the 100
    * richest customers. */
  val q27: QueryDef = QueryDef(
    "q27_in_subquery",
    (s, d) => {
      val top = Tables.customer(s, d)
        .orderBy(col("c_acctbal").desc, col("c_custkey")).limit(100)
        .select(col("c_custkey"))
      val o = Tables.orders(s, d)
      o.join(top, col("o_custkey") === col("c_custkey"), "left_semi")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("o_totalprice") * 100, 0).cast("long")).as("cents"))
        .orderBy(col("o_orderstatus"))
    },
    Some("""SELECT o_orderstatus, count(*) AS n,
        CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM orders WHERE o_custkey IN (
        SELECT c_custkey FROM customer
        ORDER BY c_acctbal DESC, c_custkey LIMIT 100)
      GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** first_value / last_value over a full-partition frame. */
  val q28: QueryDef = QueryDef(
    "q28_first_last",
    (s, d) => {
      val e = Tables.events(s, d).filter(col("user_id") <= 20)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      e.select(col("user_id"),
          first(col("event_type")).over(w).as("first_type"),
          last(col("event_type")).over(w).as("last_type"),
          count(lit(1)).over(w).as("n"))
        .distinct()
        .orderBy(col("user_id"))
    },
    Some("""SELECT DISTINCT user_id,
        first_value(event_type) OVER w AS first_type,
        last_value(event_type) OVER w AS last_type,
        count(*) OVER w AS n
      FROM events WHERE user_id <= 20
      WINDOW w AS (PARTITION BY user_id ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY user_id"""))

  /** Conditional aggregation: CASE-filtered measures per nation. */
  val q29: QueryDef = QueryDef(
    "q29_conditional_agg",
    (s, d) => {
      val c = Tables.customer(s, d)
      c.groupBy(col("c_nationkey"))
        .agg(
          sum(when(col("c_acctbal") > 5000, 1).otherwise(0)).cast("long").as("n_rich"),
          sum(when(col("c_acctbal") < 0, 1).otherwise(0)).cast("long").as("n_debt"),
          sum(when(col("c_mktsegment") === "BUILDING",
            round(col("c_acctbal") * 100, 0).cast("long")).otherwise(0L)).as("building_cents"),
          count(lit(1)).as("n"))
        .orderBy(col("c_nationkey"))
    },
    Some("""SELECT c_nationkey,
        CAST(sum(CASE WHEN c_acctbal > 5000 THEN 1 ELSE 0 END) AS BIGINT) AS n_rich,
        CAST(sum(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_debt,
        CAST(sum(CASE WHEN c_mktsegment = 'BUILDING'
                 THEN CAST(round(c_acctbal * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
          AS building_cents,
        count(*) AS n
      FROM customer GROUP BY c_nationkey ORDER BY c_nationkey"""))

  /** Wider string-function surface: pad/trim/replace/reverse/repeat/
    * position — aligned between engines. */
  val q30: QueryDef = QueryDef(
    "q30_string_suite",
    (s, d) => {
      val p = Tables.part(s, d).filter(col("p_partkey") < 200)
      p.select(col("p_partkey"),
          lpad(col("p_brand"), 12, "*").as("lp"),
          rpad(col("p_brand"), 12, "-").as("rp"),
          trim(lit("  pad  ")).as("tr"),
          regexp_replace(col("p_name"), "[aeiou]", "_").as("novowel"),
          reverse(col("p_type")).as("rev"),
          repeat(col("p_brand"), 2).as("twice"),
          instr(col("p_name"), "a").cast("long").as("pos_a"),
          split(col("p_type"), " ").getItem(0).as("first_word"))
        .orderBy(col("p_partkey"))
    },
    Some("""SELECT p_partkey,
        lpad(p_brand, 12, '*') AS lp,
        rpad(p_brand, 12, '-') AS rp,
        trim('  pad  ') AS tr,
        regexp_replace(p_name, '[aeiou]', '_', 'g') AS novowel,
        reverse(p_type) AS rev,
        repeat(p_brand, 2) AS twice,
        CAST(strpos(p_name, 'a') AS BIGINT) AS pos_a,
        string_split(p_type, ' ')[1] AS first_word
      FROM part WHERE p_partkey < 200 ORDER BY p_partkey"""))
}
