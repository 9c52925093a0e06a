package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Extended relational operator surface (SURVEY §2.3–§2.8): hash aggs,
  * broadcast/shuffle/semi/anti joins, windows, set ops, rollup/cube,
  * pivot, top-k, scalar string/date/math functions — all stock
  * Catalyst operators, validated against DuckDB oracles.
  *
  * Determinism contract (see [[QueryDef]]): every double SUM is
  * computed as an exact BIGINT sum of per-row micro-units so the
  * result is bit-identical across engines regardless of summation
  * order; every query ends in a total ORDER BY.
  */
object Relational {

  /** Exact sum of round(c * 1e6) as long — order-insensitive. */
  private def usum(c: Column): Column = sum(round(c * lit(1e6), 0).cast("long"))
  /** Exact sum of round(c * 100) as long (cents). */
  private def csum(c: Column): Column = sum(round(c * lit(100), 0).cast("long"))
  /** micro-units back to double (single IEEE division — deterministic). */
  private def money(c: Column): Column = c / lit(1e6)

  // DuckDB oracle-side equivalents, as SQL snippets:
  private def uSumSql(e: String) = s"CAST(sum(CAST(round(($e) * 1000000) AS BIGINT)) AS BIGINT)"
  private def cSumSql(e: String) = s"CAST(sum(CAST(round(($e) * 100) AS BIGINT)) AS BIGINT)"

  def all: Seq[QueryDef] = Seq(q01, q02, q03, q04, q05, q06, q07, q08,
    q09, q10, q11, q12, q13, q14, q15, q16, q17, q18, q19, q20, q21, q22)

  /** TPC-H Q1-style pricing summary: multi-measure hash aggregation
    * with partial (map-side) aggregation — SURVEY §2.4 A4. */
  val q01: QueryDef = QueryDef(
    "q01_pricing_summary",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      li.filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          money(usum(col("l_quantity"))).as("sum_qty"),
          money(usum(col("l_extendedprice"))).as("sum_base_price"),
          money(usum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_price"),
          money(usum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))).as("sum_charge"),
          (money(usum(col("l_quantity"))) / count(lit(1)).cast("double")).as("avg_qty"),
          (money(usum(col("l_discount"))) / count(lit(1)).cast("double")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some(s"""SELECT l_returnflag, l_linestatus,
      ${uSumSql("l_quantity")} / 1000000.0 AS sum_qty,
      ${uSumSql("l_extendedprice")} / 1000000.0 AS sum_base_price,
      ${uSumSql("l_extendedprice * (1 - l_discount)")} / 1000000.0 AS sum_disc_price,
      ${uSumSql("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} / 1000000.0 AS sum_charge,
      ${uSumSql("l_quantity")} / 1000000.0 / CAST(count(*) AS DOUBLE) AS avg_qty,
      ${uSumSql("l_discount")} / 1000000.0 / CAST(count(*) AS DOUBLE) AS avg_disc,
      count(*) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
      GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"""))

  /** Broadcast hash join: fact×small-dim (part is broadcast-able at any
    * SF where dims stay ~1e-4 of fact size) + grouped revenue. */
  val q02: QueryDef = QueryDef(
    "q02_brand_revenue",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val p = Tables.part(s, d)
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(money(usum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("p_brand"))
    },
    Some(s"""SELECT p_brand,
      ${uSumSql("l_extendedprice * (1 - l_discount)")} / 1000000.0 AS revenue,
      count(*) AS n_items
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand ORDER BY p_brand"""))

  /** Shuffle (sort-merge-able) join on the two large tables, grouped by
    * order priority — Catalyst/AQE picks the physical join. */
  val q03: QueryDef = QueryDef(
    "q03_priority_revenue",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(money(usum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"),
          countDistinct(col("o_orderkey")).as("n_orders"))
        .orderBy(col("o_orderpriority"))
    },
    Some(s"""SELECT o_orderpriority,
      ${uSumSql("l_extendedprice * (1 - l_discount)")} / 1000000.0 AS revenue,
      count(DISTINCT o_orderkey) AS n_orders
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** Left-semi join (EXISTS): customers having at least one large order. */
  val q04: QueryDef = QueryDef(
    "q04_big_spenders",
    (s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_totalprice") > 400000)
      c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_totalprice > 400000)
      ORDER BY c_custkey"""))

  /** Left-anti join (NOT EXISTS): customers with no urgent orders. */
  val q05: QueryDef = QueryDef(
    "q05_no_urgent_customers",
    (s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey, c_name FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_orderpriority = '1-URGENT')
      ORDER BY c_custkey"""))

  /** 5-way star join (region⋈nation⋈customer⋈orders⋈lineitem): small
    * dims broadcast, fact-side shuffle join — revenue per nation. */
  val q06: QueryDef = QueryDef(
    "q06_nation_revenue",
    (s, d) => {
      val r = Tables.region(s, d)
      val n = Tables.nation(s, d)
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      val li = Tables.lineitem(s, d)
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(money(usum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("r_name"), col("n_name"))
    },
    Some(s"""SELECT r_name, n_name,
      ${uSumSql("l_extendedprice * (1 - l_discount)")} / 1000000.0 AS revenue,
      count(*) AS n_items
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name ORDER BY r_name, n_name"""))

  /** Ranking window: top-3 orders per customer (row_number). */
  val q07: QueryDef = QueryDef(
    "q07_top3_orders_per_customer",
    (s, d) => {
      val o = Tables.orders(s, d)
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      o.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("o_custkey"), col("rk").cast("long").as("rk"),
          col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_custkey"), col("rk"))
    },
    Some("""SELECT o_custkey, CAST(rk AS BIGINT) AS rk, o_orderkey, o_totalprice FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
        FROM orders) WHERE rk <= 3
      ORDER BY o_custkey, rk"""))

  /** Running-total window (unbounded preceding frame) over events; the
    * running sum is kept in exact cents so it is order-robust. */
  val q08: QueryDef = QueryDef(
    "q08_running_user_spend",
    (s, d) => {
      val e = Tables.events(s, d)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      e.withColumn("cents", round(col("value") * 100, 0).cast("long"))
        .withColumn("running_cents", sum(col("cents")).over(w))
        .select(col("event_id"), col("user_id"), col("running_cents"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT event_id, user_id,
        CAST(sum(CAST(round(value * 100) AS BIGINT))
             OVER (PARTITION BY user_id ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS running_cents
      FROM events ORDER BY event_id"""))

  /** INTERSECT set op: part keys seen in both return-flag classes. */
  val q09: QueryDef = QueryDef(
    "q09_intersect_partkeys",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val a = li.filter(col("l_returnflag") === "R").select(col("l_partkey"))
      val b = li.filter(col("l_returnflag") === "A").select(col("l_partkey"))
      a.intersect(b).orderBy(col("l_partkey"))
    },
    Some("""SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
      INTERSECT
      SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
      ORDER BY l_partkey"""))

  /** EXCEPT set op: parts not shipped in 1995 (catalog minus a
    * filtered fact scan — filter pushed to the parquet scan). */
  val q10: QueryDef = QueryDef(
    "q10_except_unshipped_parts",
    (s, d) => {
      val p = Tables.part(s, d).select(col("p_partkey"))
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
        .select(col("l_partkey").as("p_partkey"))
      p.except(li).orderBy(col("p_partkey"))
    },
    Some("""SELECT p_partkey FROM part
      EXCEPT
      SELECT l_partkey AS p_partkey FROM lineitem
      WHERE l_shipdate < TIMESTAMP '1996-01-01'
      ORDER BY p_partkey"""))

  /** Distinct aggregation: per-flag distinct part/supplier cardinality. */
  val q11: QueryDef = QueryDef(
    "q11_distinct_counts",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** ROLLUP grouping-set aggregation (subtotals + grand total). */
  val q12: QueryDef = QueryDef(
    "q12_rollup_flag_status",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      li.rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), money(usum(col("l_quantity"))).as("qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          col("n"), col("qty"))
        .orderBy(col("flag"), col("status"))
    },
    Some(s"""SELECT coalesce(l_returnflag, 'ALL') AS flag,
        coalesce(l_linestatus, 'ALL') AS status,
        count(*) AS n, ${uSumSql("l_quantity")} / 1000000.0 AS qty
      FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      ORDER BY flag, status"""))

  /** CUBE grouping-set aggregation over orders dims. */
  val q13: QueryDef = QueryDef(
    "q13_cube_status_priority",
    (s, d) => {
      val o = Tables.orders(s, d)
      o.cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), money(usum(col("o_totalprice"))).as("total"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("total"))
        .orderBy(col("status"), col("priority"))
    },
    Some(s"""SELECT coalesce(o_orderstatus, 'ALL') AS status,
        coalesce(o_orderpriority, 'ALL') AS priority,
        count(*) AS n, ${uSumSql("o_totalprice")} / 1000000.0 AS total
      FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      ORDER BY status, priority"""))

  /** Scalar string/date/math functions (SURVEY §2.8 extended): all
    * codegen'd builtins, no UDFs. */
  val q14: QueryDef = QueryDef(
    "q14_scalar_functions",
    (s, d) => {
      val o = Tables.orders(s, d).filter(col("o_orderkey") < 1000)
      o.select(
          col("o_orderkey"),
          upper(substring(col("o_orderpriority"), 1, 3)).as("prio3"),
          length(col("o_orderstatus")).cast("long").as("status_len"),
          concat_ws("-", col("o_orderstatus"), col("o_orderpriority")).as("tag"),
          year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mo"),
          dayofmonth(col("o_orderdate")).cast("long").as("dom"),
          (round(col("o_totalprice") * 100, 0).cast("long") % 97).as("cents_mod97"),
          floor(col("o_totalprice")).cast("long").as("price_floor"),
          ceil(col("o_totalprice")).cast("long").as("price_ceil"),
          abs(col("o_totalprice") - 200000).as("dist200k"))
        .orderBy(col("o_orderkey"))
    },
    Some("""SELECT o_orderkey,
        upper(substr(o_orderpriority, 1, 3)) AS prio3,
        CAST(length(o_orderstatus) AS BIGINT) AS status_len,
        concat_ws('-', o_orderstatus, o_orderpriority) AS tag,
        CAST(year(o_orderdate) AS BIGINT) AS yr,
        CAST(month(o_orderdate) AS BIGINT) AS mo,
        CAST(day(o_orderdate) AS BIGINT) AS dom,
        CAST(round(o_totalprice * 100) AS BIGINT) % 97 AS cents_mod97,
        CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
        CAST(ceil(o_totalprice) AS BIGINT) AS price_ceil,
        abs(o_totalprice - 200000) AS dist200k
      FROM orders WHERE o_orderkey < 1000 ORDER BY o_orderkey"""))

  /** GROUP BY + HAVING: suppliers moving large volume. */
  val q15: QueryDef = QueryDef(
    "q15_having_volume",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      li.groupBy(col("l_suppkey"))
        .agg(money(usum(col("l_quantity"))).as("qty"), count(lit(1)).as("n"))
        .filter(col("qty") > 5000)
        .orderBy(col("l_suppkey"))
    },
    Some(s"""SELECT l_suppkey, ${uSumSql("l_quantity")} / 1000000.0 AS qty,
        count(*) AS n
      FROM lineitem GROUP BY l_suppkey
      HAVING ${uSumSql("l_quantity")} / 1000000.0 > 5000
      ORDER BY l_suppkey"""))

  /** Global top-k (orderBy + limit → TakeOrderedAndProject). */
  val q16: QueryDef = QueryDef(
    "q16_top20_orders",
    (s, d) => {
      val o = Tables.orders(s, d)
      o.select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(20)
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20"""))

  /** Time-bucketed aggregation over the events stream table (5-minute
    * tumbling buckets via epoch arithmetic — batch analog of the
    * Structured Streaming window, oracle-expressible). */
  val q17: QueryDef = QueryDef(
    "q17_event_buckets",
    (s, d) => {
      val e = Tables.events(s, d)
      e.withColumn("bucket", floor(col("ts").cast("long") / 300).cast("long"))
        .groupBy(col("bucket"), col("event_type"))
        .agg(count(lit(1)).as("n"), csum(col("value")).as("cents"))
        .orderBy(col("bucket"), col("event_type"))
    },
    Some(s"""SELECT CAST(floor(epoch(ts) / 300) AS BIGINT) AS bucket,
        event_type, count(*) AS n, ${cSumSql("value")} AS cents
      FROM events GROUP BY bucket, event_type ORDER BY bucket, event_type"""))

  /** PIVOT: per-user event-type counts as columns. */
  val q18: QueryDef = QueryDef(
    "q18_pivot_event_types",
    (s, d) => {
      val e = Tables.events(s, d)
      val types = Seq("click", "error", "purchase", "signup", "view")
      val p = e.groupBy(col("user_id"))
        .pivot("event_type", types).agg(count(lit(1)))
      p.select(col("user_id") +: types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
        .orderBy(col("user_id"))
    },
    Some("""SELECT user_id,
        count(*) FILTER (WHERE event_type = 'click') AS click,
        count(*) FILTER (WHERE event_type = 'error') AS error,
        count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        count(*) FILTER (WHERE event_type = 'signup') AS signup,
        count(*) FILTER (WHERE event_type = 'view') AS view
      FROM events GROUP BY user_id ORDER BY user_id"""))

  /** UNION (distinct) of two key sets. */
  val q19: QueryDef = QueryDef(
    "q19_union_supplier_keys",
    (s, d) => {
      val a = Tables.supplier(s, d).filter(col("s_acctbal") > 5000)
        .select(col("s_suppkey").as("k"))
      val b = Tables.lineitem(s, d).filter(col("l_quantity") > 49)
        .select(col("l_suppkey").as("k"))
      a.union(b).distinct().orderBy(col("k"))
    },
    Some("""SELECT s_suppkey AS k FROM supplier WHERE s_acctbal > 5000
      UNION
      SELECT l_suppkey AS k FROM lineitem WHERE l_quantity > 49
      ORDER BY k"""))

  /** Derived-table (decorrelated subquery) join: orders above their
    * customer's average order value. */
  val q20: QueryDef = QueryDef(
    "q20_above_avg_orders",
    (s, d) => {
      val o = Tables.orders(s, d)
      val avgs = o.groupBy(col("o_custkey").as("ck"))
        .agg((money(usum(col("o_totalprice"))) / count(lit(1)).cast("double")).as("avg_price"))
      o.join(avgs, col("o_custkey") === col("ck"))
        .filter(col("o_totalprice") > col("avg_price"))
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_above"))
        .orderBy(col("o_custkey"))
    },
    Some(s"""WITH avgs AS (
        SELECT o_custkey AS ck,
          ${uSumSql("o_totalprice")} / 1000000.0 / CAST(count(*) AS DOUBLE) AS avg_price
        FROM orders GROUP BY o_custkey)
      SELECT o_custkey, count(*) AS n_above
      FROM orders JOIN avgs ON o_custkey = ck
      WHERE o_totalprice > avg_price
      GROUP BY o_custkey ORDER BY o_custkey"""))

  /** Monthly trend: date_trunc + multi-measure agg. */
  val q21: QueryDef = QueryDef(
    "q21_monthly_order_trend",
    (s, d) => {
      val o = Tables.orders(s, d)
      o.withColumn("month", date_format(col("o_orderdate"), "yyyy-MM"))
        .groupBy(col("month"))
        .agg(count(lit(1)).as("n_orders"),
          money(usum(col("o_totalprice"))).as("total"),
          countDistinct(col("o_custkey")).as("n_custs"))
        .orderBy(col("month"))
    },
    Some(s"""SELECT strftime(o_orderdate, '%Y-%m') AS month,
        count(*) AS n_orders, ${uSumSql("o_totalprice")} / 1000000.0 AS total,
        count(DISTINCT o_custkey) AS n_custs
      FROM orders GROUP BY month ORDER BY month"""))

  /** Regexp extraction over semi-structured props (JSON-ish payload)
    * — SURVEY §2.8 string-function surface. */
  val q22: QueryDef = QueryDef(
    "q22_props_extract",
    (s, d) => {
      val e = Tables.events(s, d)
      e.withColumn("k", regexp_extract(col("props"), "[0-9]+", 0).cast("long"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("k_sum"), count(lit(1)).as("n"),
          min(col("k")).as("k_min"), max(col("k")).as("k_max"))
        .orderBy(col("event_type"))
    },
    Some("""SELECT event_type,
        CAST(sum(CAST(regexp_extract(props, '[0-9]+') AS BIGINT)) AS BIGINT) AS k_sum,
        count(*) AS n,
        min(CAST(regexp_extract(props, '[0-9]+') AS BIGINT)) AS k_min,
        max(CAST(regexp_extract(props, '[0-9]+') AS BIGINT)) AS k_max
      FROM events GROUP BY event_type ORDER BY event_type"""))
}
