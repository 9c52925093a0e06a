package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.TextOps

/** Round-10 additions, part 19: grouping() provenance flags, shard
  * balance audit, and week-over-week share shift.
  */
object Pipeline29 {

  def all: Seq[QueryDef] = Seq(q59, p31, e27)

  /** `grouping()` provenance flags over a CUBE — the companion q34
    * lacks: each output row carries the bit that says whether a
    * dimension is aggregated-away or a real value (the thing
    * `coalesce(col, 'ALL')` gets WRONG when the data itself contains
    * the sentinel). Identical function in both engines. */
  val q59: QueryDef = QueryDef(
    "q59_grouping_flags",
    (s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem_g")
      s.sql("""SELECT l_returnflag, l_linestatus,
          CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
          CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
          count(*) AS n
        FROM lineitem_g
        GROUP BY CUBE (l_returnflag, l_linestatus)
        ORDER BY g_flag, g_status, l_returnflag, l_linestatus""")
    },
    Some("""SELECT l_returnflag, l_linestatus,
        CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
        CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
        CAST(count(*) AS BIGINT) AS n
      FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
      ORDER BY g_flag, g_status, l_returnflag, l_linestatus"""))

  /** Shard balance audit — the eval half of p05's deterministic
    * shuffle: per shard the doc count, token mass, and balance index
    * `tokens·32·1e6 div total` (1e6 = perfectly even). The skew
    * number a shard-writer checks before committing a layout. */
  val p31: QueryDef = QueryDef(
    "p31_shard_balance",
    (s, d) => {
      val sh = Tables.documents(s, d)
        .selectExpr("doc_id",
          "cast(size(filter(split(text, '[ ]+'), x -> x != '')) as bigint) AS n_tokens",
          s"${TextOps.strHash60("cast(doc_id as string)")} % 32 AS shard")
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tokens"))
      val tot = sh.agg(sum(col("tokens")).as("total"))
      // decimal(38,0) product: `tokens · 32 · 1e6` wraps Int64 past
      // ~2.9e11 tokens per shard (the oracle's HUGEINT raises
      // instead) — 128-bit intermediates keep both engines exact
      sh.crossJoin(broadcast(tot))
        .selectExpr("shard", "n_docs", "tokens",
          "cast((cast(tokens as decimal(38,0)) * 32 * 1000000) div total" +
            " as bigint) AS balance_micro")
        .orderBy(col("shard"))
    },
    Some(s"""WITH sh AS (SELECT
               ${DuckOps.strHash60("CAST(doc_id AS VARCHAR)")} % 32 AS shard,
               CAST(len(list_filter(regexp_split_to_array(text, '[ ]+'),
                 x -> x <> '')) AS BIGINT) AS n_tokens
             FROM documents),
      g AS (SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(n_tokens) AS BIGINT) AS tokens
            FROM sh GROUP BY 1),
      tot AS (SELECT CAST(sum(tokens) AS BIGINT) AS total FROM g)
      SELECT g.shard, g.n_docs, g.tokens,
        CAST((CAST(g.tokens AS HUGEINT) * 32 * 1000000) // tot.total
          AS BIGINT) AS balance_micro
      FROM g, tot ORDER BY g.shard"""))

  /** Week-over-week share shift: each event type's weekly share of
    * traffic in micro units and its delta vs the previous week
    * (first week reports 0) — the mix-shift monitor. Windows over
    * the (type, week) grid only. */
  val e27: QueryDef = QueryDef(
    "e27_share_shift",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val g = Tables.events(s, d)
        .selectExpr("cast(trunc(to_date(ts), 'week') as string) AS week",
          "event_type")
        .groupBy(col("week"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val shared = g.withColumn("week_total",
          sum(col("n")).over(Window.partitionBy(col("week"))))
        .selectExpr("week", "event_type", "n",
          "(n * 1000000) div week_total AS share_micro")
      shared.withColumn("delta_micro",
          col("share_micro") - coalesce(
            lag(col("share_micro"), 1).over(Window.partitionBy(col("event_type"))
              .orderBy(col("week"))), col("share_micro")))
        .orderBy(col("week"), col("event_type"))
    },
    Some("""WITH g AS (SELECT CAST(date_trunc('week', CAST(ts AS DATE)) AS VARCHAR)
                 AS week, event_type, CAST(count(*) AS BIGINT) AS n
             FROM events GROUP BY 1, 2),
      sh AS (SELECT week, event_type, n,
               (n * 1000000) // CAST(sum(n) OVER (PARTITION BY week) AS BIGINT)
                 AS share_micro
             FROM g)
      SELECT week, event_type, n, share_micro,
        share_micro - COALESCE(lag(share_micro) OVER (PARTITION BY event_type
          ORDER BY week), share_micro) AS delta_micro
      FROM sh ORDER BY week, event_type"""))
}
