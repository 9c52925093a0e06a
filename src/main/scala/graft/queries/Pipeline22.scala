package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Dedup, Packing, TextOps}

/** Round-10 additions, part 12: packing-efficiency audit, the
  * MinHash verify-threshold sweep, and the user survival curve.
  */
object Pipeline22 {

  def all: Seq[QueryDef] = Seq(p29, d15, e21)

  /** Packing-efficiency audit — the eval half of p03: per language
    * the bin count, packed token mass, capacity, fill share in micro
    * units, and the worst single-bin waste. A bin's final fill is the
    * max running `fill_after` inside it (monotone within a bin by
    * construction). The oracle nests p03's recursive packing chain. */
  val p29: QueryDef = QueryDef(
    "p29_packing_efficiency",
    (s, d) => {
      val packed = Packing.packGreedy(
        Tables.documents(s, d).selectExpr("lang", "doc_id",
          s"cast(size(${TextOps.tokens("text")}) as bigint) AS n_tokens"),
        "lang", "doc_id", "n_tokens", budget = 200L)
      packed.groupBy(col("lang"), col("bin_id"))
        .agg(max(col("fill_after")).as("fill"), count(lit(1)).as("n_docs"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_bins"), sum(col("fill")).as("packed_tokens"),
          min(col("fill")).as("min_fill"), sum(col("n_docs")).as("n_docs"))
        .selectExpr("lang", "n_bins", "n_docs", "packed_tokens",
          "n_bins * 200 AS capacity",
          "(packed_tokens * 1000000) div (n_bins * 200) AS fill_micro",
          "200 - min_fill AS max_waste")
        .orderBy(col("lang"))
    },
    Some(s"""WITH RECURSIVE ordered AS (
        SELECT lang, doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
          row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
        FROM (SELECT lang, doc_id, ${DuckOps.tokens("text")} AS t FROM documents)),
      packed AS (
        SELECT lang, doc_id, n_tokens, rn, CAST(0 AS BIGINT) AS bin_id,
          n_tokens AS fill_after
        FROM ordered WHERE rn = 1
        UNION ALL
        SELECT o.lang, o.doc_id, o.n_tokens, o.rn,
          CASE WHEN p.fill_after + o.n_tokens > 200 THEN p.bin_id + 1 ELSE p.bin_id END,
          CASE WHEN p.fill_after + o.n_tokens > 200 THEN o.n_tokens
               ELSE p.fill_after + o.n_tokens END
        FROM packed p JOIN ordered o ON o.lang = p.lang AND o.rn = p.rn + 1),
      bins AS (SELECT lang, bin_id, CAST(max(fill_after) AS BIGINT) AS fill,
                 CAST(count(*) AS BIGINT) AS n_docs
               FROM packed GROUP BY 1, 2)
      SELECT lang, CAST(count(*) AS BIGINT) AS n_bins,
        CAST(sum(n_docs) AS BIGINT) AS n_docs,
        CAST(sum(fill) AS BIGINT) AS packed_tokens,
        CAST(count(*) AS BIGINT) * 200 AS capacity,
        (CAST(sum(fill) AS BIGINT) * 1000000) // (CAST(count(*) AS BIGINT) * 200)
          AS fill_micro,
        200 - CAST(min(fill) AS BIGINT) AS max_waste
      FROM bins GROUP BY 1 ORDER BY 1"""))

  /** MinHash verify-threshold sweep — the S-curve's verify stage:
    * from ONE banded candidate generation (4×4, the d03 instance),
    * surviving pair counts at estimated-Jaccard thresholds 0.25 /
    * 0.5 / 0.75 (integer `matches >= {4,8,12}` — no float compares).
    * Candidates are computed once; the sweep is a conditional agg. */
  val d15: QueryDef = QueryDef(
    "d15_threshold_sweep",
    (s, d) => Dedup.minhashLshPairs(Tables.documents(s, d), "text", 3, 16, 4, 0.25)
      .agg(sum(when(col("matches") >= 4, 1L).otherwise(0L)).as("m4"),
        sum(when(col("matches") >= 8, 1L).otherwise(0L)).as("m8"),
        sum(when(col("matches") >= 12, 1L).otherwise(0L)).as("m12"))
      .selectExpr("stack(3, 250000L, m4, 500000L, m8, 750000L, m12)" +
        " AS (threshold_micro, n_pairs)")
      .orderBy(col("threshold_micro")),
    Some(s"""${Pipeline.minhashCtes},
      c AS (SELECT
          CAST(sum(CASE WHEN matches >= 4 THEN 1 ELSE 0 END) AS BIGINT) AS m4,
          CAST(sum(CASE WHEN matches >= 8 THEN 1 ELSE 0 END) AS BIGINT) AS m8,
          CAST(sum(CASE WHEN matches >= 12 THEN 1 ELSE 0 END) AS BIGINT) AS m12
        FROM est)
      SELECT threshold_micro, n_pairs FROM (
        SELECT CAST(250000 AS BIGINT) AS threshold_micro, m4 AS n_pairs FROM c
        UNION ALL SELECT 500000, m8 FROM c
        UNION ALL SELECT 750000, m12 FROM c)
      ORDER BY threshold_micro"""))

  /** User survival curve: per observed lifetime (days between first
    * and last event) the user count, the count still "alive" at that
    * lifetime or longer (reverse running sum over the ≤31-row
    * histogram), and the survival share in micro units. */
  val e21: QueryDef = QueryDef(
    "e21_survival_curve",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val lt = Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(expr("datediff(max(to_date(ts)), min(to_date(ts)))")
          .cast("long").as("days"))
      val h = lt.groupBy(col("days")).agg(count(lit(1)).as("n_users"))
      val w = Window.orderBy(col("days"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      h.withColumn("n_surviving", sum(col("n_users")).over(w))
        .crossJoin(broadcast(lt.agg(count(lit(1)).as("n_total"))))
        .selectExpr("days", "n_users", "n_surviving",
          "(n_surviving * 1000000) div n_total AS survival_micro")
        .orderBy(col("days"))
    },
    Some("""WITH lt AS (SELECT user_id,
               CAST(max(CAST(ts AS DATE)) - min(CAST(ts AS DATE)) AS BIGINT) AS days
             FROM events GROUP BY 1),
      h AS (SELECT days, CAST(count(*) AS BIGINT) AS n_users FROM lt GROUP BY 1),
      t AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM lt)
      SELECT h.days, h.n_users,
        CAST(sum(h.n_users) OVER (ORDER BY h.days
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_surviving,
        (CAST(sum(h.n_users) OVER (ORDER BY h.days
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) * 1000000)
          // t.n_total AS survival_micro
      FROM h, t ORDER BY h.days"""))
}
