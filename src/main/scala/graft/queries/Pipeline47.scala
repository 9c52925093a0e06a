package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Dedup, Similarity}

/** Round-11 additions, part 12: IVF list-balance health, rolling
  * 7-day actives, and the temperature mixture recomputed over
  * post-dedup effective tokens.
  */
object Pipeline47 {

  def all: Seq[QueryDef] = Seq(s30, e34, p37)

  /** floor(x·1e6/y) in pure BIGINT long-division (the p02/p16
    * idiom — exact far past the naive x*1e6 overflow point). */
  private def microDiv(x: String, y: String): String =
    s"($x div $y) * 1000000 + (($x % $y) * 1000 div $y) * 1000 + " +
      s"((($x % $y) * 1000 % $y) * 1000 div $y)"

  /** IVF inverted-list balance health
    * ([[graft.operators.Similarity.assignCentroids]] under the fixed
    * 16-centroid codebook): list sizes, the hottest/coldest list,
    * the hot-list load factor (max·k/n — how much worse than uniform
    * the worst probe is), and the list-size HHI. An unbalanced IVF
    * silently degrades to brute force on hot lists — this is the
    * number to check BEFORE shipping an index, the s23 probe-recall
    * sweep's capacity-side twin. One assignment projection + two
    * partial aggs; never joins the corpus. */
  val s30: QueryDef = QueryDef(
    "s30_ivf_list_balance",
    (s, d) => Similarity.assignCentroids(Tables.embeddings(s, d), 16)
      .groupBy(col("centroid")).agg(count(lit(1)).as("sz"))
      .agg(count(lit(1)).as("k_lists"),
        coalesce(sum(col("sz")), lit(0L)).as("n_vecs"),
        max(col("sz")).as("max_list"), min(col("sz")).as("min_list"),
        coalesce(sum(expr("sz * sz")), lit(0L)).as("s2"))
      .selectExpr("k_lists", "n_vecs", "max_list", "min_list",
        "cast((cast(max_list as decimal(38,0)) * k_lists * 1000000) div n_vecs as bigint) AS load_factor_micro",
        "cast((cast(s2 as decimal(38,0)) * 1000000) div (cast(n_vecs as decimal(38,0)) * n_vecs) as bigint) AS hhi_micro"),
    Some(s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
                        FROM embeddings),
      n AS (SELECT vec_id, v, ${DuckOps.norm2("v")} AS nrm FROM e),
      c AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n WHERE vec_id < 16),
      asg AS (SELECT vec_id, cid AS centroid FROM (
          SELECT a.vec_id, c.cid,
            row_number() OVER (PARTITION BY a.vec_id
              ORDER BY ${DuckOps.dot("a.v", "c.cv")} / (sqrt(a.nrm) * sqrt(c.cn)) DESC,
                       c.cid ASC) AS rn
          FROM n a CROSS JOIN c
          WHERE NOT isnan(${DuckOps.dot("a.v", "c.cv")} / (sqrt(a.nrm) * sqrt(c.cn)))) WHERE rn = 1),
      sz AS (SELECT centroid, CAST(count(*) AS BIGINT) AS sz FROM asg GROUP BY 1),
      m AS (SELECT CAST(count(*) AS BIGINT) AS k_lists,
              CAST(sum(sz) AS BIGINT) AS n_vecs,
              CAST(max(sz) AS BIGINT) AS max_list,
              CAST(min(sz) AS BIGINT) AS min_list,
              CAST(sum(sz * sz) AS BIGINT) AS s2 FROM sz)
      SELECT k_lists, n_vecs, max_list, min_list,
        CAST((CAST(max_list AS HUGEINT) * k_lists * 1000000) // n_vecs AS BIGINT)
          AS load_factor_micro,
        CAST((CAST(s2 AS HUGEINT) * 1000000)
          // (CAST(n_vecs AS HUGEINT) * n_vecs) AS BIGINT) AS hhi_micro
      FROM m"""))

  /** Rolling 7-day active users per day (WAU-by-day): each distinct
    * (day, user) contributes to its 7 trailing windows via a bounded
    * ×7 date explode, then one distinct count per target day —
    * never a per-event window, never a self-join of the corpus.
    * Reported for days inside the observed range. */
  val e34: QueryDef = QueryDef(
    "e34_rolling_wau",
    (s, d) => {
      val du = Tables.events(s, d)
        .selectExpr("to_date(ts) AS day", "user_id AS u").distinct()
      val bounds = du.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      du.selectExpr("explode(sequence(day, date_add(day, 6))) AS tday", "u")
        .groupBy(col("tday")).agg(countDistinct(col("u")).as("wau"))
        .crossJoin(broadcast(bounds))
        .filter(col("tday") >= col("d0") && col("tday") <= col("d1"))
        .selectExpr("cast(tday as string) AS day", "wau")
        .orderBy(col("day"))
    },
    Some("""WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id AS u
               FROM events),
      b AS (SELECT min(day) AS d0, max(day) AS d1 FROM du),
      g AS (SELECT CAST(unnest(generate_series(CAST(day AS TIMESTAMP),
               CAST(day + 6 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS tday, u
            FROM du),
      w AS (SELECT tday, CAST(count(DISTINCT u) AS BIGINT) AS wau
            FROM g GROUP BY 1)
      SELECT CAST(w.tday AS VARCHAR) AS day, w.wau
      FROM w, b WHERE w.tday BETWEEN b.d0 AND b.d1
      ORDER BY 1"""))

  /** Temperature mixture over POST-DEDUP effective tokens: p16's
    * sqrt-temperature reweighting driven by p35's effective token
    * counts instead of raw doc counts — dedup changes the mixture
    * (boilerplate-heavy sources shrink before their weight is set),
    * and composing the two audited operators keeps one source of
    * truth: the oracle nests p35's full chain inside p16's micro-div
    * replay. */
  val p37: QueryDef = QueryDef(
    "p37_effective_mixture",
    (s, d) => {
      val per = Dedup.segmentDedupSavings(Tables.documents(s, d), "text", 8)
        .selectExpr("source", "effective_tokens",
          "cast(round(sqrt(cast(effective_tokens as double)) * 1000000) as bigint) AS s_micro")
      val tot = per.agg(sum(col("effective_tokens")).as("n_total"),
        sum(col("s_micro")).as("s_total"))
      per.crossJoin(broadcast(tot))
        .selectExpr("source", "effective_tokens",
          s"${microDiv("effective_tokens", "n_total")} AS p_micro",
          s"${microDiv("s_micro", "s_total")} AS q_micro")
        .selectExpr("source", "effective_tokens", "p_micro", "q_micro",
          "if(p_micro = 0, 0, (q_micro * 1000000) div p_micro) AS boost_micro")
        .orderBy(col("source"))
    },
    Some(s"""WITH p35 AS (SELECT * FROM (${Pipeline42.p35.oracle.get}) AS x),
      per AS (SELECT source, effective_tokens,
               CAST(round(sqrt(effective_tokens::DOUBLE) * 1000000) AS BIGINT) AS s_micro
             FROM p35),
      tot AS (SELECT CAST(sum(effective_tokens) AS BIGINT) AS n_total,
                     CAST(sum(s_micro) AS BIGINT) AS s_total FROM per),
      m AS (SELECT source, effective_tokens,
              (effective_tokens // n_total) * 1000000 +
                ((effective_tokens % n_total) * 1000 // n_total) * 1000 +
                (((effective_tokens % n_total) * 1000 % n_total) * 1000 // n_total) AS p_micro,
              (s_micro // s_total) * 1000000 + ((s_micro % s_total) * 1000 // s_total) * 1000 +
                (((s_micro % s_total) * 1000 % s_total) * 1000 // s_total) AS q_micro
            FROM per, tot)
      SELECT source, effective_tokens, p_micro, q_micro,
        CASE WHEN p_micro = 0 THEN 0 ELSE (q_micro * 1000000) // p_micro END AS boost_micro
      FROM m ORDER BY source"""))
}
