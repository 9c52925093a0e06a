package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Round-10 additions, part 15: largest-remainder token
  * apportionment, mutual-best-match pairing, and the equi-width
  * histogram.
  */
object Pipeline25 {

  def all: Seq[QueryDef] = Seq(p30, c07, q55)

  /** Largest-remainder apportionment of a 100k-slot training budget
    * across sources proportional to token mass — quotas sum to the
    * budget EXACTLY (floor quotas + one extra slot to the largest
    * remainders, ties to the lexicographically first source). The
    * integer primitive behind "how many sequences from each source
    * per epoch". Everything after the per-source agg is broadcast
    * arithmetic over S rows. */
  val p30: QueryDef = QueryDef(
    "p30_token_apportionment",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val per = Tables.documents(s, d)
        .selectExpr("source",
          "cast(size(filter(split(text, '[ ]+'), x -> x != '')) as bigint) AS n")
        .groupBy(col("source")).agg(sum(col("n")).as("w"))
      val tot = per.agg(sum(col("w")).as("wsum"))
      // decimal(38,0) product: `w * 1e5` wraps Int64 past ~9.2e13
      // tokens per source (the oracle's HUGEINT raises instead) —
      // 128-bit intermediates keep both engines exact at 100 TB
      val base = per.crossJoin(broadcast(tot))
        .selectExpr("source", "w",
          "cast((cast(w as decimal(38,0)) * 100000) div wsum as bigint)" +
            " AS base_quota",
          "cast((cast(w as decimal(38,0)) * 100000) % wsum as bigint)" +
            " AS rem_num")
      val slack = base.agg((lit(100000L) - sum(col("base_quota"))).as("r"))
      base.crossJoin(broadcast(slack))
        .withColumn("rn", row_number().over(
          Window.orderBy(col("rem_num").desc, col("source").asc)).cast("long"))
        .selectExpr("source", "w", "base_quota",
          "if(rn <= r, 1L, 0L) AS extra",
          "base_quota + if(rn <= r, 1L, 0L) AS quota")
        .orderBy(col("source"))
    },
    Some("""WITH per AS (SELECT source,
               CAST(sum(CAST(len(list_filter(regexp_split_to_array(text, '[ ]+'),
                 x -> x <> '')) AS BIGINT)) AS BIGINT) AS w
             FROM documents GROUP BY 1),
      tot AS (SELECT CAST(sum(w) AS BIGINT) AS wsum FROM per),
      base AS (SELECT source, w,
                 CAST((CAST(w AS HUGEINT) * 100000) // wsum AS BIGINT)
                   AS base_quota,
                 CAST((CAST(w AS HUGEINT) * 100000) % wsum AS BIGINT)
                   AS rem_num
               FROM per, tot),
      slack AS (SELECT 100000 - CAST(sum(base_quota) AS BIGINT) AS r FROM base),
      rk AS (SELECT source, w, base_quota, rem_num,
               CAST(row_number() OVER (ORDER BY rem_num DESC, source ASC)
                 AS BIGINT) AS rn
             FROM base)
      SELECT source, w, base_quota,
        CAST(CASE WHEN rn <= r THEN 1 ELSE 0 END AS BIGINT) AS extra,
        base_quota + CAST(CASE WHEN rn <= r THEN 1 ELSE 0 END AS BIGINT) AS quota
      FROM rk, slack ORDER BY source"""))

  /** Mutual best match on the weighted trade graph: each nation's
    * strongest partner (max summed pair weight, ties to the smaller
    * id); emit the pairs where the choice is RECIPROCAL — the stable
    * pairing primitive (dedup canonical-partner selection, buddy
    * matching). Per-node windows over the adjacency, one equi
    * self-join of the 1-row-per-node best frame. */
  val c07: QueryDef = QueryDef(
    "c07_mutual_best",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val und = Pipeline11.tradeEdges(s, d)
        .filter(col("src") =!= col("dst"))
        .selectExpr("least(src, dst) AS a", "greatest(src, dst) AS b", "w")
        .groupBy(col("a"), col("b")).agg(sum(col("w")).as("w"))
      val adj = und.selectExpr("a AS u", "b AS v", "w")
        .unionByName(und.selectExpr("b AS u", "a AS v", "w"))
      val best = adj.withColumn("rn", row_number().over(
          Window.partitionBy(col("u")).orderBy(col("w").desc, col("v").asc)))
        .filter(col("rn") === 1).select(col("u"), col("v"), col("w"))
      best.as("x").join(best.as("y"),
          col("x.v") === col("y.u") && col("y.v") === col("x.u") &&
            col("x.u") < col("x.v"))
        .selectExpr("cast(x.u as bigint) AS a", "cast(x.v as bigint) AS b",
          "x.w AS w")
        .orderBy(col("a"))
    },
    Some("""WITH e AS (SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
               CAST(count(*) AS BIGINT) AS w
             FROM lineitem l
               JOIN orders o ON l.l_orderkey = o.o_orderkey
               JOIN customer c ON o.o_custkey = c.c_custkey
               JOIN supplier s ON l.l_suppkey = s.s_suppkey
             GROUP BY 1, 2),
      und AS (SELECT least(src, dst) AS a, greatest(src, dst) AS b,
                CAST(sum(w) AS BIGINT) AS w
              FROM e WHERE src <> dst GROUP BY 1, 2),
      adj AS (SELECT a AS u, b AS v, w FROM und
              UNION ALL SELECT b, a, w FROM und),
      best AS (SELECT u, v, w FROM (
          SELECT u, v, w,
            row_number() OVER (PARTITION BY u ORDER BY w DESC, v ASC) AS rn
          FROM adj) WHERE rn = 1)
      SELECT x.u AS a, x.v AS b, x.w AS w
      FROM best x JOIN best y ON x.v = y.u AND y.v = x.u AND x.u < x.v
      ORDER BY a"""))

  /** Equi-width histogram: order totals in cents split into 10 equal
    * buckets between the corpus min and max (broadcast bounds),
    * with per-bucket count and the seen extremes. The bucket index is
    * pure integer arithmetic — no width_bucket() engine variance. */
  val q55: QueryDef = QueryDef(
    "q55_price_histogram",
    (s, d) => {
      val cents = Tables.orders(s, d)
        .selectExpr("cast(round(o_totalprice * 100) as long) AS c")
      val mm = cents.agg(min(col("c")).as("mn"), max(col("c")).as("mx"))
      cents.crossJoin(broadcast(mm))
        .selectExpr("least(9L, ((c - mn) * 10) div (mx - mn + 1)) AS bucket", "c")
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_orders"), min(col("c")).as("lo_seen"),
          max(col("c")).as("hi_seen"))
        .orderBy(col("bucket"))
    },
    Some("""WITH c AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c
             FROM orders),
      mm AS (SELECT min(c) AS mn, max(c) AS mx FROM c)
      SELECT least(9, ((c.c - mm.mn) * 10) // (mm.mx - mm.mn + 1)) AS bucket,
        CAST(count(*) AS BIGINT) AS n_orders,
        CAST(min(c.c) AS BIGINT) AS lo_seen,
        CAST(max(c.c) AS BIGINT) AS hi_seen
      FROM c, mm GROUP BY 1 ORDER BY 1"""))
}
