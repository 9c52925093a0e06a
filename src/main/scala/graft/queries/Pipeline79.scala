package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.TextOps

/** Round-11 additions, part 44: sentence-length quantiles through the
  * bucketed rank-lookup machinery, and the prefix-dup group-size
  * histogram completing the prefix-fingerprint family's detect face.
  */
object Pipeline79 {

  def all: Seq[QueryDef] = Seq(t46, d27)

  /** Exact sentence-length quantiles: sentences split on `[.!?]+`,
    * token-counted with the corpus tokenizer, and the p25/p50/p90
    * lengths read off as type-1 discrete quantiles (value at rank
    * `⌈p·n⌉` — tie-exact, no interpolation) via the q85 rank-lookup:
    * a collapsed distinct-length frame, one bucketed cumsum, and a
    * 3-row broadcast non-equi join. The chunking statistic a
    * context-window packer reads before picking boundaries.
    *
    * 100 TB shape: one explode+tokenize pass into a length-keyed
    * partial agg (the length domain is tiny), then broadcast-only
    * lookups. */
  val t46: QueryDef = QueryDef(
    "t46_sentence_quantiles",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val lens = Tables.documents(s, d)
        .selectExpr("explode(split(text, '[.!?]+')) AS sent")
        .selectExpr(s"cast(size(${TextOps.tokens("sent")}) as bigint) AS len")
        .filter(col("len") > 0)
      val g = lens.groupBy(col("len")).agg(count(lit(1)).as("cnt"))
      val gb = g.crossJoin(broadcast(g.agg(max(col("len")).as("mx"))))
        .withColumn("b", expr("len div greatest(1L, (mx div 256) + 1L)"))
      val offs = gb.groupBy(col("b")).agg(sum(col("cnt")).as("bcnt"))
        .withColumn("off", coalesce(sum(col("bcnt")).over(
          Window.orderBy(col("b")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      val win = Window.partitionBy(col("b")).orderBy(col("len"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val cum = gb.join(broadcast(offs.select(col("b"), col("off"))), Seq("b"))
        .withColumn("before",
          col("off") + coalesce(sum(col("cnt")).over(win), lit(0L)))
      val tot = lens.agg(count(lit(1)).as("n"))
      val ps = s.range(0, 3).selectExpr(
        "element_at(array(25L, 50L, 90L), cast(id as int) + 1) AS p")
      broadcast(ps.crossJoin(broadcast(tot))
          .selectExpr("p", "n", "(p * n + 99) div 100 AS rk"))
        .join(cum, col("before") < col("rk") &&
          col("before") + col("cnt") >= col("rk"))
        .selectExpr("p", "n AS n_sentences", "rk AS at_rank",
          "len AS len_tokens")
        .orderBy(col("p"))
    },
    Some("""WITH sent AS (SELECT unnest(regexp_split_to_array(text, '[.!?]+'))
               AS s FROM documents),
      lens AS (SELECT CAST(len(list_filter(
                 regexp_split_to_array(lower(s), '[^a-z0-9]+'), x -> x <> ''))
                 AS BIGINT) AS len
               FROM sent),
      lf AS (SELECT len FROM lens WHERE len > 0),
      g AS (SELECT len, CAST(count(*) AS BIGINT) AS cnt FROM lf GROUP BY 1),
      cum AS (SELECT len, cnt,
          COALESCE(CAST(sum(cnt) OVER (ORDER BY len
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
            AS before
        FROM g),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lf),
      pk AS (SELECT p, n, (p * n + 99) // 100 AS rk
             FROM (SELECT unnest([25, 50, 90]::BIGINT[]) AS p), tot)
      SELECT p, n AS n_sentences, rk AS at_rank, len AS len_tokens
      FROM pk JOIN cum ON before < rk AND before + cnt >= rk
      ORDER BY p"""))

  /** Prefix-dup group-size histogram: how the 40-token-prefix
    * fingerprint groups (c17/p45's universe) distribute by size —
    * groups, docs, and the doc-mass share per group size, the
    * one-glance shape that says whether prefix dup is a few big
    * boilerplate families or a long tail of pairs.
    *
    * 100 TB shape: one tokenize+hash pass, one fingerprint partial
    * agg to ≤1 row per group, one size-keyed fold over the tiny size
    * domain, one 1-row broadcast total. */
  val d27: QueryDef = QueryDef(
    "d27_prefix_group_sizes",
    (s, d) => {
      val fp = Tables.documents(s, d)
        .selectExpr("doc_id", s"${TextOps.tokens("text")} AS t")
        .selectExpr("doc_id",
          s"${TextOps.strHash60("concat_ws(' ', slice(t, 1, 40))")} AS fp")
      val per = fp.groupBy(col("fp")).agg(count(lit(1)).as("sz"))
        .groupBy(col("sz")).agg(count(lit(1)).as("n_groups"))
        .selectExpr("sz AS group_size", "n_groups",
          "group_size * n_groups AS n_docs")
      val tot = per.agg(sum(col("n_docs")).as("total"))
      per.crossJoin(broadcast(tot))
        .selectExpr("group_size", "n_groups", "n_docs",
          "cast((cast(n_docs as decimal(38,0)) * 1000000) div total as bigint)" +
            " AS doc_share_micro")
        .orderBy(col("group_size"))
    },
    Some(s"""WITH tk AS (SELECT doc_id, ${DuckOps.tokens("text")} AS t
               FROM documents),
      fp AS (SELECT doc_id,
               ${DuckOps.strHash60("array_to_string(t[1:40], ' ')")} AS fp
             FROM tk),
      per AS (SELECT fp, CAST(count(*) AS BIGINT) AS sz FROM fp GROUP BY 1),
      h AS (SELECT sz AS group_size, CAST(count(*) AS BIGINT) AS n_groups,
              CAST(sz * count(*) AS BIGINT) AS n_docs
            FROM per GROUP BY 1),
      tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total FROM h)
      SELECT group_size, n_groups, n_docs,
        CAST((CAST(n_docs AS HUGEINT) * 1000000) // total AS BIGINT)
          AS doc_share_micro
      FROM h, tot ORDER BY group_size"""))
}
