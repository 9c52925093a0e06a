package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Packing, TextOps}

/** Round-4 LLM-pipeline additions: the corpus-curation steps that sit
  * between dedup/quality-gating and tokenization in a training-data
  * pipeline — deterministic stratified sampling, domain-mix weight
  * computation, token-budget sequence packing, exact heavy-hitter
  * vocabulary, and shard-shuffle assignment. Everything is
  * exact-integer (hash-based, no RNG) so the DuckDB oracles are
  * cell-exact; every plan is a map-only pass or a single bounded
  * shuffle — the shapes that survive 100 TB.
  */
object Pipeline2 {

  def all: Seq[QueryDef] = Seq(p01, p02, p03, p04, p05)

  /** Deterministic stratified sampling: per-language keep rates out of
    * 1000 hash buckets (downsample dominant en, keep the tail), the
    * standard rejection-free "hash mod" sampler — rerunnable,
    * cluster-size-independent, and joinable (the same doc always lands
    * in the same bucket). 100 TB shape: pure map-only filter, no
    * shuffle, no RNG state. */
  val p01: QueryDef = QueryDef(
    "p01_stratified_sample",
    (s, d) => Tables.documents(s, d)
      .selectExpr("doc_id", "lang",
        s"${TextOps.strHash60("cast(doc_id as string)")} % 1000 AS bucket")
      .filter(col("bucket") <
        expr("CASE lang WHEN 'en' THEN 400 WHEN 'zh' THEN 600 ELSE 800 END"))
      .select(col("doc_id"), col("lang"), col("bucket"))
      .orderBy(col("doc_id")),
    Some(s"""WITH h AS (SELECT doc_id, lang,
          ${DuckOps.strHash60("CAST(doc_id AS VARCHAR)")} % 1000 AS bucket
        FROM documents)
      SELECT doc_id, lang, bucket FROM h
      WHERE bucket < CASE lang WHEN 'en' THEN 400 WHEN 'zh' THEN 600 ELSE 800 END
      ORDER BY doc_id"""))

  /** Domain-mix rebalancing weights: per-language token counts, each
    * language's share of the corpus, and the up/down-sampling weight
    * that would equalize the mix (target = uniform across observed
    * languages) — the table a weighted sampler consumes. Exact-integer
    * micro-unit ratios. 100 TB shape: map-side-combined groupBy to a
    * handful of rows, then a broadcast cross join with the 1-row
    * totals — the corpus is touched once. */
  val p02: QueryDef = QueryDef(
    "p02_mix_weights",
    (s, d) => {
      val per = Tables.documents(s, d)
        .selectExpr("lang", s"cast(size(${TextOps.tokens("text")}) as bigint) AS n")
        .groupBy(col("lang")).agg(sum(col("n")).as("lang_tokens"))
      val tot = per.agg(sum(col("lang_tokens")).as("total_tokens"),
        count(lit(1)).as("n_langs"))
      per.crossJoin(broadcast(tot))
        .selectExpr("lang", "lang_tokens",
          "(lang_tokens * 1000000) div total_tokens AS share_micro",
          "(total_tokens * 1000000) div (n_langs * lang_tokens) AS weight_micro")
        .orderBy(col("lang"))
    },
    Some(s"""WITH q AS (SELECT lang,
          CAST(len(${DuckOps.tokens("text")}) AS BIGINT) AS n FROM documents),
      per AS (SELECT lang, CAST(sum(n) AS BIGINT) AS lang_tokens FROM q GROUP BY lang),
      tot AS (SELECT CAST(sum(lang_tokens) AS BIGINT) AS total_tokens,
                count(*) AS n_langs FROM per)
      SELECT lang, lang_tokens,
        (lang_tokens * 1000000) // total_tokens AS share_micro,
        (total_tokens * 1000000) // (n_langs * lang_tokens) AS weight_micro
      FROM per, tot ORDER BY lang"""))

  /** Token-budget sequence packing (budget 200): greedy in-order
    * bin-packing of documents into training sequences, independently
    * per language ([[graft.operators.Packing.packGreedy]] — one
    * shuffle + spillable sort + O(1)-state pass). The oracle replays
    * the same greedy recurrence as a recursive CTE, so bin boundaries
    * (including the exact-fit case, which the sf0.01 corpus hits) are
    * cell-exact. */
  val p03: QueryDef = QueryDef(
    "p03_pack_sequences",
    (s, d) => {
      val sized = Tables.documents(s, d)
        .selectExpr("lang", "doc_id",
          s"cast(size(${TextOps.tokens("text")}) as bigint) AS n_tokens")
      Packing.packGreedy(sized, "lang", "doc_id", "n_tokens", budget = 200L)
        .orderBy(col("doc_id"))
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
        FROM packed p JOIN ordered o ON o.lang = p.lang AND o.rn = p.rn + 1)
      SELECT lang, doc_id, n_tokens, bin_id, fill_after
      FROM packed ORDER BY doc_id"""))

  /** Exact heavy-hitter vocabulary: corpus-level top-20 tokens with
    * deterministic tie-break. 100 TB shape: explode + map-side partial
    * count, then `TakeOrderedAndProject` (orderBy.limit) — the final
    * ranking window touches only the 20 survivors, never the full
    * vocabulary. */
  val p04: QueryDef = QueryDef(
    "p04_heavy_hitters",
    (s, d) => {
      val top = Tables.documents(s, d)
        .selectExpr(s"explode(${TextOps.tokens("text")}) AS token")
        .groupBy(col("token")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token")).limit(20)
      top.withColumn("rk",
          row_number().over(Window.orderBy(col("n").desc, col("token"))).cast("long"))
        .select(col("rk"), col("token"), col("n"))
        .orderBy(col("rk"))
    },
    Some(s"""WITH t AS (SELECT unnest(${DuckOps.tokens("text")}) AS token FROM documents),
      c AS (SELECT token, count(*) AS n FROM t GROUP BY token)
      SELECT CAST(row_number() OVER (ORDER BY n DESC, token) AS BIGINT) AS rk, token, n
      FROM c QUALIFY rk <= 20 ORDER BY rk"""))

  /** Deterministic shard-shuffle assignment: the "global shuffle"
    * before training-data write-out — each doc's 60-bit hash key gives
    * its shard (32 shards) and its position within the shard
    * (hash-ordered, so the within-shard order is pseudorandom but
    * reproducible). 100 TB shape: map-only key derivation + a window
    * partitioned 32 ways (each shard sorts independently — the same
    * plan that writes shuffled training shards via
    * partitionBy(shard)). */
  val p05: QueryDef = QueryDef(
    "p05_shard_shuffle",
    (s, d) => Tables.documents(s, d)
      .selectExpr("doc_id",
        s"${TextOps.strHash60("cast(doc_id as string)")} AS skey")
      .withColumn("shard", col("skey") % 32)
      .withColumn("pos",
        row_number().over(
          Window.partitionBy(col("shard")).orderBy(col("skey"), col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy(col("doc_id")),
    Some(s"""WITH h AS (SELECT doc_id,
          ${DuckOps.strHash60("CAST(doc_id AS VARCHAR)")} AS skey FROM documents),
      sh AS (SELECT doc_id, skey, skey % 32 AS shard FROM h)
      SELECT doc_id, shard,
        CAST(row_number() OVER (PARTITION BY shard ORDER BY skey, doc_id) AS BIGINT) AS pos
      FROM sh ORDER BY doc_id"""))
}
