package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Dedup, Packing, TextOps}

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

  def all: Seq[QueryDef] = Seq(p01, p02, p03, p04, p05, p06, p07, p08, t08, m03)

  /** Exact repeated-passage removal ([[graft.operators.Dedup
    * .scrubRepeatedPassages]] — the exact-substring-dedup curation
    * step): every 8-token window occurring more than once in the
    * corpus is scrubbed from all but its first (doc_id, pos)
    * occurrence, and each doc's text is rebuilt from surviving
    * tokens. The oracle replays occurrence ranking with the same
    * window function and the same coverage test, so the rebuilt
    * text itself is cell-exact — including overlapping-window
    * unions and the within-doc-repeat case. */
  val p08: QueryDef = QueryDef(
    "p08_passage_scrub",
    (s, d) => Dedup.scrubRepeatedPassages(Tables.documents(s, d), "text", 8)
      .orderBy(col("doc_id")),
    Some(s"""WITH tk AS (SELECT doc_id, ${DuckOps.tokens("text")} AS t FROM documents),
      hx AS (SELECT doc_id, list_transform(${DuckOps.shingles("t", 8)},
               s -> ${DuckOps.strHash60("s")}) AS hs FROM tk),
      e AS (SELECT doc_id, unnest(list_transform(range(1, len(hs) + 1),
              i -> {'pos': i, 'sgl': hs[i]}), recursive := true) FROM hx),
      r AS (SELECT doc_id, pos,
              row_number() OVER (PARTITION BY sgl ORDER BY doc_id, pos) AS rn FROM e),
      cov AS (SELECT doc_id, list_sort(list(pos)) AS cov FROM r
              WHERE rn >= 2 GROUP BY doc_id),
      j AS (SELECT tk.doc_id, t, coalesce(cov, []::BIGINT[]) AS cov
            FROM tk LEFT JOIN cov USING (doc_id)),
      k AS (SELECT doc_id, t, list_filter(range(1, len(t) + 1),
              p -> len(list_filter(cov, i -> i <= p AND i > p - 8)) = 0) AS kept
            FROM j)
      SELECT doc_id, CAST(len(t) AS BIGINT) AS n_before,
        CAST(len(kept) AS BIGINT) AS n_after,
        coalesce(array_to_string(list_transform(kept, p -> t[p]), ' '), '') AS text_scrubbed
      FROM k ORDER BY doc_id"""))

  /** Per-doc lexical diversity (type/token ratio, hapax ratio) — the
    * vocabulary-richness quality signal t01/t07 don't cover
    * ([[graft.operators.TextOps.lexicalDiversity]]: zero-shuffle
    * run-boundary counting, empty-doc-guarded — see the operator
    * scaladoc; TextOpsSpec pins the empty/hapax boundary cases). */
  val t08: QueryDef = QueryDef(
    "t08_lexical_diversity",
    (s, d) => TextOps.lexicalDiversity(Tables.documents(s, d), "text")
      .orderBy(col("doc_id")),
    Some(s"""WITH q AS (SELECT doc_id,
          list_sort(${DuckOps.tokens("text")}) AS ts FROM documents),
      m AS (SELECT doc_id,
          CAST(len(ts) AS BIGINT) AS n_tokens,
          CAST(len(list_filter(range(1, len(ts) + 1), j ->
            CASE WHEN j = 1 THEN true ELSE ts[j] <> ts[j - 1] END)) AS BIGINT) AS n_types,
          CAST(len(list_filter(range(1, len(ts) + 1), j ->
            (CASE WHEN j = 1 THEN true ELSE ts[j] <> ts[j - 1] END) AND
            (CASE WHEN j = len(ts) THEN true ELSE ts[j + 1] <> ts[j] END))) AS BIGINT) AS n_hapax
        FROM q)
      SELECT doc_id, n_tokens, n_types, n_hapax,
        CASE WHEN n_tokens = 0 THEN 0 ELSE (n_types * 1000000) // n_tokens END AS ttr_micro,
        CASE WHEN n_types = 0 THEN 0 ELSE (n_hapax * 1000000) // n_types END AS hapax_ratio_micro
      FROM m ORDER BY doc_id"""))

  /** The typed multimodal batch-decode path under the oracle gate:
    * [[graft.operators.Multimodal.extractFeatures]] (partition-parallel
    * `mapPartitions` over 64-record batches — the arrow-batch UDF
    * shape) runs the REAL parsers in
    * [[graft.operators.MediaCodec]] over real encoded payloads —
    * PPM header + RGB raster, WAV RIFF header + PCM16 samples, Y4M
    * stream + planar frames — and the oracle replays the PARSED
    * dimensions, sample counts and exact channel sums from the
    * fixture arithmetic. The float embedding is exact across engines
    * because every value is k/128 (dyadic); it travels as the
    * comma-joined integer quantization `x * 128` because the compare
    * harness cannot sort rows on a raw ARRAY column (round-4 m03
    * err). The float array itself stays spec-covered in
    * MultimodalSpec, which also pins encode-decode round trips on
    * hand-built payloads. */
  val m03: QueryDef = QueryDef(
    "m03_media_decode",
    (s, d) => {
      val media = graft.operators.Multimodal.mediaFromDocuments(Tables.documents(s, d))
      mediaFeaturesResult(
        graft.operators.Multimodal.extractFeatures(media, batchSize = 64))
    },
    Some(mediaFeaturesSql(docFilter = "TRUE")))

  /** The m03/m05 result shape over decoded features: parsed header
    * fields widened to BIGINT plus the comma-joined integer embedding
    * quantization (the compare harness cannot sort on a raw ARRAY —
    * round-4 m03 err). */
  private[queries] def mediaFeaturesResult(
      feats: org.apache.spark.sql.Dataset[graft.operators.Multimodal.MediaFeatures])
      : org.apache.spark.sql.DataFrame =
    feats.toDF()
      .selectExpr("media_id", "kind", "n_bytes",
        "cast(width as bigint) AS width", "cast(height as bigint) AS height",
        "cast(channels as bigint) AS channels", "cast(n_frames as bigint) AS n_frames",
        "cast(sample_rate as bigint) AS sample_rate", "content_sum",
        "array_join(transform(embedding, x -> cast(cast(x * 128 as int) as string)), ',') AS emb_q")
      .orderBy(col("media_id"))

  /** The decoded-features oracle (fixture arithmetic replayed in
    * DuckDB), restricted to documents matching `docFilter` — m03 runs
    * it unfiltered; m05 excludes the ids its corruption rule hits. */
  private[queries] def mediaFeaturesSql(docFilter: String): String =
    s"""WITH m AS (SELECT doc_id AS media_id, doc_id % 3 AS k FROM documents
        WHERE $docFilter),
      img AS (SELECT media_id, 'image' AS kind,
          4 + media_id % 29 AS w, 4 + media_id % 23 AS h FROM m WHERE k = 0),
      img2 AS (SELECT media_id, kind,
          CAST(length('P6' || chr(10) || w || ' ' || h || chr(10) || '255'
            || chr(10)) + 3 * w * h AS BIGINT) AS n_bytes,
          CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
          CAST(3 AS BIGINT) AS channels, CAST(1 AS BIGINT) AS n_frames,
          CAST(0 AS BIGINT) AS sample_rate,
          CAST(list_sum(list_transform(range(0, 3 * w * h),
            i -> (media_id * 31 + i * 7) % 256)) AS BIGINT) AS content_sum
        FROM img),
      aud AS (SELECT media_id, 'audio' AS kind,
          16 + media_id % 240 AS n FROM m WHERE k = 1),
      aud2 AS (SELECT media_id, kind,
          CAST(44 + 2 * n AS BIGINT) AS n_bytes,
          CAST(0 AS BIGINT) AS width, CAST(0 AS BIGINT) AS height,
          CAST(1 AS BIGINT) AS channels, CAST(1 AS BIGINT) AS n_frames,
          CAST(8000 AS BIGINT) AS sample_rate,
          CAST(list_sum(list_transform(range(0, n),
            i -> (media_id * 131 + i * 17) % 65536)) AS BIGINT) AS content_sum
        FROM aud),
      vid AS (SELECT media_id, 'video' AS kind,
          2 * (2 + media_id % 14) AS w, 2 * (2 + media_id % 10) AS h,
          1 + media_id % 27 AS nf FROM m WHERE k = 2),
      vid2 AS (SELECT media_id, kind,
          CAST(length('YUV4MPEG2 W' || w || ' H' || h
            || ' F25:1 Ip A1:1 C420jpeg' || chr(10))
            + nf * (6 + (3 * w * h) // 2) AS BIGINT) AS n_bytes,
          CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
          CAST(3 AS BIGINT) AS channels, CAST(nf AS BIGINT) AS n_frames,
          CAST(0 AS BIGINT) AS sample_rate,
          CAST(list_sum(list_transform(range(0, w * h),
            j -> (media_id * 17 + j * 5) % 256)) AS BIGINT) AS content_sum
        FROM vid),
      u AS (SELECT * FROM img2 UNION ALL SELECT * FROM aud2 UNION ALL SELECT * FROM vid2)
      SELECT media_id, kind, n_bytes, width, height, channels, n_frames, sample_rate,
        content_sum,
        array_to_string(list_transform(range(0, 8),
          i -> (content_sum + i) % 256 - 128), ',') AS emb_q
      FROM u ORDER BY media_id"""

  /** shared DuckDB CTE chain: per-doc distinct 8-gram shingle-hash
    * sets with source attribution (twin of
    * [[graft.operators.Dedup.shingleHashSets]] at n=8). */
  private def shingle8Ctes: String =
    s"""WITH tk AS (SELECT doc_id, source, ${DuckOps.tokens("text")} AS t FROM documents),
      sh AS (SELECT doc_id, source, ${DuckOps.shingles("t", 8)} AS s FROM tk),
      hs AS (SELECT doc_id, source, list_distinct(
               list_transform(s, x -> ${DuckOps.strHash60("x")})) AS h FROM sh),
      e AS (SELECT doc_id, source, unnest(h) AS sgl FROM hs)"""

  /** Cross-source contamination matrix: for every source pair, the
    * number of distinct 8-token passages appearing in both — the
    * provenance-overlap signal behind "which crawls duplicate each
    * other". 100 TB shape: the d02 treatment — hot passages (doc
    * frequency > 64) are a tiny broadcast set pruned map-side, then
    * the (source, passage) pairs are distinct-projected (far smaller
    * than the corpus) and equi-joined on the passage hash; output is
    * |sources|^2-bounded. */
  val p06: QueryDef = QueryDef(
    "p06_src_overlap",
    (s, d) => {
      val e = Tables.documents(s, d)
        .selectExpr("doc_id", "source", "graft_shingle_hashes(text, 8) AS hs")
        .selectExpr("doc_id", "source", "explode(hs) AS sgl")
      // ONE aggregation pass (the d02 treatment,
      // [[graft.functions.CollectSetCapped]]): a shingle whose doc
      // frequency exceeds 64 collapses to null — the hot prune — and
      // live groups collect their <= 64-entry distinct source set
      // sorted, so the pair fanout stays <= 2016 and executor memory
      // is bounded by the cap. Replaces the earlier df-count +
      // broadcast-hot-set anti-join + collect_set three-pass shape
      // (and the cache those passes shared).
      e.groupBy(col("sgl"))
        .agg(expr("graft_collect_set_capped(source, 64)").as("ss"))
        .filter(col("ss").isNotNull && size(col("ss")) >= 2)
        .selectExpr("explode(flatten(transform(sequence(1, size(ss) - 1), " +
          "i -> transform(sequence(i + 1, size(ss)), " +
          "j -> struct(element_at(ss, i) AS src1, element_at(ss, j) AS src2))))) AS pr")
        .select(col("pr.src1").as("src1"), col("pr.src2").as("src2"))
        .groupBy(col("src1"), col("src2"))
        .agg(count(lit(1)).as("n_shared"))
        .orderBy(col("src1"), col("src2"))
    },
    Some(s"""$shingle8Ctes,
      df AS (SELECT sgl, count(*) AS df FROM e GROUP BY sgl),
      kept AS (SELECT e.source, e.sgl FROM e JOIN df USING (sgl) WHERE df <= 64),
      sp AS (SELECT DISTINCT source, sgl FROM kept)
      SELECT a.source AS src1, b.source AS src2, count(*) AS n_shared
      FROM sp a JOIN sp b ON a.sgl = b.sgl AND a.source < b.source
      GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Repeated-passage inventory (the exact-substring-dedup signal):
    * distinct 8-token passages occurring in >= 2 documents, top 30 by
    * document frequency. 100 TB shape: map-side-combined count over
    * exploded per-doc-distinct hashes, then TakeOrderedAndProject —
    * the full passage table is never sorted. */
  val p07: QueryDef = QueryDef(
    "p07_rep_passages",
    (s, d) => Dedup.shingleHashSets(Tables.documents(s, d), "text", 8)
      .selectExpr("doc_id", "explode(hs) AS sgl")
      .groupBy(col("sgl"))
      .agg(count(lit(1)).as("df"), min(col("doc_id")).as("first_doc"))
      .filter(col("df") >= 2)
      .orderBy(col("df").desc, col("sgl")).limit(30),
    Some(s"""$shingle8Ctes,
      df AS (SELECT sgl, count(*) AS df, CAST(min(doc_id) AS BIGINT) AS first_doc
             FROM e GROUP BY sgl)
      SELECT sgl, df, first_doc FROM df WHERE df >= 2
      ORDER BY df DESC, sgl LIMIT 30"""))

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
      // floor(x * 1e6 / y) via long-division decomposition
      // (q*1e6 + d1*1e3 + d2, carrying the remainder in two *1000
      // steps): naive x*1000000 overflows BIGINT once a corpus passes
      // ~9e12 tokens (a 100 TB corpus is ~2.5e13); this form is exact
      // in pure BIGINT up to ~9e15 tokens, and floor-division semantics
      // match across engines (DECIMAL division would round in DuckDB)
      def microDiv(x: String, y: String): String =
        s"($x div $y) * 1000000 + (($x % $y) * 1000 div $y) * 1000 + " +
          s"((($x % $y) * 1000 % $y) * 1000 div $y)"
      per.crossJoin(broadcast(tot))
        .selectExpr("lang", "lang_tokens", "total_tokens", "n_langs * lang_tokens AS d")
        .selectExpr("lang", "lang_tokens",
          s"${microDiv("lang_tokens", "total_tokens")} AS share_micro",
          s"${microDiv("total_tokens", "d")} AS weight_micro")
        .orderBy(col("lang"))
    },
    Some(s"""WITH q AS (SELECT lang,
          CAST(len(${DuckOps.tokens("text")}) AS BIGINT) AS n FROM documents),
      per AS (SELECT lang, CAST(sum(n) AS BIGINT) AS lang_tokens FROM q GROUP BY lang),
      tot AS (SELECT CAST(sum(lang_tokens) AS BIGINT) AS total_tokens,
                count(*) AS n_langs FROM per),
      j AS (SELECT lang, lang_tokens, total_tokens, n_langs * lang_tokens AS d
            FROM per, tot)
      SELECT lang, lang_tokens,
        (lang_tokens // total_tokens) * 1000000
          + ((lang_tokens % total_tokens) * 1000 // total_tokens) * 1000
          + (((lang_tokens % total_tokens) * 1000 % total_tokens) * 1000 // total_tokens)
          AS share_micro,
        (total_tokens // d) * 1000000
          + ((total_tokens % d) * 1000 // d) * 1000
          + (((total_tokens % d) * 1000 % d) * 1000 // d)
          AS weight_micro
      FROM j ORDER BY lang"""))

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
