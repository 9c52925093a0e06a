package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Dedup, Similarity, TextOps}

/** LLM-training-data pipeline operators (SURVEY §7 M5 / builder brief):
  * dedup (exact, n-gram Jaccard, MinHash-LSH, SimHash), similarity
  * search (brute-force + hyperplane-LSH), text analysis (quality,
  * language-ID, token counts, fingerprints), multimodal plumbing.
  * Every query is deterministic; oracles replicate the algorithms in
  * DuckDB SQL via the exact-integer hash twins in [[DuckOps]].
  */
object Pipeline {

  def all: Seq[QueryDef] = Seq(d01, d02, d03, d04, d05, s01, s02, s03, s04, s05,
    t01, t02, t03, t04, t05, t06, t07, m01, m02, st01, st02)

  /** Repetition analysis (the Gopher/MassiveText duplicate-n-gram
    * quality rules): per-document duplicate-token and duplicate-3-gram
    * counts plus the most-common-token count — the signals behind
    * "fraction of duplicate n-grams" filters. Exact integers, pure
    * per-row projection (no shuffle beyond the final order-by): at
    * 100 TB this is a map-only pass. */
  val t07: QueryDef = QueryDef(
    "t07_repetition",
    (s, d) => Tables.documents(s, d)
      .selectExpr("doc_id", s"${TextOps.tokens("text")} AS t")
      .selectExpr("doc_id", s"${TextOps.shingles("t", 3)} AS s3", "t")
      .selectExpr("doc_id",
        "cast(size(t) as bigint) AS n_tokens",
        "cast(size(t) - size(array_distinct(t)) as bigint) AS dup_tokens",
        "cast(size(s3) as bigint) AS n_3grams",
        "cast(size(s3) - size(array_distinct(s3)) as bigint) AS dup_3grams",
        "cast(array_max(transform(array_distinct(t), w -> size(filter(t, x -> x = w)))) as bigint) AS top_token_n")
      .orderBy(col("doc_id")),
    Some(s"""WITH q AS (SELECT doc_id, ${DuckOps.tokens("text")} AS t FROM documents),
      w AS (SELECT doc_id, t, ${DuckOps.shingles("t", 3)} AS s3 FROM q)
      SELECT doc_id,
        CAST(len(t) AS BIGINT) AS n_tokens,
        CAST(len(t) - len(list_distinct(t)) AS BIGINT) AS dup_tokens,
        CAST(len(s3) AS BIGINT) AS n_3grams,
        CAST(len(s3) - len(list_distinct(s3)) AS BIGINT) AS dup_3grams,
        CAST(list_max(list_transform(list_distinct(t), w -> len(list_filter(t, x -> x = w)))) AS BIGINT) AS top_token_n
      FROM w ORDER BY doc_id"""))

  /** Benchmark decontamination: for each "benchmark" document
    * (doc_id < 50 stands in for an eval set), count corpus documents
    * sharing >= 1 distinct 5-gram — the standard n-gram-overlap
    * contamination check. 100 TB shape: the benchmark shingle set is
    * tiny and BROADCAST, so the corpus side is a map-side hash join
    * over its exploded 60-bit shingle hashes — the full corpus is
    * never shuffled; only the (bench, doc) hit pairs are. */
  val t05: QueryDef = QueryDef(
    "t05_contamination",
    (s, d) => {
      val docs = Tables.documents(s, d)
      // explode_outer: plain explode makes the optimizer infer a
      // size(hs)>0 pre-filter that DUPLICATES the whole tokenize+hash
      // expression below the Generate (2x compute); the inner join
      // drops the extra null-sgl rows anyway
      val sh = Dedup.shingleHashSets(docs, "text", 5)
        .selectExpr("doc_id", "explode_outer(hs) AS sgl")
      val bench = sh.filter(col("doc_id") < 50)
        .withColumnRenamed("doc_id", "bench_id")
      sh.join(broadcast(bench),
          sh("sgl") === bench("sgl") && col("doc_id") =!= col("bench_id"))
        .select(col("bench_id"), col("doc_id")).distinct()
        .groupBy(col("bench_id"))
        .agg(count(lit(1)).as("n_contaminated"))
        .orderBy(col("bench_id"))
    },
    Some(s"""WITH toks AS (SELECT doc_id, ${DuckOps.tokens("text")} AS t FROM documents),
      sh AS (SELECT doc_id, ${DuckOps.shingles("t", 5)} AS s FROM toks),
      e AS (SELECT doc_id, unnest(list_distinct(
              list_transform(s, x -> ${DuckOps.strHash60("x")}))) AS sgl FROM sh),
      hits AS (SELECT DISTINCT b.doc_id AS bench_id, c.doc_id
               FROM e b JOIN e c ON b.sgl = c.sgl AND c.doc_id <> b.doc_id
               WHERE b.doc_id < 50)
      SELECT bench_id, count(*) AS n_contaminated
      FROM hits GROUP BY bench_id ORDER BY bench_id"""))

  /** End-to-end quality gate — the composed filter a training-data
    * pipeline runs before tokenization: English-identified, length in
    * bounds, stopword/punctuation ratios sane, and not an exact
    * duplicate (only the fingerprint keeper survives). Demonstrates
    * operator composability; every predicate is exact-integer. */
  val t06: QueryDef = QueryDef(
    "t06_quality_gate",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val scored = docs
        .selectExpr("doc_id", "n_chars", s"${TextOps.tokens("text")} AS t", "text")
        .selectExpr("doc_id", "n_chars",
          "cast(size(t) as bigint) AS n_tokens",
          s"cast(${TextOps.stopHits("t", TextOps.StopEn)} as bigint) AS stop_en",
          s"${TextOps.strHash60("concat_ws(' ', t)")} AS fp")
      // keep-first as min-over-window: ONE shuffle on fp and ONE pass
      // over the tokenize+hash projection (the former groupBy+self-join
      // recomputed the whole scoring subtree on both sides of the join)
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))
      scored.withColumn("keeper", min(col("doc_id")).over(w))
        .filter(col("doc_id") === col("keeper") &&
          col("n_tokens") >= 5 && col("n_tokens") <= 2000 &&
          col("stop_en") * 1000000L >= col("n_tokens") * lit(20000L))
        .select(col("doc_id"), col("n_tokens"), col("stop_en"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH q AS (SELECT doc_id, n_chars, ${DuckOps.tokens("text")} AS t FROM documents),
      scored AS (SELECT doc_id,
          CAST(len(t) AS BIGINT) AS n_tokens,
          CAST(${DuckOps.stopHits("t", TextOps.StopEn)} AS BIGINT) AS stop_en,
          ${DuckOps.strHash60("array_to_string(t, ' ')")} AS fp
        FROM q),
      keepers AS (SELECT fp, min(doc_id) AS keeper FROM scored GROUP BY fp)
      SELECT s.doc_id, s.n_tokens, s.stop_en
      FROM scored s JOIN keepers k ON s.fp = k.fp AND s.doc_id = k.keeper
      WHERE s.n_tokens BETWEEN 5 AND 2000
        AND s.stop_en * 1000000 >= s.n_tokens * 20000
      ORDER BY s.doc_id"""))

  /** Multimodal frame-window extraction: fixed-size windows over the
    * payload (the audio/video frame-sampling plumbing — generator
    * shape, one output row per window; a real decoder swaps in behind
    * the same explode). 128-char windows; empty docs yield no frames. */
  val m02: QueryDef = QueryDef(
    "m02_frame_windows",
    (s, d) => Tables.documents(s, d)
      .selectExpr("doc_id", "text AS p")
      .selectExpr("doc_id",
        """explode(if(length(p) = 0, array(),
           transform(
             sequence(0, cast(ceil(length(p) / 128.0) as int) - 1),
             i -> struct(
               cast(i as bigint) AS frame_idx,
               md5(cast(substring(p, i * 128 + 1, 128) as binary)) AS frame_digest,
               cast(length(substring(p, i * 128 + 1, 128)) as bigint) AS frame_chars)))) AS fr""")
      .filter(col("fr").isNotNull)
      .select(col("doc_id"), col("fr.frame_idx").as("frame_idx"),
        col("fr.frame_digest").as("frame_digest"), col("fr.frame_chars").as("frame_chars"))
      .orderBy(col("doc_id"), col("frame_idx")),
    Some("""SELECT doc_id, i AS frame_idx,
        md5(substring(text, (i * 128 + 1)::BIGINT, 128)) AS frame_digest,
        CAST(length(substring(text, (i * 128 + 1)::BIGINT, 128)) AS BIGINT) AS frame_chars
      FROM documents, unnest(range(0, CAST(ceil(length(text) / 128.0) AS BIGINT))) AS t(i)
      ORDER BY doc_id, frame_idx"""))

  /** Native `session_window` sessionization (the engine-managed
    * streaming-state path, [[graft.streaming.EventStreams.sessionizeWindows]])
    * — same oracle as st01, proving the built-in operator reproduces
    * the custom sessionizer cell-exactly. */
  lazy val st02: QueryDef = QueryDef( // lazy: shares st01's oracle, declared below
    "st02_session_window",
    (s, d) => {
      graft.streaming.EventStreams.sessionizeWindows(Tables.events(s, d), gapMinutes = 30)
        .selectExpr("user_id",
          "unix_millis(session_start) AS start_ms",
          "unix_millis(session_end) AS end_ms",
          "n_events", "total_cents")
        .orderBy(col("user_id"), col("start_ms"))
    },
    st01.oracle)

  /** Gap-based sessionization (30-min idle gap) — the batch face of
    * the Structured Streaming sessionizer
    * ([[graft.streaming.EventStreams.sessionize]]); oracle is the
    * classic gaps-and-islands SQL. */
  val st01: QueryDef = QueryDef(
    "st01_sessionize",
    (s, d) => {
      import s.implicits._
      val events = Tables.events(s, d).as[graft.streaming.EventStreams.Event]
      graft.streaming.EventStreams.sessionizeBounded(events, gapMinutes = 30)
        .selectExpr("user_id",
          "unix_millis(session_start) AS start_ms",
          "unix_millis(session_end) AS end_ms",
          "n_events", "total_cents")
        .orderBy(col("user_id"), col("start_ms"))
    },
    Some("""WITH e AS (
        SELECT user_id, epoch_ms(ts) AS t, event_id,
          CAST(round(value * 100) AS BIGINT) AS cents
        FROM events),
      flagged AS (
        SELECT user_id, t, cents,
          CASE WHEN t - lag(t) OVER w > 1800000 OR lag(t) OVER w IS NULL
               THEN 1 ELSE 0 END AS new_session
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
      numbered AS (
        SELECT user_id, t, cents,
          sum(new_session) OVER (PARTITION BY user_id ORDER BY t
                                 ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged)
      SELECT user_id, min(t) AS start_ms, max(t) AS end_ms,
        count(*) AS n_events, CAST(sum(cents) AS BIGINT) AS total_cents
      FROM numbered GROUP BY user_id, session_id
      ORDER BY user_id, start_ms"""))

  // ---------------------------------------------------------------- dedup

  /** Exact dedup via 60-bit content fingerprint groups. */
  val d01: QueryDef = QueryDef(
    "d01_exact_dedup",
    (s, d) => Dedup.exactGroups(Tables.documents(s, d), "text")
      .orderBy(col("fp")),
    Some(s"""SELECT ${DuckOps.strHash60("text")} AS fp,
        min(doc_id) AS keeper, count(*) AS n_copies
      FROM documents GROUP BY fp ORDER BY fp"""))

  /** 3-gram Jaccard near-dup pairs (threshold 0.5) with the scale-safe
    * doc-frequency cap (64): shingles hotter than the cap are pruned
    * from candidate generation (full set sizes still count), bounding
    * the self-join fan-out at 64 per shingle — the oracle replicates
    * the cap exactly. */
  val d02: QueryDef = QueryDef(
    "d02_ngram_jaccard_pairs",
    (s, d) => Dedup.ngramJaccardPairs(Tables.documents(s, d), "text", 3, 0.5, maxDocFreq = 64)
      .orderBy(col("d1"), col("d2")),
    Some(s"""WITH toks AS (SELECT doc_id, ${DuckOps.tokens("text")} AS t FROM documents),
      sh AS (SELECT doc_id, ${DuckOps.shingles("t", 3)} AS s FROM toks),
      hsets AS (SELECT doc_id,
          list_distinct(list_transform(s, x -> ${DuckOps.strHash60("x")})) AS hs FROM sh),
      e AS (SELECT doc_id, unnest(hs) AS sgl FROM hsets),
      hot AS (SELECT sgl FROM e GROUP BY sgl HAVING count(*) > 64),
      kept AS (SELECT doc_id, sgl FROM e ANTI JOIN hot USING (sgl)),
      sz AS (SELECT doc_id, len(hs) AS n FROM hsets),
      pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS shared
                FROM kept a JOIN kept b ON a.sgl = b.sgl AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
      SELECT d1, d2, shared, CAST(s1.n AS BIGINT) AS n1, CAST(s2.n AS BIGINT) AS n2,
        CAST(shared AS DOUBLE) / CAST(s1.n + s2.n - shared AS DOUBLE) AS jaccard
      FROM pairs JOIN sz s1 ON d1 = s1.doc_id JOIN sz s2 ON d2 = s2.doc_id
      WHERE CAST(shared AS DOUBLE) / CAST(s1.n + s2.n - shared AS DOUBLE) >= 0.5
      ORDER BY d1, d2"""))

  /** shared DuckDB CTE chain computing MinHash(16)-LSH pair estimates
    * for an arbitrary (bands, rowsPerBand) split — parameterized so
    * the d11 planner-driven query generates its oracle from the SAME
    * (b, r) the Spark call computes. */
  private[queries] def minhashCtesFor(bands: Int, rows: Int): String =
    s"""WITH toks AS (SELECT doc_id, ${DuckOps.tokens("text")} AS t FROM documents),
      sh AS (SELECT doc_id, ${DuckOps.shingles("t", 3)} AS s FROM toks),
      hs AS (SELECT doc_id, list_distinct(
               list_transform(s, x -> ${DuckOps.strHash60("x")})) AS h FROM sh),
      sig AS (SELECT doc_id, ${DuckOps.minhashSig("h", 16)} AS sig FROM hs),
      bands AS (SELECT doc_id, b,
                  ${DuckOps.foldHash(s"sig[b * $rows + 1 : b * $rows + $rows]")} AS bucket
                FROM sig, unnest(range(0, $bands)) AS t(b)),
      cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
               FROM bands a JOIN bands b
               ON a.b = b.b AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
      est AS (SELECT d1, d2,
                CAST(len(list_filter(range(1, 17),
                  i -> s1.sig[i] = s2.sig[i])) AS BIGINT) AS matches
              FROM cand JOIN sig s1 ON d1 = s1.doc_id JOIN sig s2 ON d2 = s2.doc_id)"""

  /** the d03/d05 instance: MinHash(16)-LSH(4 bands × 4 rows). */
  private[queries] val minhashCtes: String = minhashCtesFor(4, 4)

  /** MinHash(16)-LSH(4 bands) near-dup pairs, est. Jaccard >= 0.5. */
  val d03: QueryDef = QueryDef(
    "d03_minhash_lsh_pairs",
    (s, d) => Dedup.minhashLshPairs(Tables.documents(s, d), "text", 3, 16, 4, 0.5)
      .orderBy(col("d1"), col("d2")),
    Some(s"""$minhashCtes
      SELECT d1, d2, matches, CAST(matches AS DOUBLE) / 16 AS est_jaccard
      FROM est WHERE CAST(matches AS DOUBLE) / 16 >= 0.5
      ORDER BY d1, d2"""))

  /** The dedup story's last step: FILTER the corpus by the near-dup
    * pairs — keep-first policy (the lower doc_id of every pair
    * survives; any doc appearing as the higher side is dropped).
    * Left-anti join against the distinct loser set — the same shape at
    * 100 TB, since losers are a small fraction of the corpus. */
  val d05: QueryDef = QueryDef(
    "d05_neardup_filter",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val losers = Dedup.minhashLshPairs(docs, "text", 3, 16, 4, 0.5)
        .select(col("d2").as("doc_id")).distinct()
      docs.join(losers, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("n_chars"))
        .orderBy(col("doc_id"))
    },
    Some(s"""$minhashCtes,
      losers AS (SELECT DISTINCT d2 AS doc_id FROM est
                 WHERE CAST(matches AS DOUBLE) / 16 >= 0.5)
      SELECT d.doc_id, d.n_chars FROM documents d
      ANTI JOIN losers USING (doc_id)
      ORDER BY d.doc_id"""))

  /** SimHash(60-bit) near-dup pairs, Hamming <= 3 (banded candidates
    * with guaranteed recall => brute-force oracle matches exactly). */
  val d04: QueryDef = QueryDef(
    "d04_simhash_pairs",
    (s, d) => Dedup.simhashPairs(Tables.documents(s, d), "text", 3)
      .orderBy(col("d1"), col("d2")),
    Some(s"""WITH toks AS (SELECT doc_id, ${DuckOps.tokens("text")} AS t FROM documents),
      hs AS (SELECT doc_id, list_transform(t, s -> ${DuckOps.strHash60("s")}) AS h FROM toks),
      sh AS (SELECT doc_id,
               CASE WHEN len(h) = 0 THEN 0::BIGINT ELSE ${DuckOps.simhash60("h")} END AS simhash
             FROM hs)
      SELECT a.doc_id AS d1, b.doc_id AS d2,
        CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
      ORDER BY d1, d2"""))

  // ----------------------------------------------------------- similarity

  /** Brute-force exact cosine top-5 for query vectors (vec_id < 10). */
  val s01: QueryDef = QueryDef(
    "s01_cosine_topk",
    (s, d) => Similarity.cosineTopK(Tables.embeddings(s, d), 10, 5)
      .orderBy(col("q_id"), col("rk")),
    Some(s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
                        FROM embeddings),
      n AS (SELECT vec_id, v, ${DuckOps.norm2("v")} AS nrm FROM e),
      p AS (SELECT q.vec_id AS q_id, c.vec_id AS n_id,
              ${DuckOps.dot("q.v", "c.v")} / (sqrt(q.nrm) * sqrt(c.nrm)) AS cos
            FROM n q JOIN n c ON q.vec_id < 10 AND c.vec_id <> q.vec_id)
      SELECT q_id, CAST(rk AS BIGINT) AS rk, n_id, cos FROM (
        SELECT q_id, n_id, cos,
          row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rk
        FROM p) WHERE rk <= 5
      ORDER BY q_id, rk"""))

  /** ANN: 16-bit hyperplane-LSH bucketed cosine top-3 (vec_id < 10). */
  val s02: QueryDef = QueryDef(
    "s02_lsh_ann_topk",
    (s, d) => Similarity.lshTopK(Tables.embeddings(s, d), 10, 3)
      .orderBy(col("q_id"), col("rk")),
    Some(s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
                        FROM embeddings),
      n AS (SELECT vec_id, v, ${DuckOps.norm2("v")} AS nrm,
              list_reduce(list_concat([0::BIGINT], list_transform(range(0, ${Similarity.NPlanes}), p ->
                CASE WHEN list_reduce(list_concat([0.0::DOUBLE],
                    list_transform(range(1, 65), d ->
                      v[d] * CAST(${Similarity.planeWeight} AS DOUBLE))),
                    (acc, x) -> acc + x) > 0
                THEN (1::BIGINT << p) ELSE 0::BIGINT END)), (a, x) -> a + x) AS bucket
            FROM e),
      p AS (SELECT q.vec_id AS q_id, c.vec_id AS n_id,
              ${DuckOps.dot("q.v", "c.v")} / (sqrt(q.nrm) * sqrt(c.nrm)) AS cos
            FROM n q JOIN n c
            ON q.vec_id < 10 AND q.bucket = c.bucket AND c.vec_id <> q.vec_id)
      SELECT q_id, CAST(rk AS BIGINT) AS rk, n_id, cos FROM (
        SELECT q_id, n_id, cos,
          row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rk
        FROM p) WHERE rk <= 3
      ORDER BY q_id, rk"""))

  /** IVF ANN: FIXED deterministic coarse centroids (the 16 lowest
    * vec_ids — O(16) driver state regardless of corpus size),
    * 2 probed lists, exact re-rank top-3 for queries vec_id < 10. */
  val s04: QueryDef = QueryDef(
    "s04_ivf_ann_topk",
    (s, d) => Similarity.ivfTopK(Tables.embeddings(s, d), 10, 3, 16, 2)
      .orderBy(col("q_id"), col("rk")),
    Some(s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
                        FROM embeddings),
      n AS (SELECT vec_id, v, ${DuckOps.norm2("v")} AS nrm FROM e),
      c AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n WHERE vec_id < 16),
      asg AS (SELECT vec_id, v, nrm, cid AS centroid FROM (
          SELECT a.vec_id, a.v, a.nrm, c.cid,
            row_number() OVER (PARTITION BY a.vec_id
              ORDER BY ${DuckOps.dot("a.v", "c.cv")} / (sqrt(a.nrm) * sqrt(c.cn)) DESC,
                       c.cid ASC) AS rn
          -- NaN cosines never assign (graft_centroid_ranks skips them;
          -- an unfiltered ORDER BY would rank NaN FIRST here)
          FROM n a CROSS JOIN c
          WHERE NOT isnan(${DuckOps.dot("a.v", "c.cv")} / (sqrt(a.nrm) * sqrt(c.cn)))) WHERE rn = 1),
      probes AS (SELECT q_id, qv, qn, qcentroid FROM (
          SELECT a.vec_id AS q_id, a.v AS qv, a.nrm AS qn, c.cid AS qcentroid,
            row_number() OVER (PARTITION BY a.vec_id
              ORDER BY ${DuckOps.dot("a.v", "c.cv")} / (sqrt(a.nrm) * sqrt(c.cn)) DESC,
                       c.cid ASC) AS rn
          FROM n a CROSS JOIN c WHERE a.vec_id < 10
            AND NOT isnan(${DuckOps.dot("a.v", "c.cv")} / (sqrt(a.nrm) * sqrt(c.cn)))) WHERE rn <= 2),
      scored AS (SELECT DISTINCT p.q_id, s.vec_id AS n_id,
          ${DuckOps.dot("p.qv", "s.v")} / (sqrt(p.qn) * sqrt(s.nrm)) AS cos
        FROM probes p JOIN asg s
        ON p.qcentroid = s.centroid AND s.vec_id <> p.q_id)
      SELECT q_id, CAST(rk AS BIGINT) AS rk, n_id, cos FROM (
        SELECT q_id, n_id, cos,
          row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rk
        FROM scored) WHERE rk <= 3
      ORDER BY q_id, rk"""))

  /** ANN quality as a tested invariant: per-query overlap between the
    * IVF top-3 (s04's plan) and the brute-force exact top-3 (s01's),
    * plus a recall-floor boolean. Both sides are deterministic and
    * fully replicated in the oracle, so the overlap COUNT is
    * cell-exact — the approximation's quality is under test, not just
    * its own output (the q37 treatment, applied to ANN recall). */
  val s05: QueryDef = QueryDef(
    "s05_ivf_recall",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val exact = Similarity.cosineTopK(emb, 10, 3).select(col("q_id"), col("n_id"))
      val ivf = Similarity.ivfTopK(emb, 10, 3, 16, 2)
        .select(col("q_id").as("iq"), col("n_id").as("inid"))
      exact.join(ivf, col("q_id") === col("iq") && col("n_id") === col("inid"), "left")
        .groupBy(col("q_id"))
        .agg(count(col("inid")).as("n_overlap"))
        .select(col("q_id"), col("n_overlap"),
          (col("n_overlap") >= 1).as("recall_ok"))
        .orderBy(col("q_id"))
    },
    Some(s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
                        FROM embeddings),
      n AS (SELECT vec_id, v, ${DuckOps.norm2("v")} AS nrm FROM e),
      px AS (SELECT a.vec_id AS q_id, b.vec_id AS n_id,
              ${DuckOps.dot("a.v", "b.v")} / (sqrt(a.nrm) * sqrt(b.nrm)) AS cos
            FROM n a JOIN n b ON a.vec_id < 10 AND b.vec_id <> a.vec_id),
      x AS (SELECT q_id, n_id FROM (
              SELECT q_id, n_id,
                row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rk
              FROM px) WHERE rk <= 3),
      cc AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n WHERE vec_id < 16),
      asg AS (SELECT vec_id, v, nrm, cid AS centroid FROM (
          SELECT a.vec_id, a.v, a.nrm, cc.cid,
            row_number() OVER (PARTITION BY a.vec_id
              ORDER BY ${DuckOps.dot("a.v", "cc.cv")} / (sqrt(a.nrm) * sqrt(cc.cn)) DESC,
                       cc.cid ASC) AS rn
          FROM n a CROSS JOIN cc
          WHERE NOT isnan(${DuckOps.dot("a.v", "cc.cv")} / (sqrt(a.nrm) * sqrt(cc.cn)))) WHERE rn = 1),
      probes AS (SELECT q_id, qv, qn, qcentroid FROM (
          SELECT a.vec_id AS q_id, a.v AS qv, a.nrm AS qn, cc.cid AS qcentroid,
            row_number() OVER (PARTITION BY a.vec_id
              ORDER BY ${DuckOps.dot("a.v", "cc.cv")} / (sqrt(a.nrm) * sqrt(cc.cn)) DESC,
                       cc.cid ASC) AS rn
          FROM n a CROSS JOIN cc WHERE a.vec_id < 10
            AND NOT isnan(${DuckOps.dot("a.v", "cc.cv")} / (sqrt(a.nrm) * sqrt(cc.cn)))) WHERE rn <= 2),
      scored AS (SELECT DISTINCT p.q_id, s.vec_id AS n_id,
          ${DuckOps.dot("p.qv", "s.v")} / (sqrt(p.qn) * sqrt(s.nrm)) AS cos
        FROM probes p JOIN asg s
        ON p.qcentroid = s.centroid AND s.vec_id <> p.q_id),
      y AS (SELECT q_id, n_id FROM (
              SELECT q_id, n_id,
                row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rk
              FROM scored) WHERE rk <= 3)
      SELECT x.q_id, CAST(count(y.n_id) AS BIGINT) AS n_overlap,
        count(y.n_id) >= 1 AS recall_ok
      FROM x LEFT JOIN y ON x.q_id = y.q_id AND x.n_id = y.n_id
      GROUP BY x.q_id ORDER BY x.q_id"""))

  /** Embedding near-dup pairs (cosine >= 0.45) via 3-band x 6-plane
    * LSH candidates + exact re-rank — the oracle replicates the bands
    * and the left-fold cosine bit-exactly. */
  val s03: QueryDef = QueryDef(
    "s03_embedding_neardup",
    (s, d) => Similarity.nearDupPairs(Tables.embeddings(s, d), 0.45)
      .orderBy(col("d1"), col("d2")),
    Some(s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
                        FROM embeddings),
      n AS (SELECT vec_id, v, ${DuckOps.norm2("v")} AS nrm,
              list_reduce(list_concat([0::BIGINT], list_transform(range(0, 18), p ->
                CASE WHEN list_reduce(list_concat([0.0::DOUBLE],
                    list_transform(range(1, 65), d ->
                      v[d] * CAST(${Similarity.planeWeight} AS DOUBLE))),
                    (acc, x) -> acc + x) > 0
                THEN (1::BIGINT << p) ELSE 0::BIGINT END)), (a, x) -> a + x) AS sig
            FROM e),
      bands AS (SELECT vec_id, b, (sig >> (b * 6)) % 64 AS bucket
                FROM n, unnest(range(0, 3)) AS t(b)),
      cand AS (SELECT DISTINCT a.vec_id AS d1, b.vec_id AS d2
               FROM bands a JOIN bands b
               ON a.b = b.b AND a.bucket = b.bucket AND a.vec_id < b.vec_id)
      SELECT d1, d2,
        ${DuckOps.dot("s1.v", "s2.v")} / (sqrt(s1.nrm) * sqrt(s2.nrm)) AS cos
      FROM cand JOIN n s1 ON d1 = s1.vec_id JOIN n s2 ON d2 = s2.vec_id
      WHERE ${DuckOps.dot("s1.v", "s2.v")} / (sqrt(s1.nrm) * sqrt(s2.nrm)) >= 0.45
      ORDER BY d1, d2"""))

  // -------------------------------------------------------- text analysis

  /** Quality scoring: token stats + punctuation + stopword density,
    * all exact-integer (micro-unit ratios via integer division). */
  val t01: QueryDef = QueryDef(
    "t01_quality_scores",
    (s, d) => Tables.documents(s, d)
      .selectExpr("doc_id", "n_chars", s"${TextOps.tokens("text")} AS t", "text")
      .selectExpr(
        "doc_id", "n_chars",
        "cast(size(t) as bigint) AS n_tokens",
        "aggregate(t, cast(0 as bigint), (acc, x) -> acc + length(x)) AS n_token_chars",
        "cast(length(regexp_replace(lower(text), '[a-z0-9 ]', '')) as bigint) AS n_punct",
        s"cast(${TextOps.stopHits("t", TextOps.StopEn)} as bigint) AS stop_hits")
      .selectExpr("doc_id", "n_chars", "n_tokens", "n_token_chars", "n_punct", "stop_hits",
        "if(n_tokens = 0, 0, (n_token_chars * 1000000) div n_tokens) AS avg_token_len_micro",
        "if(n_tokens = 0, 0, (stop_hits * 1000000) div n_tokens) AS stop_ratio_micro",
        "if(n_chars = 0, 0, (n_punct * 1000000) div n_chars) AS punct_ratio_micro")
      .orderBy(col("doc_id")),
    Some(s"""WITH q AS (
        SELECT doc_id, n_chars, ${DuckOps.tokens("text")} AS t, text FROM documents),
      m AS (SELECT doc_id, n_chars,
          CAST(len(t) AS BIGINT) AS n_tokens,
          CAST(coalesce(list_sum(list_transform(t, x -> length(x))), 0) AS BIGINT) AS n_token_chars,
          CAST(length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g')) AS BIGINT) AS n_punct,
          CAST(${DuckOps.stopHits("t", TextOps.StopEn)} AS BIGINT) AS stop_hits
        FROM q)
      SELECT doc_id, n_chars, n_tokens, n_token_chars, n_punct, stop_hits,
        CASE WHEN n_tokens = 0 THEN 0 ELSE (n_token_chars * 1000000) // n_tokens END AS avg_token_len_micro,
        CASE WHEN n_tokens = 0 THEN 0 ELSE (stop_hits * 1000000) // n_tokens END AS stop_ratio_micro,
        CASE WHEN n_chars = 0 THEN 0 ELSE (n_punct * 1000000) // n_chars END AS punct_ratio_micro
      FROM m ORDER BY doc_id"""))

  /** Heuristic language ID: stopword votes per language, deterministic
    * tie-break en > de > es > fr > unknown; compared to the labeled
    * lang column for an accuracy summary. */
  val t02: QueryDef = QueryDef(
    "t02_language_id",
    (s, d) => graft.operators.Storage.parallelFloor(Tables.documents(s, d))
      .selectExpr("doc_id", "lang", s"${TextOps.tokens("text")} AS t")
      .selectExpr("doc_id", "lang",
        s"${TextOps.stopHits("t", TextOps.StopEn)} AS h_en",
        s"${TextOps.stopHits("t", TextOps.StopDe)} AS h_de",
        s"${TextOps.stopHits("t", TextOps.StopEs)} AS h_es",
        s"${TextOps.stopHits("t", TextOps.StopFr)} AS h_fr")
      .selectExpr("doc_id", "lang",
        """CASE WHEN h_en = 0 AND h_de = 0 AND h_es = 0 AND h_fr = 0 THEN 'unknown'
              WHEN h_en >= h_de AND h_en >= h_es AND h_en >= h_fr THEN 'en'
              WHEN h_de >= h_es AND h_de >= h_fr THEN 'de'
              WHEN h_es >= h_fr THEN 'es'
              ELSE 'fr' END AS guessed""")
      .groupBy(col("lang"), col("guessed"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("guessed")),
    Some(s"""WITH q AS (SELECT doc_id, lang, ${DuckOps.tokens("text")} AS t FROM documents),
      h AS (SELECT doc_id, lang,
          ${DuckOps.stopHits("t", TextOps.StopEn)} AS h_en,
          ${DuckOps.stopHits("t", TextOps.StopDe)} AS h_de,
          ${DuckOps.stopHits("t", TextOps.StopEs)} AS h_es,
          ${DuckOps.stopHits("t", TextOps.StopFr)} AS h_fr
        FROM q),
      g AS (SELECT lang,
          CASE WHEN h_en = 0 AND h_de = 0 AND h_es = 0 AND h_fr = 0 THEN 'unknown'
               WHEN h_en >= h_de AND h_en >= h_es AND h_en >= h_fr THEN 'en'
               WHEN h_de >= h_es AND h_de >= h_fr THEN 'de'
               WHEN h_es >= h_fr THEN 'es'
               ELSE 'fr' END AS guessed
        FROM h)
      SELECT lang, guessed, count(*) AS n FROM g
      GROUP BY lang, guessed ORDER BY lang, guessed"""))

  /** Token counting: whitespace tokens + BPE-ish segment count. */
  val t03: QueryDef = QueryDef(
    "t03_token_counts",
    (s, d) => Tables.documents(s, d)
      .selectExpr("doc_id",
        "cast(size(filter(split(text, '[ ]+'), x -> x != '')) as bigint) AS ws_tokens",
        "cast(regexp_count(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]') as bigint) AS bpe_ish_tokens",
        "cast(length(text) as bigint) AS n_chars2")
      .orderBy(col("doc_id")),
    Some("""SELECT doc_id,
        CAST(len(list_filter(regexp_split_to_array(text, '[ ]+'), x -> x <> '')) AS BIGINT) AS ws_tokens,
        CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS bpe_ish_tokens,
        CAST(length(text) AS BIGINT) AS n_chars2
      FROM documents ORDER BY doc_id"""))

  /** Document fingerprinting: 60-bit content hash of the normalized
    * text + first-8-token prefix hash (rolling polynomial). */
  val t04: QueryDef = QueryDef(
    "t04_fingerprints",
    (s, d) => Tables.documents(s, d)
      .selectExpr("doc_id", s"${TextOps.tokens("text")} AS t", "text")
      .selectExpr("doc_id",
        s"${TextOps.strHash60("concat_ws(' ', t)")} AS fp",
        s"${TextOps.strHash60("concat_ws(' ', slice(t, 1, 8))")} AS prefix_fp")
      .orderBy(col("doc_id")),
    Some(s"""WITH q AS (SELECT doc_id, ${DuckOps.tokens("text")} AS t FROM documents),
      j AS (SELECT doc_id, array_to_string(t, ' ') AS full_s,
              array_to_string(t[1:8], ' ') AS pre_s FROM q)
      SELECT doc_id, ${DuckOps.strHash60("full_s")} AS fp,
        ${DuckOps.strHash60("pre_s")} AS prefix_fp
      FROM j ORDER BY doc_id"""))

  // ----------------------------------------------------------- multimodal

  /** Multimodal ingest metadata: the media table's opaque binary
    * payloads (REAL encoded PPM/WAV/Y4M bytes,
    * [[graft.operators.Multimodal.mediaFromDocuments]]) with their
    * typed metadata, byte sizes, and the container format SNIFFED
    * from the magic bytes — ingest trusts content, not labels, so the
    * declared mime and the sniffed container travel as separate
    * columns. The oracle replays the byte-exact container sizes
    * (header + raster/sample/frame arithmetic) per format spec. */
  val m01: QueryDef = QueryDef(
    "m01_multimodal_features",
    (s, d) => graft.operators.Multimodal.mediaFromDocuments(Tables.documents(s, d))
      .toDF()
      .selectExpr("media_id", "kind", "mime",
        "cast(octet_length(payload) as bigint) AS n_bytes",
        "cast(substring(payload, 1, 2) as string) AS magic")
      .selectExpr("media_id", "kind", "mime", "n_bytes", "magic",
        """CASE magic WHEN 'P6' THEN 'ppm' WHEN 'RI' THEN 'wav'
              WHEN 'YU' THEN 'y4m' ELSE 'unknown' END AS container""")
      .orderBy(col("media_id")),
    Some("""WITH m AS (SELECT doc_id AS media_id, doc_id % 3 AS k FROM documents),
      b AS (SELECT media_id, k,
          4 + media_id % 29 AS iw, 4 + media_id % 23 AS ih,
          16 + media_id % 240 AS an,
          2 * (2 + media_id % 14) AS vw, 2 * (2 + media_id % 10) AS vh,
          1 + media_id % 27 AS nf
        FROM m)
      SELECT media_id,
        CASE k WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        CASE k WHEN 0 THEN 'image/x-portable-pixmap' WHEN 1 THEN 'audio/vnd.wave'
          ELSE 'video/x-yuv4mpeg2' END AS mime,
        CAST(CASE k
          WHEN 0 THEN length('P6' || chr(10) || iw || ' ' || ih || chr(10)
            || '255' || chr(10)) + 3 * iw * ih
          WHEN 1 THEN 44 + 2 * an
          ELSE length('YUV4MPEG2 W' || vw || ' H' || vh
            || ' F25:1 Ip A1:1 C420jpeg' || chr(10)) + nf * (6 + (3 * vw * vh) // 2)
        END AS BIGINT) AS n_bytes,
        CASE k WHEN 0 THEN 'P6' WHEN 1 THEN 'RI' ELSE 'YU' END AS magic,
        CASE k WHEN 0 THEN 'ppm' WHEN 1 THEN 'wav' ELSE 'y4m' END AS container
      FROM b ORDER BY media_id"""))
}
