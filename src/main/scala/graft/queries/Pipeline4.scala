package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Dedup, Joins, Similarity, TextOps}

/** Round-6 additions: the embedding-side curation steps (semantic
  * dedup, int8 quantization) with tested accuracy invariants, sketch
  * accuracy as a hash-checked bound (the q37 pattern applied to
  * MinHash), Unicode NFC normalization through a native expression,
  * a bucketed interval join (the range-join shape Spark would
  * otherwise plan as a nested-loop scan), and an adaptive per-group
  * quantile gate. Exact-integer / fixed-order-IEEE throughout so the
  * DuckDB oracles stay cell-exact.
  */
object Pipeline4 {

  def all: Seq[QueryDef] = Seq(s07, s08, s09, d06, t11, q38, q39, p10, p11, p12, t12)

  /** SemDeDup-style semantic dedup over the embedding corpus
    * ([[graft.operators.Similarity.semanticDedup]]): IVF-style
    * centroid assignment, within-cluster cosine pairs, drop any
    * vector with a lower-id cluster-mate at cosine >= 0.4. The
    * synthetic corpus has no true paraphrase pairs (max within-
    * cluster cosine ~0.49), so 0.4 exercises the drop path while the
    * plan is the one a real corpus runs at ~0.95. The oracle replays
    * the argmax assignment (s06's CTE chain), the within-cluster
    * pair generation, and the keep-lowest-id policy. */
  val s07: QueryDef = QueryDef(
    "s07_semantic_dedup",
    (s, d) => Similarity.semanticDedup(Tables.embeddings(s, d), 16, 0.4)
      .orderBy(col("vec_id")),
    Some(s"""WITH e AS (SELECT vec_id,
          list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
      nn AS (SELECT vec_id, v, ${DuckOps.norm2("v")} AS nrm FROM e),
      c AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM nn WHERE vec_id < 16),
      sc AS (SELECT vec_id, v, nrm, cid,
               ${DuckOps.dot("v", "cv")} / (sqrt(nrm) * sqrt(cn)) AS cos
             FROM nn, c),
      asg AS (SELECT vec_id, v, nrm, cid FROM (
               SELECT vec_id, v, nrm, cid,
                 row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rk
               -- NaN cosines never assign (graft_centroid_ranks skips
               -- them); the LEFT JOIN below restores the vector with
               -- the closure's centroid -1
               FROM sc WHERE NOT isnan(cos)) WHERE rk = 1),
      fasg AS (SELECT nn.vec_id, nn.v, nn.nrm,
                 coalesce(a.cid, CAST(-1 AS BIGINT)) AS cid
               FROM nn LEFT JOIN asg a ON nn.vec_id = a.vec_id),
      pr AS (SELECT b.vec_id AS d2,
               CASE WHEN a.nrm = 0 OR b.nrm = 0 THEN NULL
                 ELSE ${DuckOps.dot("a.v", "b.v")} / (sqrt(a.nrm) * sqrt(b.nrm)) END AS cos
             FROM fasg a JOIN fasg b ON a.cid = b.cid AND a.vec_id < b.vec_id),
      losers AS (SELECT DISTINCT d2 FROM pr WHERE cos >= 0.4)
      SELECT vec_id, CAST(cid AS BIGINT) AS centroid,
        vec_id NOT IN (SELECT d2 FROM losers) AS kept
      FROM fasg ORDER BY vec_id"""))

  /** Per-vector int8 quantization
    * ([[graft.operators.Similarity.quantizeInt8]]) with its accuracy
    * invariant hash-checked: the full code array is pinned by an
    * exact-integer fold hash (offset +127 keeps every term
    * non-negative) plus its sum, and `cos_ok` asserts the
    * reconstruction cosine stays >= 0.999 (measured floor on this
    * corpus: ~0.99995). The q37 pattern: the sketch's ERROR BOUND is
    * the tested, deterministic output — not the engine-specific float
    * soup. Zero vectors (scale 0) pass by definition. */
  val s08: QueryDef = QueryDef(
    "s08_quantize_int8",
    (s, d) => Similarity.quantizeInt8(Tables.embeddings(s, d))
      .selectExpr("vec_id",
        "aggregate(q, cast(0 as bigint), (a, x) -> a + x) AS q_sum",
        s"${TextOps.foldHash("transform(q, x -> cast(x + 127 as bigint))")} AS q_hash",
        "if(maxabs = 0d, true, " +
          "graft_dot(v, transform(q, qi -> (qi * maxabs) / 127d)) / " +
          "(sqrt(nrm) * sqrt(graft_dot(transform(q, qi -> (qi * maxabs) / 127d), " +
          "transform(q, qi -> (qi * maxabs) / 127d)))) >= 0.999d) AS cos_ok")
      .orderBy(col("vec_id")),
    Some(s"""WITH e AS (SELECT vec_id,
          list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
      m AS (SELECT vec_id, v, ${DuckOps.norm2("v")} AS nrm,
              list_reduce(list_concat([0.0::DOUBLE],
                list_transform(v, x -> abs(x))), (a, b) -> greatest(a, b)) AS maxabs
            FROM e),
      qz AS (SELECT vec_id, v, nrm, maxabs,
               CASE WHEN maxabs = 0 THEN list_transform(v, x -> 0::INT)
                 ELSE list_transform(v, x -> CAST(round((x * 127) / maxabs) AS INT))
               END AS q
             FROM m),
      rec AS (SELECT vec_id, v, nrm, maxabs, q,
               list_transform(q, qi -> (qi * maxabs) / 127) AS vr FROM qz)
      SELECT vec_id,
        CAST(list_reduce(list_concat([0::BIGINT], q), (a, b) -> a + b) AS BIGINT) AS q_sum,
        ${DuckOps.foldHash("list_transform(q, x -> (x + 127)::BIGINT)")} AS q_hash,
        CASE WHEN maxabs = 0 THEN true
          ELSE ${DuckOps.dot("v", "vr")} /
            (sqrt(nrm) * sqrt(${DuckOps.norm2("vr")})) >= 0.999 END AS cos_ok
      FROM rec ORDER BY vec_id"""))

  /** Product quantization ([[graft.operators.Similarity.productQuantize]]):
    * 8 subvector codes per vector against the deterministic 16-entry
    * codebooks — the compressed ANN storage format, 8 bytes/vector
    * here. The full code assignment is pinned by an exact-integer fold
    * hash, the reconstruction cosine is emitted raw (bit-identical
    * fold order both engines), and recon_ok bounds it >= 0.35 (the
    * corpus floor is ~0.39 with this untrained 16-entry codebook — a
    * trained one recovers far more; the MACHINERY is what's tested).
    * The driver compare cannot sort rows on ARRAY columns, so the
    * codes travel as the fold hash (the m03 lesson). */
  val s09: QueryDef = QueryDef(
    "s09_product_quantization",
    (s, d) => Similarity.productQuantize(Tables.embeddings(s, d))
      .selectExpr("vec_id",
        s"${TextOps.foldHash("codes")} AS code_hash",
        "recon_cos", "recon_cos >= 0.35d AS recon_ok")
      .orderBy(col("vec_id")),
    Some(s"""WITH e AS (SELECT vec_id,
          list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
      cb AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 16),
      sub AS (SELECT e.vec_id, j, cid,
                list_reduce(list_concat([0.0::DOUBLE],
                  list_transform(range(1, 9), i ->
                    (e.v[j * 8 + i] - cb.cv[j * 8 + i]) *
                    (e.v[j * 8 + i] - cb.cv[j * 8 + i]))),
                  (x, y) -> x + y) AS d
              FROM e, cb, unnest(range(0, 8)) AS t(j)),
      asg AS (SELECT vec_id, j, cid FROM (
                SELECT vec_id, j, cid,
                  row_number() OVER (PARTITION BY vec_id, j ORDER BY d, cid) AS rk
                FROM sub) WHERE rk = 1),
      rec AS (SELECT a.vec_id,
                flatten(list(cb.cv[a.j * 8 + 1 : a.j * 8 + 8] ORDER BY a.j)) AS vr,
                list(a.cid ORDER BY a.j) AS codes
              FROM asg a JOIN cb ON a.cid = cb.cid GROUP BY a.vec_id),
      sc AS (SELECT r.vec_id, ${DuckOps.foldHash("r.codes")} AS code_hash,
               CASE WHEN ${DuckOps.norm2("e.v")} = 0 OR ${DuckOps.norm2("r.vr")} = 0
                 THEN 0.0 ELSE ${DuckOps.dot("e.v", "r.vr")} /
                 (sqrt(${DuckOps.norm2("e.v")}) * sqrt(${DuckOps.norm2("r.vr")})) END AS recon_cos
             FROM rec r JOIN e ON r.vec_id = e.vec_id)
      SELECT vec_id, code_hash, recon_cos, recon_cos >= 0.35 AS recon_ok
      FROM sc ORDER BY vec_id"""))

  /** MinHash accuracy as a tested invariant (the q37 pattern applied
    * to d03): for every LSH-surfaced pair, the 16-perm signature
    * estimate vs the EXACT shingle-set Jaccard, with the error bound
    * evaluated in pure integer cross-multiplication —
    * |matches/16 - shared/uni| <= 0.3 becomes
    * |matches*uni - shared*16| * 10 <= 3*16*uni, no doubles anywhere
    * — so the accuracy of the sketch is itself a hash-matchable cell,
    * not an untested estimate. */
  val d06: QueryDef = QueryDef(
    "d06_minhash_accuracy",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = Dedup.minhashLshPairs(docs, "text", 3, 16, 4, 0.5)
        .select(col("d1"), col("d2"), col("matches"))
      val sets = Dedup.shingleHashSets(docs, "text", 3)
      pairs
        .join(sets.select(col("doc_id").as("d1"), col("hs").as("h1"),
          col("n_shingles").as("n1")), Seq("d1"))
        .join(sets.select(col("doc_id").as("d2"), col("hs").as("h2"),
          col("n_shingles").as("n2")), Seq("d2"))
        .selectExpr("d1", "d2", "matches",
          "cast(size(array_intersect(h1, h2)) as bigint) AS shared",
          "cast(n1 + n2 - size(array_intersect(h1, h2)) as bigint) AS uni")
        .withColumn("est_ok",
          abs(col("matches") * col("uni") - col("shared") * 16) * 10
            <= col("uni") * (3 * 16))
        .orderBy(col("d1"), col("d2"))
    },
    Some(s"""WITH toks AS (SELECT doc_id, ${DuckOps.tokens("text")} AS t FROM documents),
      sh AS (SELECT doc_id, ${DuckOps.shingles("t", 3)} AS s FROM toks),
      hs AS (SELECT doc_id, list_distinct(
               list_transform(s, x -> ${DuckOps.strHash60("x")})) AS h FROM sh),
      sig AS (SELECT doc_id, ${DuckOps.minhashSig("h", 16)} AS sig FROM hs),
      bands AS (SELECT doc_id, b, ${DuckOps.foldHash("sig[b * 4 + 1 : b * 4 + 4]")} AS bucket
                FROM sig, unnest(range(0, 4)) AS t(b)),
      cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
               FROM bands a JOIN bands b
               ON a.b = b.b AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
      pairs AS (SELECT d1, d2,
                  CAST(len(list_filter(range(1, 17),
                    i -> s1.sig[i] = s2.sig[i])) AS BIGINT) AS matches
                FROM cand
                JOIN sig s1 ON d1 = s1.doc_id JOIN sig s2 ON d2 = s2.doc_id
                WHERE CAST(len(list_filter(range(1, 17),
                  i -> s1.sig[i] = s2.sig[i])) AS DOUBLE) / 16 >= 0.5),
      ex AS (SELECT d1, d2, matches,
               CAST(len(list_intersect(e1.h, e2.h)) AS BIGINT) AS shared,
               CAST(len(e1.h) + len(e2.h) - len(list_intersect(e1.h, e2.h)) AS BIGINT) AS uni
             FROM pairs JOIN hs e1 ON d1 = e1.doc_id JOIN hs e2 ON d2 = e2.doc_id)
      SELECT d1, d2, matches, shared, uni,
        abs(matches * uni - shared * 16) * 10 <= uni * 48 AS est_ok
      FROM ex ORDER BY d1, d2"""))

  // deterministic non-NFC salt appended to every doc so the ASCII-only
  // synthetic corpus actually exercises composition: 'e' + U+0301
  // composes to U+00E9 under NFC (one codepoint shorter)
  private val Salt = " cafe\u0301"

  /** Unicode NFC normalization through the native codegen'd
    * [[graft.functions.NfcNormalize]] expression — the cleanup pass
    * that must run before any hashing/dedup so decomposed and
    * precomposed spellings of the same text collapse. Pure
    * projection, zero shuffle. The oracle is DuckDB's utf8proc-backed
    * `nfc_normalize`; the JDK implements the same Unicode standard
    * algorithm, and the char-length delta pins that composition
    * actually happened. */
  val t11: QueryDef = QueryDef(
    "t11_nfc_normalize",
    (s, d) => Tables.documents(s, d)
      .selectExpr("doc_id", s"concat(text, '$Salt') AS salted")
      .selectExpr("doc_id",
        "cast(length(salted) as bigint) AS n_before",
        "cast(length(graft_nfc(salted)) as bigint) AS n_after",
        "graft_nfc(salted) AS text_norm")
      .orderBy(col("doc_id")),
    Some("""WITH s AS (SELECT doc_id, text || ' cafe' || chr(769) AS salted
        FROM documents)
      SELECT doc_id,
        CAST(length(salted) AS BIGINT) AS n_before,
        CAST(length(nfc_normalize(salted)) AS BIGINT) AS n_after,
        nfc_normalize(salted) AS text_norm
      FROM s ORDER BY doc_id"""))

  /** Bucketed interval join ([[graft.operators.Joins.rangeJoin]]):
    * purchases landing in the 60-second window after each error
    * event, counted per error — NO equi-key relates the two sides, so
    * Spark's native plan would be a nested-loop scan; the operator's
    * bucket expansion turns it into a hash-shuffle equi-join on the
    * 60 s bucket id (each interval replicates to <= 2 buckets, each
    * point to exactly 1). The left join back to the interval side
    * keeps zero-count windows. */
  val q38: QueryDef = QueryDef(
    "q38_range_join",
    (s, d) => {
      val W = 60000000L // 60 s in microseconds
      val ev = Tables.events(s, d).withColumn("tm", expr("unix_micros(ts)"))
      val pts = ev.filter(col("event_type") === "purchase")
        .select(col("tm").as("pm"))
      val ivs = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("e_id"), col("tm").as("w_start"),
          (col("tm") + W).as("w_end"))
      val counts = Joins.rangeJoin(pts, ivs, "pm", "w_start", "w_end", W)
        .groupBy(col("e_id")).agg(count(lit(1)).as("n"))
      ivs.select(col("e_id"))
        .join(counts, Seq("e_id"), "left")
        .selectExpr("e_id", "cast(coalesce(n, 0) as bigint) AS n_purchases")
        .orderBy(col("e_id"))
    },
    Some("""WITH er AS (SELECT event_id AS e_id, epoch_us(ts) AS s0
          FROM events WHERE event_type = 'error'),
        p AS (SELECT epoch_us(ts) AS pm FROM events WHERE event_type = 'purchase')
      SELECT e_id, CAST(count(pm) AS BIGINT) AS n_purchases
      FROM er LEFT JOIN p ON pm >= s0 AND pm < s0 + 60000000
      GROUP BY e_id ORDER BY e_id"""))

  /** The first BPE merge step — the tokenizer-training primitive:
    * count every adjacent character pair across all token instances
    * and rank the top 20 (the pair a byte-pair-encoding trainer would
    * merge first). 100 TB shape: explode to pairs is a pure
    * projection, the count is a map-side-combined groupBy over a
    * bounded key space (alphabet^2), and the ranking is
    * TakeOrderedAndProject — the full pair table is never sorted.
    * Exact integers throughout. */
  val t12: QueryDef = QueryDef(
    "t12_bpe_pairs",
    (s, d) => Tables.documents(s, d)
      .selectExpr(s"explode(${TextOps.tokens("text")}) AS t")
      .filter(length(col("t")) >= 2)
      .selectExpr(
        "explode(transform(sequence(1, length(t) - 1), i -> substring(t, i, 2))) AS pair")
      .groupBy(col("pair"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(20),
    Some(s"""WITH tok AS (SELECT unnest(${DuckOps.tokens("text")}) AS t FROM documents),
      pr AS (SELECT unnest(list_transform(range(1, length(t)),
               i -> substr(t, i, 2))) AS pair
             FROM tok WHERE length(t) >= 2)
      SELECT pair, count(*) AS n FROM pr
      GROUP BY pair ORDER BY n DESC, pair LIMIT 20"""))

  /** Deterministic round-robin source interleaving — the training-
    * order construction step that spreads every source evenly through
    * the epoch (consecutive batches should not be single-domain runs).
    * interleave_key = (r-1) * n_src + src_idx gives source s's r-th
    * doc the r-th round-robin slot: a contiguous schedule when sources
    * are balanced, and a deterministic total order regardless.
    *
    * 100 TB shape: ONE window shuffle partitioned by source for the
    * per-source rank; the source index and source count are tiny
    * broadcast tables (the single-partition window ranks only the
    * distinct sources — bounded by |domains|, not docs). No global
    * row_number anywhere: the schedule key is pure arithmetic. */
  val p11: QueryDef = QueryDef(
    "p11_source_interleave",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val srcIdx = docs.select(col("source")).distinct()
        .withColumn("src_idx",
          row_number().over(Window.orderBy(col("source"))).cast("long"))
      val nSrc = srcIdx.agg(count(lit(1)).as("n_src"))
      docs.select(col("doc_id"), col("source"))
        .withColumn("r", row_number().over(
          Window.partitionBy(col("source")).orderBy(col("doc_id"))).cast("long"))
        .join(broadcast(srcIdx), Seq("source"))
        .crossJoin(broadcast(nSrc))
        .selectExpr("doc_id", "source", "r", "src_idx",
          "(r - 1) * n_src + src_idx AS interleave_key")
        .orderBy(col("interleave_key"))
    },
    Some("""WITH si AS (SELECT source,
          CAST(row_number() OVER (ORDER BY source) AS BIGINT) AS src_idx
        FROM (SELECT DISTINCT source FROM documents)),
      n AS (SELECT count(*) AS n_src FROM si),
      rk AS (SELECT doc_id, source,
          CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id) AS BIGINT) AS r
        FROM documents)
      SELECT doc_id, source, r, src_idx,
        CAST((r - 1) * n_src + src_idx AS BIGINT) AS interleave_key
      FROM rk JOIN si USING (source), n ORDER BY interleave_key"""))

  /** The composed end-to-end curation pipeline
    * ([[graft.operators.Curate.pipeline]]) — every stage ranked over
    * the SURVIVORS of the previous one, which is what makes it a
    * pipeline rather than independent predicates: NFC-normalize ->
    * exact-dup keep-first on the normalized fingerprint -> per-domain
    * cap (first 20 per source) -> per-source quality quartile gate
    * (top 75% by token count) -> round-robin interleave key over the
    * final survivor set. The oracle replays the whole chain as one
    * CTE cascade, so the COMPOSITION is cell-exact, not just each
    * stage in isolation. */
  val p12: QueryDef = QueryDef(
    "p12_curation_pipeline",
    (s, d) => graft.operators.Curate.pipeline(Tables.documents(s, d))
      .orderBy(col("interleave_key")),
    Some(s"""WITH norm AS (SELECT doc_id, source, nfc_normalize(text) AS text_n
          FROM documents),
      fpx AS (SELECT doc_id, source, text_n, ${DuckOps.strHash60("text_n")} AS fp
          FROM norm),
      ded AS (SELECT * FROM fpx
          QUALIFY row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1),
      cap AS (SELECT doc_id, source,
            CAST(len(${DuckOps.tokens("text_n")}) AS BIGINT) AS n_tokens
          FROM ded
          QUALIFY row_number() OVER (PARTITION BY source ORDER BY doc_id) <= 20),
      gate AS (SELECT doc_id, source, n_tokens FROM (
          SELECT *,
            row_number() OVER (PARTITION BY source
              ORDER BY n_tokens DESC, doc_id) AS q_rk,
            count(*) OVER (PARTITION BY source) AS n_src
          FROM cap) WHERE q_rk * 4 <= n_src * 3),
      si AS (SELECT source,
            CAST(row_number() OVER (ORDER BY source) AS BIGINT) AS src_idx
          FROM (SELECT DISTINCT source FROM gate)),
      n AS (SELECT count(*) AS n_all_src FROM si),
      rk AS (SELECT doc_id, source, n_tokens,
            CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id) AS BIGINT) AS r
          FROM gate)
      SELECT doc_id, source, n_tokens,
        CAST((r - 1) * n_all_src + src_idx AS BIGINT) AS interleave_key
      FROM rk JOIN si USING (source), n ORDER BY interleave_key"""))

  /** Time-RANGE window frames — the window capability q23's ROWS
    * frames don't cover: per user, the trailing-one-hour event count
    * and cent total at every event (the per-row sliding aggregate
    * behind rate limiting and burst detection). The frame bound is on
    * the ORDER-BY VALUE (unix_micros), not a row offset, so ties and
    * gaps behave per SQL RANGE semantics in both engines. One window
    * shuffle partitioned by user. */
  val q39: QueryDef = QueryDef(
    "q39_time_range_frames",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("tm"))
        .rangeBetween(-3600000000L, 0L) // trailing hour in micros
      Tables.events(s, d)
        .selectExpr("event_id", "user_id", "unix_micros(ts) AS tm",
          "cast(round(value * 100) as bigint) AS cents")
        .withColumn("n_hour", count(lit(1)).over(w).cast("long"))
        .withColumn("cents_hour", sum(col("cents")).over(w).cast("long"))
        .select(col("event_id"), col("user_id"), col("n_hour"), col("cents_hour"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT event_id, user_id,
        CAST(count(*) OVER w AS BIGINT) AS n_hour,
        CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT) AS cents_hour
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      ORDER BY event_id"""))

  /** Adaptive per-source quality gate: keep the top 75% of each
    * source's docs by token count — the threshold ADAPTS to the group
    * (rank * 4 <= n * 3, pure integers) instead of a fixed global
    * cutoff, which is how real corpus curation sets per-domain
    * quality bars. One window shuffle, exact-integer predicate. */
  val p10: QueryDef = QueryDef(
    "p10_quality_quartile",
    (s, d) => Tables.documents(s, d)
      .selectExpr("doc_id", "source",
        s"cast(size(${TextOps.tokens("text")}) as bigint) AS n_tokens")
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("n_tokens").desc, col("doc_id"))).cast("long"))
      .withColumn("n_src",
        count(lit(1)).over(Window.partitionBy(col("source"))).cast("long"))
      .filter(col("rk") * 4 <= col("n_src") * 3)
      .orderBy(col("doc_id")),
    Some(s"""SELECT doc_id, source,
        CAST(len(${DuckOps.tokens("text")}) AS BIGINT) AS n_tokens,
        CAST(row_number() OVER (PARTITION BY source
          ORDER BY len(${DuckOps.tokens("text")}) DESC, doc_id) AS BIGINT) AS rk,
        CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n_src
      FROM documents QUALIFY rk * 4 <= n_src * 3 ORDER BY doc_id"""))
}
