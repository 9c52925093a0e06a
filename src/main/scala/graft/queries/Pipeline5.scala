package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Bpe, Packing, Similarity}

/** Round-8 additions: the coarse-quantizer TRAINING loop as a
  * hash-checked query surface. `kmeansUpdate` (s06) proved one Lloyd
  * step; these prove the iterated training — the piece that turns the
  * deterministic seed codebook into a real quantizer — and that the
  * trained codebook is measurably better than the seed it started
  * from. The oracle replays every iteration as an unrolled CTE
  * cascade: assignment argmax (cos DESC, cid), exact-integer
  * micro-mean, truncating div decomposed by sign (Spark `div` vs
  * DuckDB floor `//`), centroid rebuild as `mean_micro / 1e6` — one
  * IEEE division per coordinate, bit-identical across engines — with
  * empty clusters keeping their previous centroid via the LEFT JOIN
  * coalesce. */
object Pipeline5 {

  def all: Seq[QueryDef] = Seq(s10, s11, s12, s13, s14, s17, t13, t14, t15, p13, m04)

  private val K = 8 // seed codebook size (vec_id < 8)
  private val Iters = 3 // total Lloyd updates (2 fed back + 1 emitted)

  /** the shared CTE prefix: corpus vectors + seed codebook. */
  private def prefixSql: String =
    s"""WITH e AS (SELECT vec_id,
          list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
      nn AS (SELECT vec_id, v, ${DuckOps.norm2("v")} AS nrm FROM e),
      cb0 AS (SELECT vec_id AS cid, v AS cv FROM nn WHERE vec_id < $K)"""

  /** iteration `i`'s assignment + micro-mean aggregation vs codebook
    * `cb`: emits CTEs s<i> (cosines), a<i> (argmax assignment),
    * x<i> (exploded micro coords), g<i> (per (cid, dim) count/sum). */
  private def stepSql(i: Int, cb: String): String =
    s""",
      s$i AS (SELECT vec_id, v, cid,
               ${DuckOps.dot("v", "cv")} / (sqrt(nrm) * sqrt(${DuckOps.norm2("cv")})) AS cos
             FROM nn, $cb),
      a$i AS (SELECT vec_id, v, cid FROM (
               SELECT vec_id, v, cid,
                 row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rk
               FROM s$i WHERE NOT isnan(cos)) WHERE rk = 1),
      x$i AS (SELECT cid, unnest(range(1, len(v) + 1)) AS dim,
               unnest(list_transform(range(1, len(v) + 1),
                 q -> CAST(round(v[q] * 1000000) AS BIGINT))) AS xm
             FROM a$i),
      g$i AS (SELECT cid, dim, count(*) AS n, sum(xm) AS s FROM x$i GROUP BY 1, 2)"""

  /** codebook `i` rebuilt from g<i> over codebook `prev` (empty
    * clusters keep their previous centroid). */
  private def rebuildSql(i: Int, prev: String): String =
    s""",
      m$i AS (SELECT cid, dim,
               CASE WHEN s < 0 THEN -((-s) // n) ELSE s // n END AS mm FROM g$i),
      u$i AS (SELECT cid, list(mm / 1000000.0 ORDER BY dim) AS nv FROM m$i GROUP BY cid),
      cb$i AS (SELECT c.cid, coalesce(u.nv, c.cv) AS cv
               FROM $prev c LEFT JOIN u$i u ON c.cid = u.cid)"""

  /** the chain through `Iters` assignments (cb0 → … → cb{Iters-1},
    * with g1..gIters available). */
  private def chainSql: String = {
    val sb = new StringBuilder(prefixSql)
    var it = 1
    while (it <= Iters) {
      sb ++= stepSql(it, s"cb${it - 1}")
      if (it < Iters) sb ++= rebuildSql(it, s"cb${it - 1}")
      it += 1
    }
    sb.toString
  }

  /** Iterated k-means training ([[graft.operators.Similarity.kmeansTrain]]):
    * the final (3rd) Lloyd update table after two driver-fed-back
    * steps — per (centroid, dim), member count and the exact-integer
    * micro-mean. s06 pinned ONE step; this pins the LOOP (assignment
    * against trained, non-corpus centroid vectors included). */
  val s10: QueryDef = QueryDef(
    "s10_kmeans_train",
    (s, d) => Similarity.kmeansTrain(Tables.embeddings(s, d), K, Iters)
      .orderBy(col("centroid"), col("dim")),
    Some(s"""$chainSql
      SELECT CAST(cid AS BIGINT) AS centroid, CAST(dim AS BIGINT) AS dim,
        CAST(n AS BIGINT) AS n_members,
        CAST(CASE WHEN s < 0 THEN -((-s) // n) ELSE s // n END AS BIGINT) AS mean_micro
      FROM g$Iters ORDER BY centroid, dim"""))

  /** Training gain as a tested invariant (the q37/d06 pattern applied
    * to the training loop): summed micro-quantized assignment cosine
    * under the seed codebook vs the trained one, and the
    * strictly-better flag — so "training actually improves the
    * quantizer" is itself a hash-matched cell, not a claim. The
    * assigned-centroid cosine is the rk=1 cosine both engines already
    * rank identically; round(cos·1e9) sums are order-insensitive
    * BIGINTs. */
  val s11: QueryDef = QueryDef(
    "s11_kmeans_gain",
    (s, d) => Similarity.kmeansGain(Tables.embeddings(s, d), K, Iters),
    Some(s"""$chainSql,
      sq AS (SELECT CAST(sum(CAST(round(cos * 1000000000) AS BIGINT)) AS BIGINT)
               AS seed_quality
             FROM (SELECT cos, row_number() OVER
                 (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rk
               FROM s1 WHERE NOT isnan(cos)) WHERE rk = 1),
      tq AS (SELECT CAST(sum(CAST(round(cos * 1000000000) AS BIGINT)) AS BIGINT)
               AS trained_quality
             FROM (SELECT cos, row_number() OVER
                 (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rk
               FROM s$Iters WHERE NOT isnan(cos)) WHERE rk = 1)
      SELECT seed_quality, trained_quality,
        trained_quality > seed_quality AS trained_better
      FROM sq, tq"""))

  /** PQ coding + per-vector reconstruction vs codebook CTE `cb` (the
    * s09 oracle shape, parameterized): emits pq/pa/pr CTEs suffixed
    * `t` — pr$t is (vec_id, vr), the codebook reconstruction. m=8
    * subvectors over 64 dims. */
  private def pqCodeSql(t: String, cb: String): String =
    s""",
      pq$t AS (SELECT nn.vec_id, j, cid,
                list_reduce(list_concat([0.0::DOUBLE],
                  list_transform(range(1, 9), q ->
                    (nn.v[j * 8 + q] - cb.cv[j * 8 + q]) *
                    (nn.v[j * 8 + q] - cb.cv[j * 8 + q]))),
                  (x, y) -> x + y) AS d
              FROM nn, $cb cb, unnest(range(0, 8)) AS t(j)),
      pa$t AS (SELECT vec_id, j, cid FROM (
                SELECT vec_id, j, cid,
                  row_number() OVER (PARTITION BY vec_id, j ORDER BY d, cid) AS rk
                FROM pq$t) WHERE rk = 1),
      pr$t AS (SELECT a.vec_id,
                flatten(list(cb.cv[a.j * 8 + 1 : a.j * 8 + 8] ORDER BY a.j)) AS vr
              FROM pa$t a JOIN $cb cb ON a.cid = cb.cid GROUP BY a.vec_id)"""

  /** [[pqCodeSql]] plus the micro-summed reconstruction-cosine metric
    * CTE pm$t. */
  private def pqReconSql(t: String, cb: String, outCol: String): String =
    s"""${pqCodeSql(t, cb)},
      pm$t AS (SELECT CAST(sum(CAST(round(
                (CASE WHEN nn.nrm = 0 OR ${DuckOps.norm2("r.vr")} = 0 THEN 0.0
                 ELSE ${DuckOps.dot("nn.v", "r.vr")} /
                   (sqrt(nn.nrm) * sqrt(${DuckOps.norm2("r.vr")})) END) * 1000000000)
                AS BIGINT)) AS BIGINT) AS $outCol
              FROM pr$t r JOIN nn ON r.vec_id = nn.vec_id)"""

  /** Trained-vs-seed product-quantizer reconstruction
    * ([[graft.operators.Similarity.pqGain]]): the s09 recon metric
    * re-run under the trained codebook, micro-summed, with the
    * strictly-better flag hash-matched — closing the loop on s09's
    * documented untrained-codebook recon floor (~0.46 seed → ~0.51
    * trained on this corpus). */
  val s12: QueryDef = QueryDef(
    "s12_pq_trained_recon",
    (s, d) => Similarity.pqGain(Tables.embeddings(s, d), K, Iters, 8),
    Some(s"""$chainSql
      ${pqReconSql("s", "cb0", "seed_recon")}
      ${pqReconSql("t", s"cb${Iters - 1}", "trained_recon")}
      SELECT seed_recon, trained_recon,
        trained_recon > seed_recon AS trained_better
      FROM pms, pmt"""))

  /** Trained-quantizer ANN search ([[graft.operators.Similarity.ivfTopKTrained]]):
    * s04's IVF top-k re-run under the cb2 codebook the training loop
    * produced — the trained centroids drive the SEARCH operator, not
    * just the gain metrics. Oracle = s04's assignment/probe/re-rank
    * SQL parameterized by the chain's cb2 CTE (8 trained centroids,
    * 2 probed lists, exact re-rank top-3, queries vec_id < 10). */
  val s13: QueryDef = QueryDef(
    "s13_ivf_trained_topk",
    (s, d) => Similarity.ivfTopKTrained(Tables.embeddings(s, d), K, Iters, 10, 3, 2)
      .orderBy(col("q_id"), col("rk")),
    Some(s"""$chainSql,
      cc AS (SELECT cid, cv, ${DuckOps.norm2("cv")} AS cn FROM cb${Iters - 1}),
      iasg AS (SELECT vec_id, v, nrm, cid AS centroid FROM (
          SELECT a.vec_id, a.v, a.nrm, c.cid,
            row_number() OVER (PARTITION BY a.vec_id
              ORDER BY ${DuckOps.dot("a.v", "c.cv")} / (sqrt(a.nrm) * sqrt(c.cn)) DESC,
                       c.cid ASC) AS rn
          FROM nn a CROSS JOIN cc c
          WHERE NOT isnan(${DuckOps.dot("a.v", "c.cv")} / (sqrt(a.nrm) * sqrt(c.cn)))) WHERE rn = 1),
      iprobes AS (SELECT q_id, qv, qn, qcentroid FROM (
          SELECT a.vec_id AS q_id, a.v AS qv, a.nrm AS qn, c.cid AS qcentroid,
            row_number() OVER (PARTITION BY a.vec_id
              ORDER BY ${DuckOps.dot("a.v", "c.cv")} / (sqrt(a.nrm) * sqrt(c.cn)) DESC,
                       c.cid ASC) AS rn
          FROM nn a CROSS JOIN cc c WHERE a.vec_id < 10
            AND NOT isnan(${DuckOps.dot("a.v", "c.cv")} / (sqrt(a.nrm) * sqrt(c.cn)))) WHERE rn <= 2),
      iscored AS (SELECT DISTINCT p.q_id, s.vec_id AS n_id,
          ${DuckOps.dot("p.qv", "s.v")} / (sqrt(p.qn) * sqrt(s.nrm)) AS cos
        FROM iprobes p JOIN iasg s
        ON p.qcentroid = s.centroid AND s.vec_id <> p.q_id)
      SELECT q_id, CAST(rk AS BIGINT) AS rk, n_id, cos FROM (
        SELECT q_id, n_id, cos,
          row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rk
        FROM iscored) WHERE rk <= 3
      ORDER BY q_id, rk"""))

  /** SemDeDup under the TRAINED codebook
    * ([[graft.operators.Similarity.semanticDedupTrained]]): s07's
    * within-cluster dedup re-run on cb2's clusters — the last
    * embedding operator still running on the seed partition. Trained
    * clusters group close vectors together, so the within-cluster
    * comparison sees pairs the arbitrary seed split apart. Oracle =
    * s07's assignment/pair/keep SQL parameterized by the chain's cb2
    * CTE. */
  val s14: QueryDef = QueryDef(
    "s14_semantic_dedup_trained",
    (s, d) => Similarity.semanticDedupTrained(Tables.embeddings(s, d), K, Iters, 0.4)
      .orderBy(col("vec_id")),
    Some(s"""$chainSql,
      cc AS (SELECT cid, cv, ${DuckOps.norm2("cv")} AS cn FROM cb${Iters - 1}),
      tsc AS (SELECT vec_id, v, nrm, cid,
               ${DuckOps.dot("v", "cv")} / (sqrt(nrm) * sqrt(cn)) AS cos
             FROM nn, cc),
      tasg AS (SELECT vec_id, v, nrm, cid FROM (
               SELECT vec_id, v, nrm, cid,
                 row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rk
               FROM tsc WHERE NOT isnan(cos)) WHERE rk = 1),
      tfull AS (SELECT nn.vec_id, nn.v, nn.nrm,
                 coalesce(a.cid, CAST(-1 AS BIGINT)) AS cid
               FROM nn LEFT JOIN tasg a ON nn.vec_id = a.vec_id),
      tpr AS (SELECT b.vec_id AS d2,
               CASE WHEN a.nrm = 0 OR b.nrm = 0 THEN NULL
                 ELSE ${DuckOps.dot("a.v", "b.v")} / (sqrt(a.nrm) * sqrt(b.nrm)) END AS cos
             FROM tfull a JOIN tfull b ON a.cid = b.cid AND a.vec_id < b.vec_id),
      tlosers AS (SELECT DISTINCT d2 FROM tpr WHERE cos >= 0.4)
      SELECT vec_id, CAST(cid AS BIGINT) AS centroid,
        vec_id NOT IN (SELECT d2 FROM tlosers) AS kept
      FROM tfull ORDER BY vec_id"""))

  /** Multimodal frame-sample + REAL resample under the oracle gate
    * ([[graft.operators.Multimodal.decodeVideoFrames]] →
    * [[graft.operators.Multimodal.sampleEveryNth]] →
    * [[graft.operators.Multimodal.resizeFrames]] →
    * [[graft.operators.Multimodal.frameSums]]): every video's
    * every-5th frame, parsed from the real Y4M stream, nearest-
    * neighbor-resampled to fit 16 px, reduced to its exact luma-byte
    * sum. The oracle replays the whole chain — the stride, the
    * floor-scaled target dimensions (one IEEE divide+multiply+floor,
    * identical across engines), and EVERY RESAMPLED PIXEL via the
    * integer source-index arithmetic (dst(x,y) = src(x*sw div dw,
    * y*sh div dh)) — so the channel statistic of the transform
    * output, not just its shape, is cell-exact. Generator + pure
    * maps: zero shuffles before the final order-by. */
  val m04: QueryDef = QueryDef(
    "m04_resize_framesample",
    (s, d) => {
      val media = graft.operators.Multimodal.mediaFromDocuments(Tables.documents(s, d))
      val frames = graft.operators.Multimodal.decodeVideoFrames(media)
      graft.operators.Multimodal.frameSums(
          graft.operators.Multimodal.resizeFrames(
            graft.operators.Multimodal.sampleEveryNth(frames, 5), 16))
        .orderBy(col("media_id"), col("frame_idx"))
    },
    Some("""WITH v AS (SELECT doc_id AS media_id FROM documents WHERE doc_id % 3 = 2),
      dims AS (SELECT media_id,
          CAST(2 * (2 + media_id % 14) AS BIGINT) AS sw,
          CAST(2 * (2 + media_id % 10) AS BIGINT) AS sh,
          CAST(1 + media_id % 27 AS BIGINT) AS nf FROM v),
      r AS (SELECT *, least(1.0, 16.0 / greatest(sw, sh)) AS scale FROM dims),
      d2 AS (SELECT media_id, sw, sh, nf,
          greatest(1, CAST(floor(sw * scale) AS BIGINT)) AS dw,
          greatest(1, CAST(floor(sh * scale) AS BIGINT)) AS dh FROM r),
      fr AS (SELECT media_id, sw, sh, dw, dh,
          unnest(range(0, nf, 5)) AS frame_idx FROM d2)
      SELECT media_id, frame_idx, dw AS width, dh AS height,
        CAST(list_sum(list_transform(range(0, dw * dh), i ->
          (media_id * 17 + frame_idx * 11 +
           (((i // dw) * sh // dh) * sw + ((i % dw) * sw // dw)) * 5) % 256))
          AS BIGINT) AS luma_sum
      FROM fr ORDER BY media_id, frame_idx"""))

  /** IVF-PQ composed search ([[graft.operators.Similarity.ivfPqTopK]],
    * the IVFADC architecture of Jegou et al. PAMI 2011 §V): trained
    * coarse lists probed (s13's IVF shape), candidates scored by their
    * PQ-code RECONSTRUCTION against the full-precision query
    * (asymmetric distance), the 6-deep approximate shortlist
    * exact-re-ranked to top 3. Oracle = the s13 probe/assignment CTEs
    * + the s12 PQ-coding CTEs (both against the trained cb2) + the
    * ADC-rank/re-rank cascade — every approximate AND exact cosine
    * hash-matched, so the two-stage ranking itself (which candidates
    * survive the shortlist, in what order) is the tested artifact. */
  val s17: QueryDef = QueryDef(
    "s17_ivfpq_topk",
    (s, d) => Similarity.ivfPqTopK(Tables.embeddings(s, d), K, Iters,
      nQueries = 10, k = 3, nprobe = 2, m = 8, rerank = 6)
      .orderBy(col("q_id"), col("rk")),
    Some(s"""$chainSql
      ${pqCodeSql("z", s"cb${Iters - 1}")},
      cc AS (SELECT cid, cv, ${DuckOps.norm2("cv")} AS cn FROM cb${Iters - 1}),
      iasg AS (SELECT vec_id, v, nrm, cid AS centroid FROM (
          SELECT a.vec_id, a.v, a.nrm, c.cid,
            row_number() OVER (PARTITION BY a.vec_id
              ORDER BY ${DuckOps.dot("a.v", "c.cv")} / (sqrt(a.nrm) * sqrt(c.cn)) DESC,
                       c.cid ASC) AS rn
          FROM nn a CROSS JOIN cc c
          WHERE NOT isnan(${DuckOps.dot("a.v", "c.cv")} / (sqrt(a.nrm) * sqrt(c.cn)))) WHERE rn = 1),
      iprobes AS (SELECT q_id, qv, qn, qcentroid FROM (
          SELECT a.vec_id AS q_id, a.v AS qv, a.nrm AS qn, c.cid AS qcentroid,
            row_number() OVER (PARTITION BY a.vec_id
              ORDER BY ${DuckOps.dot("a.v", "c.cv")} / (sqrt(a.nrm) * sqrt(c.cn)) DESC,
                       c.cid ASC) AS rn
          FROM nn a CROSS JOIN cc c WHERE a.vec_id < 10
            AND NOT isnan(${DuckOps.dot("a.v", "c.cv")} / (sqrt(a.nrm) * sqrt(c.cn)))) WHERE rn <= 2),
      adc AS (SELECT p.q_id, s.vec_id AS n_id,
          CASE WHEN p.qn = 0 OR ${DuckOps.norm2("r.vr")} = 0 THEN NULL
            ELSE ${DuckOps.dot("p.qv", "r.vr")} /
              (sqrt(p.qn) * sqrt(${DuckOps.norm2("r.vr")})) END AS adc
        FROM iprobes p
        JOIN iasg s ON p.qcentroid = s.centroid AND s.vec_id <> p.q_id
        JOIN prz r ON r.vec_id = s.vec_id),
      short AS (SELECT q_id, n_id, adc FROM (
          SELECT q_id, n_id, adc,
            row_number() OVER (PARTITION BY q_id
              ORDER BY adc DESC NULLS LAST, n_id ASC) AS ark
          FROM adc) WHERE ark <= 6),
      ex AS (SELECT t.q_id, t.n_id, t.adc,
          CASE WHEN q.nrm = 0 OR n.nrm = 0 THEN NULL
            ELSE ${DuckOps.dot("q.v", "n.v")} / (sqrt(q.nrm) * sqrt(n.nrm)) END AS cos
        FROM short t
        JOIN nn n ON t.n_id = n.vec_id
        JOIN nn q ON t.q_id = q.vec_id)
      SELECT q_id, CAST(rk AS BIGINT) AS rk, n_id, adc, cos FROM (
        SELECT q_id, n_id, adc, cos,
          row_number() OVER (PARTITION BY q_id
            ORDER BY cos DESC NULLS LAST, n_id ASC) AS rk
        FROM ex) WHERE rk <= 3
      ORDER BY q_id, rk"""))

  private[queries] val BpeSteps = 8 // greedy merge rounds for t13

  /** merge `k` applied to symbol table `from` (carried columns
    * preserved via `t.* REPLACE`): the single shared greedy-fold
    * lambda every BPE oracle replays — one copy, so t14/t15/p13 can
    * never drift apart. The correlated `m.l`/`m.r` is the oracle's
    * analog of the Spark side's driver-spliced literals. LEFT JOIN ON
    * TRUE is load-bearing: if training EXHAUSTS pairs before step k,
    * `m$k` is empty and a cross join would wipe this table and every
    * later round — the LEFT JOIN leaves it unchanged instead, matching
    * the Spark operators' early-stop (they apply only the merges that
    * exist). */
  private[queries] def bpeApplySql(name: String, from: String, k: Int): String =
    s""",
      $name AS (SELECT t.* REPLACE (CASE WHEN m.l IS NULL THEN syms
                 ELSE list_reduce(list_transform(syms, s -> [s]),
                   (acc, x) -> CASE WHEN acc[-1] = m.l AND x[1] = m.r
                     THEN acc[1:len(acc) - 1] || [m.l || m.r]
                     ELSE acc || x END) END AS syms)
               FROM $from t LEFT JOIN m$k m ON TRUE)"""

  /** round `k`'s pair count + top-1 CTEs over symbol table b{k-1};
    * appends the merge-applied b{k} only when another round follows. */
  private[queries] def bpeStepSql(k: Int, last: Boolean): String = {
    val apply = if (last) "" else bpeApplySql(s"b$k", s"b${k - 1}", k)
    s""",
      p$k AS (SELECT unnest(list_transform(range(1, len(syms)),
               i -> {'l': syms[i], 'r': syms[i + 1]})) AS pr
             FROM b${k - 1}),
      c$k AS (SELECT pr.l AS l, pr.r AS r, count(*) AS n FROM p$k GROUP BY 1, 2),
      m$k AS (SELECT l, r, n FROM c$k ORDER BY n DESC, l, r LIMIT 1)$apply"""
  }

  /** the token-instance symbol tables the BPE oracles unroll from
    * (instance-level on the DuckDB side; the Spark side trains on the
    * weighted distinct-token table — identical counts by
    * construction). */
  private[queries] val bpePrefixSql: String =
    s"""WITH tok AS (SELECT unnest(${DuckOps.tokens("text")}) AS t FROM documents),
      b0 AS (SELECT list_transform(range(1, length(t) + 1),
               i -> substr(t, i, 1)) AS syms
             FROM tok WHERE length(t) >= 2)"""

  /** Iterated BPE vocabulary training
    * ([[graft.operators.Bpe.trainMerges]]): the full merge table after
    * `BpeSteps` greedy rounds. t12 pinned round 1's pair counts; this
    * pins the LOOP — each round's winner depends on every previous
    * merge apply, so a single hash-matched table proves the per-round
    * count/rank/apply all agree with the oracle's replay. The oracle
    * unrolls the loop exactly as the k-means chain does (t12's CTE
    * iterated): adjacent-pair count, (n DESC, l, r) top-1, greedy
    * left-to-right fold via list_reduce over singleton lists (DuckDB's
    * reduce seeds from the first element; Spark's seeds from empty —
    * identical semantics since the guard only fires with a non-empty
    * accumulator). */
  val t13: QueryDef = QueryDef(
    "t13_bpe_train",
    (s, d) => Bpe.trainMerges(Tables.documents(s, d), "text", BpeSteps)
      .orderBy(col("step")),
    Some {
      val steps = (1 to BpeSteps)
        .map(k => bpeStepSql(k, last = k == BpeSteps)).mkString
      val out = (1 to BpeSteps)
        .map(k => s"SELECT CAST($k AS BIGINT) AS step, l, r, n FROM m$k")
        .mkString("\n      UNION ALL ")
      s"""$bpePrefixSql$steps
      SELECT * FROM (
      $out) ORDER BY step"""
    })

  /** The tokenizer-APPLY step ([[graft.operators.Bpe.vocabAfterTraining]]):
    * encode the corpus under the t13 merge table and emit the top-20
    * vocabulary occupancy — which learned subword units carry the
    * token mass. The oracle replays the full chain with every merge
    * APPLIED (b8 exists, unlike t13 which stops at m8) and counts
    * symbols over the encoded instances; the Spark side encodes the
    * weighted distinct-token table — identical counts, corpus touched
    * twice total (train + the shared freq aggregation). */
  val t14: QueryDef = QueryDef(
    "t14_bpe_vocab",
    (s, d) => Bpe.vocabAfterTraining(Tables.documents(s, d), "text", BpeSteps, 20),
    Some {
      val steps = (1 to BpeSteps).map(k => bpeStepSql(k, last = false)).mkString
      s"""$bpePrefixSql$steps,
      v AS (SELECT unnest(syms) AS sym FROM b$BpeSteps)
      SELECT sym, count(*) AS n FROM v
      GROUP BY sym ORDER BY n DESC, sym LIMIT 20"""
    })

  /** Corpus-scale tokenizer ENCODE ([[graft.operators.Bpe.encodeDocs]],
    * the native `graft_bpe_apply` expression): every document's
    * subword sequence under the t13 merge table, summarized per doc
    * (subword count, distinct-subword count, head subword — the
    * row-set a packing stage consumes, reduced to hash-checkable
    * scalars). Unlike training, 1-char tokens pass through. The
    * oracle replays training (m1..m8), then re-applies each merge to
    * per-(doc, token-position) rows — single-level lambdas only — and
    * reassembles documents by token position; docs with no tokens
    * come back via the LEFT JOIN with zero counts. */
  val t15: QueryDef = QueryDef(
    "t15_bpe_encode",
    (s, d) => Bpe.encodeDocs(Tables.documents(s, d), "text", BpeSteps)
      .selectExpr("doc_id",
        "cast(size(subwords) as bigint) AS n_subwords",
        "cast(size(array_distinct(subwords)) as bigint) AS n_distinct",
        "try_element_at(subwords, 1) AS head_sym")
      .orderBy(col("doc_id")),
    Some {
      val steps = (1 to BpeSteps)
        .map(k => bpeStepSql(k, last = k == BpeSteps)).mkString
      val applies = (1 to BpeSteps)
        .map(k => bpeApplySql(s"x$k", s"x${k - 1}", k)).mkString
      s"""$bpePrefixSql$steps,
      t0 AS (SELECT doc_id, ${DuckOps.tokens("text")} AS tl FROM documents),
      x0 AS (SELECT doc_id, i,
               list_transform(range(1, length(tl[i]) + 1), q -> substr(tl[i], q, 1)) AS syms
             FROM t0, unnest(range(1, len(tl) + 1)) AS u(i))$applies,
      enc AS (SELECT doc_id, flatten(list(syms ORDER BY i)) AS sub
              FROM x$BpeSteps GROUP BY doc_id)
      SELECT d.doc_id,
        CAST(coalesce(len(e.sub), 0) AS BIGINT) AS n_subwords,
        CAST(coalesce(len(list_distinct(e.sub)), 0) AS BIGINT) AS n_distinct,
        e.sub[1] AS head_sym
      FROM documents d LEFT JOIN enc e ON d.doc_id = e.doc_id
      ORDER BY d.doc_id"""
    })

  /** END-TO-END pipeline composition: context-window packing (p03's
    * operator) driven by the TRAINED tokenizer's real subword counts
    * (t15's encode) instead of whitespace token counts — train the
    * tokenizer, encode the corpus, pack to a 512-subword budget per
    * language. One corpus pass for sizes (pure projection), one hash
    * shuffle for the packing sort, O(1) packing state — the full
    * pretraining-prep chain as a single hash-checked surface. */
  val p13: QueryDef = QueryDef(
    "p13_pack_subwords",
    (s, d) => {
      val sized = Bpe.encodeDocs(Tables.documents(s, d), "text", BpeSteps)
        .selectExpr("lang", "doc_id", "cast(size(subwords) as bigint) AS n_subwords")
      Packing.packGreedy(sized, "lang", "doc_id", "n_subwords", budget = 512L)
        .orderBy(col("doc_id"))
    },
    Some {
      val steps = (1 to BpeSteps)
        .map(k => bpeStepSql(k, last = k == BpeSteps)).mkString
      val applies = (1 to BpeSteps)
        .map(k => bpeApplySql(s"x$k", s"x${k - 1}", k)).mkString
      s"""WITH RECURSIVE ${bpePrefixSql.stripPrefix("WITH ")}$steps,
      t0 AS (SELECT doc_id, ${DuckOps.tokens("text")} AS tl FROM documents),
      x0 AS (SELECT doc_id, i,
               list_transform(range(1, length(tl[i]) + 1), q -> substr(tl[i], q, 1)) AS syms
             FROM t0, unnest(range(1, len(tl) + 1)) AS u(i))$applies,
      enc AS (SELECT doc_id, flatten(list(syms ORDER BY i)) AS sub
              FROM x$BpeSteps GROUP BY doc_id),
      ordered AS MATERIALIZED (
        -- MATERIALIZED is load-bearing: the recursive term below
        -- references `ordered`, and without it DuckDB re-inlines (and
        -- re-evaluates) the whole BPE-encode chain on every recursion
        -- step — measured minutes vs 5 s materialized
        SELECT d.lang, d.doc_id,
          CAST(coalesce(len(e.sub), 0) AS BIGINT) AS n_subwords,
          row_number() OVER (PARTITION BY d.lang ORDER BY d.doc_id) AS rn
        FROM documents d LEFT JOIN enc e ON d.doc_id = e.doc_id),
      packed AS (
        SELECT lang, doc_id, n_subwords, rn, CAST(0 AS BIGINT) AS bin_id,
          n_subwords AS fill_after
        FROM ordered WHERE rn = 1
        UNION ALL
        SELECT o.lang, o.doc_id, o.n_subwords, o.rn,
          CASE WHEN p.fill_after + o.n_subwords > 512 THEN p.bin_id + 1 ELSE p.bin_id END,
          CASE WHEN p.fill_after + o.n_subwords > 512 THEN o.n_subwords
               ELSE p.fill_after + o.n_subwords END
        FROM packed p JOIN ordered o ON o.lang = p.lang AND o.rn = p.rn + 1)
      SELECT lang, doc_id, n_subwords, bin_id, fill_after
      FROM packed ORDER BY doc_id"""
    })
}
