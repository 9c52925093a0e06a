package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (Array[Float]).
  *
  * Scale design: the brute-force path is O(|Q|·N) with the query side
  * broadcast — correct baseline, fine when |Q| is small; the LSH path
  * buckets vectors by 16 random-hyperplane sign bits so the join is a
  * bucket equi-join (shuffle on bucket id), the 100 TB-friendly plan.
  * All hyperplane weights are deterministic integer mixes so the
  * DuckDB oracle reproduces results exactly.
  */
object Similarity {

  /** vec_id, v (DOUBLE array), nrm (squared L2 norm, left-fold —
    * `graft_dot(v, v)` accumulates x*x in element order, bit-identical
    * to the aggregate() fold and the DuckDB oracle). */
  def prepared(emb: DataFrame): DataFrame =
    // NO parallelFloor here: the k-means/centroid family evaluates
    // this lineage once per training iteration and collects O(k)
    // rows - an extra exchange per iteration was measured to COST
    // the family ~+0.2-0.7 s/query (s06/s10-s15 in the round-16
    // sweep). The floor sits instead at the brute-scoring entries
    // (quantizeInt8, cosineTopKFor, semanticDedupLargeK) whose q x N
    // per-row work dominates it.
    emb.selectExpr("vec_id", "label", "transform(embedding, x -> cast(x as double)) AS v")
      .selectExpr("vec_id", "label", "v", "graft_dot(v, v) AS nrm")

  /** cosine between columns %1/%2 given norm columns %3/%4 (left-fold
    * dot via the native [[graft.functions.DotProduct]] loop, one
    * division), with NULL-on-zero-norm semantics ("no similarity
    * evidence"): a zero-norm operand yields NULL, not an ANSI
    * DIVIDE_BY_ZERO crash — NULL fails every `cos >= tau` drop test
    * (degenerate vectors are never deduplicated away) and ranks after
    * every real cosine in the top-k windows (Spark DESC default,
    * NULLS LAST). Non-degenerate inputs take the exact IEEE path the
    * oracles replay. */
  val cosExpr: String =
    "if(%3$s = 0d or %4$s = 0d, cast(null as double), " +
      "graft_dot(%1$s, %2$s) / (sqrt(%3$s) * sqrt(%4$s)))"

  /** Brute-force exact top-k neighbors for each query vector
    * (queries = vec_id < nQueries), ranked by cosine desc. */
  def cosineTopK(emb: DataFrame, nQueries: Int, k: Int): DataFrame =
    cosineTopKFor(emb, s"vec_id < $nQueries", k)

  /** [[cosineTopK]] for an ARBITRARY query predicate over `vec_id`
    * (the fused-retrieval entry point: pick the same query set the
    * keyword side uses). Queries broadcast against the corpus —
    * brute-force exact baseline by design; swap in [[ivfTopK]] /
    * [[lshTopK]] at scale. */
  def cosineTopKFor(emb: DataFrame, queryPredicate: String, k: Int): DataFrame = {
    // parallelFloor: brute q x N cosine scoring (measured s21/s32
    // -0.23/-0.35 s at bench scale; no-op on a real multi-split scan)
    val p = Storage.parallelFloor(prepared(emb).select("vec_id", "v", "nrm"))
    val q = p.filter(expr(queryPredicate))
      .withColumnRenamed("vec_id", "q_id")
      .withColumnRenamed("v", "qv").withColumnRenamed("nrm", "qn")
    val scored = broadcast(q).join(p, col("vec_id") =!= col("q_id"))
      .selectExpr("q_id", "vec_id AS n_id",
        cosExpr.format("qv", "v", "qn", "nrm") + " AS cos")
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id").asc)
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("q_id"), col("rk").cast("long").as("rk"), col("n_id"), col("cos"))
  }

  /** k-NN majority-vote classification — label propagation for weak
    * supervision: each query point (selected by `queryPredicate`)
    * takes the modal label of its k exact-cosine nearest neighbors
    * (ties: smaller label wins), reported against its own label so
    * the result doubles as a leave-one-out accuracy audit. Candidate
    * generation is [[cosineTopKFor]] verbatim (swap [[ivfTopK]] at
    * scale); the vote is a (q_id, label) partial agg over q·k rows
    * plus a window over ≤ |labels| rows per query.
    *
    * 100 TB shape: the only corpus-sized frame is the label join, an
    * equi-join of the corpus against the q·k top-k frame — everything
    * downstream is O(queries). The top-k side carries NO broadcast
    * hint: when `queryPredicate` selects a constant fraction of the
    * corpus (s21 takes every 7th vector) q·k scales WITH the corpus
    * and a forced driver broadcast would OOM at 100 TB — AQE picks
    * broadcast from the measured shuffle size when the frame is
    * actually small, and falls back to a shuffled join when it
    * isn't. */
  def knnClassify(emb: DataFrame, queryPredicate: String, k: Int): DataFrame = {
    val labels = emb.selectExpr("vec_id", "cast(label as long) AS label")
    val top = cosineTopKFor(emb, queryPredicate, k)
      .select(col("q_id"), col("n_id"))
    val votes = labels.withColumnRenamed("vec_id", "n_id")
      .join(top, Seq("n_id"))
      .groupBy(col("q_id"), col("label")).agg(count(lit(1)).as("n_votes"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("n_votes").desc, col("label").asc)
    votes.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .withColumnRenamed("label", "pred_label")
      .join(labels.withColumnRenamed("vec_id", "q_id")
        .withColumnRenamed("label", "actual"), Seq("q_id"))
      .selectExpr("q_id", "pred_label", "n_votes", "actual",
        "(pred_label = actual) AS correct")
  }

  /** Maximal-marginal-relevance re-rank (Carbonell & Goldstein,
    * SIGIR 1998, public method): from each query's `pool`-sized
    * relevance candidates, greedily select `k` results maximizing
    * `λ·rel(d) − (1−λ)·max_{s∈selected} sim(d, s)` — relevance traded
    * against redundancy, the diversification layer a retrieval stack
    * puts after its top-k.
    *
    * Determinism contract: relevance and pairwise similarity are
    * micro-quantized immediately (`round(cos·1e6)` — ONE
    * correctly-rounded IEEE op each, the p16 discipline), and the MMR
    * score stays an UNDIVIDED p12 integer
    * `λ_micro·rel_micro − (1e6−λ_micro)·maxsim_micro` — scores can go
    * negative, and Spark's `div` truncates toward zero while DuckDB's
    * `//` floors, so the contract is: never divide. Ties break on
    * n_id asc.
    *
    * 100 TB shape: candidates come from any top-k generator (brute
    * baseline here; swap [[ivfTopK]] at scale), so every later frame
    * is O(queries·pool) keyed by q_id — pairwise sims are a per-query
    * pool self-join (pool², bounded by the pool parameter, never by
    * the corpus), each selection round is one window + one equi-join.
    * The driver holds only the loop counter. EAGER; release the
    * result via [[Storage.release]]. */
  def mmrRerank(emb: DataFrame, queryPredicate: String, pool: Int, k: Int,
      lambdaMicro: Long): DataFrame = {
    require(pool >= 1, s"pool must be >= 1, got $pool")
    require(k >= 1 && k <= pool, s"k must be in [1, pool], got $k")
    require(lambdaMicro >= 0L && lambdaMicro <= 1000000L,
      s"lambdaMicro must be in [0, 1e6], got $lambdaMicro")
    val p = prepared(emb).select("vec_id", "v", "nrm")
    val cand = Storage.checkpointed(
      cosineTopKFor(emb, queryPredicate, pool)
        .selectExpr("q_id", "n_id", "cast(round(cos * 1000000) as bigint) AS rel_micro"))
    var sims: DataFrame = null
    try {
      // ONE corpus scan for the pairwise-sim vectors: prune `p` to the
      // distinct candidate ids first (a broadcast semi-join against an
      // O(queries·pool) id set), then self-join the tiny pruned frame
      // — the corpus is never scanned twice and the pool² blow-up
      // happens on O(queries·pool) rows only
      val pv = Storage.checkpointed(p.join(
        broadcast(cand.select(col("n_id").as("vec_id")).distinct()), Seq("vec_id")))
      try {
        val ca = cand.select(col("q_id"), col("n_id").as("a"))
          .join(pv.select(col("vec_id").as("a"), col("v").as("av"), col("nrm").as("an")),
            Seq("a"))
        val cb = cand.select(col("q_id"), col("n_id").as("b"))
          .join(pv.select(col("vec_id").as("b"), col("v").as("bv"), col("nrm").as("bn")),
            Seq("b"))
        sims = Storage.checkpointed(
          ca.join(cb, Seq("q_id")).filter(col("a") < col("b"))
            .selectExpr("q_id", "a", "b",
              s"cast(round((${cosExpr.format("av", "bv", "an", "bn")}) * 1000000) as bigint)" +
                " AS sim_micro"))
      } finally Storage.release(pv)
      val simsSym = sims.select(col("q_id"), col("a"), col("b"), col("sim_micro"))
        .union(sims.select(col("q_id"), col("b").as("a"), col("a").as("b"),
          col("sim_micro")))
      val oneMinus = 1000000L - lambdaMicro
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("score_p12").desc, col("n_id").asc)
      // round 1 is pure relevance (nothing selected yet, maxsim = 0)
      var result = cand
        .selectExpr("q_id", "n_id", "rel_micro", "0L AS ms_micro",
          s"${lambdaMicro}L * rel_micro AS score_p12")
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .selectExpr("q_id", "n_id", "rel_micro", "ms_micro", "score_p12", "1L AS rank")
      var round = 2
      while (round <= k) {
        val selIds = result.select(col("q_id"), col("n_id").as("b"))
        val rem = cand.join(result.select(col("q_id"), col("n_id")),
          Seq("q_id", "n_id"), "left_anti")
        val ms = simsSym.join(selIds, Seq("q_id", "b"))
          .groupBy(col("q_id"), col("a"))
          .agg(max(col("sim_micro")).as("ms_micro"))
          .withColumnRenamed("a", "n_id")
        val next = rem.join(ms, Seq("q_id", "n_id"))
          .selectExpr("q_id", "n_id", "rel_micro", "ms_micro",
            s"${lambdaMicro}L * rel_micro - ${oneMinus}L * ms_micro AS score_p12")
          .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .selectExpr("q_id", "n_id", "rel_micro", "ms_micro", "score_p12",
            s"${round}L AS rank")
        result = result.unionByName(next)
        round += 1
      }
      Storage.checkpointed(
        result.select(col("q_id"), col("rank"), col("n_id"), col("rel_micro"),
          col("ms_micro"), col("score_p12")))
    } finally {
      Storage.release(cand)
      if (sims != null) Storage.release(sims)
    }
  }

  /** Deterministic pseudo-random hyperplane weight for (plane p 0-based,
    * dim d 1-based): integer mix centered near 0. */
  val planeWeight: String =
    "(((p * 64 + d) * 2654435761) % 1000000007 - 500000000)"

  /** Number of LSH hyperplanes: 6 bits => 64 buckets. Sized so buckets
    * hold a few candidates at small SF while still cutting the join
    * fan-out ~64x at scale; raise for larger corpora. */
  val NPlanes = 6

  /** hyperplane-LSH bucket id (nPlanes sign bits) for a DOUBLE-array
    * column v — native [[graft.functions.LshBucket]] expression. */
  def lshBucketExpr(v: String, nPlanes: Int = NPlanes): String =
    s"graft_lsh_bucket($v, $nPlanes)"

  /** ANN via hyperplane LSH: candidates share the full 16-bit bucket;
    * exact cosine re-rank, top-k per query. Approximate-by-design but
    * fully deterministic (oracle replicates the same buckets). */
  def lshTopK(emb: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val p = prepared(emb).selectExpr("vec_id", "v", "nrm", s"${lshBucketExpr("v")} AS bucket")
    val q = p.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("bucket").as("qbucket"))
    val scored = broadcast(q)
      .join(p, col("qbucket") === col("bucket") && col("vec_id") =!= col("q_id"))
      .selectExpr("q_id", "vec_id AS n_id",
        cosExpr.format("qv", "v", "qn", "nrm") + " AS cos")
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id").asc)
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("q_id"), col("rk").cast("long").as("rk"), col("n_id"), col("cos"))
  }

  /** IVF-style ANN: coarse quantization with a FIXED number of
    * deterministic centroids (the `kCentroids` lowest vec_ids),
    * `nprobe` probed lists, exact re-rank. The 100 TB shape:
    * assignment is a broadcast argmax (pure map) over O(kCentroids)
    * driver/broadcast state — constant in N, unlike a modulo sample —
    * and the candidate join is an equi-join on centroid id, so list
    * sizes bound the fan-out. Fully deterministic (exact-double
    * cosines, ties broken by id) so the DuckDB oracle matches. */
  /** executor-side cosine (while-loop fold, same element order as
    * [[graft.functions.DotProduct]] and the DuckDB oracle's
    * list_reduce fold — bit-identical). */
  private def cos(v: Array[Double], nv: Double, w: Array[Double], nw: Double): Double = {
    var dot = 0.0
    var i = 0
    while (i < v.length) { dot += v(i) * w(i); i += 1 }
    dot / (math.sqrt(nv) * math.sqrt(nw))
  }

  /** nearest centroid by cosine; strictly-greater keeps the smallest
    * centroid id on ties, matching the oracle's (cos DESC, cid) rank.
    * No longer on the assignment hot path (the native
    * [[graft.functions.CentroidRanks]] expression is) — retained as
    * the executable semantic contract the CentroidExprsSpec parity
    * fuzz checks the expression against, NaN/zero-norm cases
    * included. */
  private[graft] def nearestCentroid(v: Array[Double], nrm: Double,
      cents: Array[(Long, Array[Double], Double)]): Long = {
    var bestId = -1L
    var bestCos = Double.NegativeInfinity
    cents.foreach { case (cid, cv, cn) =>
      val c = cos(v, nrm, cv, cn)
      if (c > bestCos) { bestCos = c; bestId = cid }
    }
    bestId
  }

  /** The FIXED deterministic codebook every coarse-quantization
    * operator here shares: the vectors with `vec_id < k` (= the k
    * lowest ids on the contiguous-id test corpora; a real deployment
    * trains these on a sample). UNTYPED filter so the predicate pushes
    * into the parquet scan — fetching k rows must not cost a full
    * corpus deserialization pass. Throws when the id range holds no
    * vectors rather than letting every downstream argmin index -1. */
  private def fixedCodebook(emb: DataFrame, k: Int): Array[(Long, Array[Double], Double)] = {
    val spark = emb.sparkSession
    import spark.implicits._
    val cb = prepared(emb).filter(col("vec_id") < k)
      .select("vec_id", "v", "nrm").as[(Long, Seq[Double], Double)]
      .collect().sortBy(_._1)
      .map { case (id, v, n) => (id, v.toArray, n) }
    require(cb.nonEmpty,
      s"no vectors with vec_id < $k — the deterministic codebook needs the low-id range populated")
    cb
  }

  /** The codebook as three foldable literal Columns —
    * (cents ARRAY<ARRAY<DOUBLE>>, cnorms ARRAY<DOUBLE>,
    * ids ARRAY<BIGINT>) — the plan-time state the native
    * [[graft.functions.CentroidRanks]] / [[graft.functions.PqEncode]]
    * expressions unpack once per plan. O(k·D) constants riding the
    * serialized plan: fine up to ~10^6 doubles (the 50k-cluster/768-dim
    * SemDeDup regime should instead switch the assignment to a
    * broadcast-join + window-argmin form — the literal is the
    * SMALL-codebook fast path, which is every codebook here). */
  private def codebookCols(
      cb: Array[(Long, Array[Double], Double)]): (Column, Column, Column) =
    (typedLit(cb.map(_._2.toSeq).toSeq),
      typedLit(cb.map(_._3).toSeq),
      typedLit(cb.map(_._1).toSeq))

  /** Coarse quantization: every vector labeled with its nearest of the
    * `kCentroids` FIXED deterministic centroids ([[fixedCodebook]]).
    * The 100 TB shape behind both IVF search and the k-means update:
    * O(kCentroids) plan-literal state — constant in N — and the
    * assignment itself is a pure columnar projection through the
    * native [[graft.functions.CentroidRanks]] expression (no
    * Serialize/DeserializeToObject barrier: the earlier typed-lambda
    * `Dataset.map` round-tripped every corpus vector
    * Tungsten→JVM→Tungsten). Returns (vec_id, v, nrm, centroid). */
  def assignCentroids(emb: DataFrame, kCentroids: Int): DataFrame =
    assignTo(prepared(emb).select("vec_id", "v", "nrm"),
      fixedCodebook(emb, kCentroids))

  /** The plan-literal codebook ceiling: past ~10^6 doubles the
    * serialized plan (and every task closure carrying it) stops being
    * "free broadcast state" — the 50k-cluster/768-dim SemDeDup regime
    * is ~4e7 doubles. [[assignTo]] auto-switches to the join-based
    * assignment above this. */
  val LiteralCodebookMaxDoubles: Long = 1000000L

  /** the auto-dispatch decision, pinned by SimilaritySpec: literal
    * fast path up to [[LiteralCodebookMaxDoubles]], join path above. */
  private[graft] def useJoinAssign(k: Int, dim: Int): Boolean =
    k.toLong * dim.toLong > LiteralCodebookMaxDoubles

  /** [[assignCentroids]] against an EXPLICIT codebook — the entry
    * point [[kmeansTrain]]ed centroids feed back through. `p` must
    * carry (vec_id, v, nrm). A vector whose every cosine is NaN
    * (zero-norm input) gets centroid -1, the closure-semantics
    * contract ([[nearestCentroid]]). Auto-selects the physical form:
    * the plan-literal columnar projection ([[assignToLiteral]], zero
    * shuffle) for codebooks up to [[LiteralCodebookMaxDoubles]], the
    * broadcast-join + argmax aggregation ([[assignToJoin]]) above —
    * both produce identical assignments (parity-fuzzed in
    * SimilaritySpec, NaN/zero-norm cases included). */
  private[graft] def assignTo(p: DataFrame,
      cb: Array[(Long, Array[Double], Double)]): DataFrame =
    if (useJoinAssign(cb.length, cb.headOption.map(_._2.length).getOrElse(0)))
      assignToJoin(p, cb)
    else assignToLiteral(p, cb)

  /** small-codebook fast path: pure columnar projection through the
    * native [[graft.functions.CentroidRanks]] expression — zero
    * shuffle, no Serialize/DeserializeToObject barrier. */
  private[graft] def assignToLiteral(p: DataFrame,
      cb: Array[(Long, Array[Double], Double)]): DataFrame = {
    val (cents, cnorms, ids) = codebookCols(cb)
    p.withColumn("__rk",
        call_function("graft_centroid_ranks", col("v"), cents, cnorms))
      // try_element_at: an all-NaN ranking is EMPTY (ANSI element_at
      // would throw); the null propagates through the id lookup into
      // the -1 coalesce
      .withColumn("centroid",
        coalesce(try_element_at(ids, try_element_at(col("__rk"), lit(1)).cast("int") + 1),
          lit(-1L)))
      .select(col("vec_id"), col("v"), col("nrm"), col("centroid"))
  }

  /** LARGE-codebook assignment: the codebook travels as a broadcast
    * DataFrame instead of a plan literal. Each vector explodes to k
    * candidate positions, meets its centroid through a broadcast HASH
    * equi-join on the position (never a nested-loop scan), and the
    * argmax collapses in ONE partially-aggregated shuffle:
    * `max(struct(cos, -cid))` ranks (cos DESC, cid ASC) — identical
    * to the literal path's (cos DESC, pos ASC) because the codebook
    * is id-sorted — and the `when(!isnan(..))` guard turns NaN scores
    * into NULLs the max ignores, so an all-NaN (zero-norm) vector
    * coalesces to the same -1 the closure contract demands. The
    * score is `try_divide(dot, sqrt(nrm) * sqrt(cn))` (ANSI-safe):
    * a zero norm NULLs the score, which matches the literal path
    * exactly — a zero-norm operand forces dot = 0, so the literal
    * path's cosine is 0/0 = NaN there, and NaN is skipped just as
    * the max skips NULL.
    *
    * Cost vs the literal path: one shuffle of N pre-combined rows
    * (map-side max leaves one row per vector per task) instead of
    * zero — the price of unbounded k. The N·k scoring work is
    * identical in both forms. */
  private[graft] def assignToJoin(p: DataFrame,
      cb: Array[(Long, Array[Double], Double)]): DataFrame = {
    val spark = p.sparkSession
    import spark.implicits._
    val cbDf = cb.zipWithIndex.map { case ((id, v, n), i) => (i, id, v.toSeq, n) }
      .toSeq.toDF("__pos", "cid", "cv", "cn")
    p.select(col("vec_id"), col("v"), col("nrm"),
        explode(sequence(lit(0), lit(cb.length - 1))).as("__pos"))
      .join(broadcast(cbDf), Seq("__pos"))
      .select(col("vec_id"), col("v"), col("nrm"), col("cid"),
        expr("try_divide(graft_dot(v, cv), sqrt(nrm) * sqrt(cn))").as("__cos"))
      .groupBy(col("vec_id"))
      // the guard must test NULL explicitly: isnan(NULL) is FALSE in
      // Spark, so a bare !isnan would let a NULL score into the
      // struct-max, where (NULL, neg) structs compare on neg alone
      .agg(first(col("v")).as("v"), first(col("nrm")).as("nrm"),
        max(when(col("__cos").isNotNull && !isnan(col("__cos")),
          struct(col("__cos"), (-col("cid")).as("neg")))).as("__m"))
      .select(col("vec_id"), col("v"), col("nrm"),
        coalesce(-col("__m.neg"), lit(-1L)).as("centroid"))
  }

  /** One k-means (Lloyd) centroid-update step over the
    * [[assignCentroids]] partition: per (centroid, dimension), the
    * member count and the exact-integer mean of the micro-quantized
    * coordinates (round(x*1e6) per element is a single IEEE op —
    * bit-identical across engines; the BIGINT sum is then
    * order-insensitive, so the distributed aggregation is
    * deterministic where a raw double mean would not be). 100 TB
    * shape: assignment is the broadcast map pass; the explode
    * multiplies rows by D but partial (map-side) aggregation combines
    * down to kCentroids*D groups per task before the one shuffle.
    * `div` truncates toward zero in Spark; the oracle decomposes
    * DuckDB's floor `//` by sign to match. */
  def kmeansUpdate(emb: DataFrame, kCentroids: Int): DataFrame =
    updateTable(prepared(emb).select("vec_id", "v", "nrm"),
      fixedCodebook(emb, kCentroids))

  /** The Lloyd-update aggregation against an EXPLICIT codebook —
    * shared by [[kmeansUpdate]] (one public step) and the
    * [[kmeansTrain]] loop. */
  private def updateTable(p: DataFrame,
      cb: Array[(Long, Array[Double], Double)]): DataFrame =
    assignTo(p, cb)
      // a zero-norm vector is UNASSIGNABLE (centroid -1, the closure
      // contract) — it belongs to no cluster and must not perturb any
      // cluster mean; the oracles replay this by ranking over non-NaN
      // cosines only
      .filter(col("centroid") =!= -1L)
      .selectExpr("centroid", "posexplode(v) AS (d0, x)")
      .selectExpr("centroid", "cast(d0 + 1 as bigint) AS dim",
        "cast(round(x * 1000000) as bigint) AS xm")
      .groupBy(col("centroid"), col("dim"))
      .agg(count(lit(1)).as("n_members"), sum(col("xm")).as("sum_micro"))
      .selectExpr("cast(centroid as bigint) AS centroid", "dim",
        "cast(n_members as bigint) AS n_members",
        "sum_micro div n_members AS mean_micro")

  /** `steps` Lloyd iterations applied to the [[fixedCodebook]] seed:
    * assign (native columnar argmax) → exact-integer micro-mean →
    * rebuild centroid vectors on the driver (`mean_micro / 1e6`, one
    * IEEE division per coordinate — bit-identical across engines).
    * A cluster that loses every member keeps its previous centroid
    * (the standard empty-cluster rule). Centroid ids stay the seed
    * ids, and the codebook stays id-sorted, so position order keeps
    * equalling ascending-cid order for the rank tie-break.
    *
    * 100 TB shape: each step is one columnar assignment pass + one
    * partially-aggregated shuffle down to k·D groups; the driver
    * holds only the O(k·D) codebook — the same state every
    * coarse-quantization operator here already broadcasts. Loop
    * count is a fixed small constant (the driver-side loop holds no
    * per-row state, the c01 discipline). */
  private[graft] def trainedCodebook(emb: DataFrame, k: Int,
      steps: Int): Array[(Long, Array[Double], Double)] = {
    val p = prepared(emb).select("vec_id", "v", "nrm")
    var cb = fixedCodebook(emb, k)
    var s = 0
    while (s < steps) {
      val upd = updateTable(p, cb).select("centroid", "dim", "mean_micro")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1).toInt, r.getLong(2)))
      val byCid = upd.groupBy(_._1)
      cb = cb.map { case (cid, oldV, oldN) =>
        byCid.get(cid) match {
          case Some(rows) =>
            val nv = new Array[Double](oldV.length)
            rows.foreach { case (_, dim, mm) => nv(dim - 1) = mm / 1000000.0 }
            var n2 = 0.0
            var i = 0
            while (i < nv.length) { n2 += nv(i) * nv(i); i += 1 }
            (cid, nv, n2)
          case None => (cid, oldV, oldN)
        }
      }
      s += 1
    }
    cb
  }

  /** Iterated k-means training surfaced as a query: the `iters`-th
    * Lloyd update table — per (centroid, dim), member count and
    * micro-quantized mean — after `iters - 1` driver-fed-back steps
    * from the deterministic seed. Deterministic end to end (the
    * oracle replays the whole iteration chain as an unrolled CTE
    * cascade), which is what lets the TRAINING loop itself be
    * hash-checked, not just one step. */
  def kmeansTrain(emb: DataFrame, k: Int, iters: Int): DataFrame = {
    require(iters >= 1, s"kmeansTrain needs iters >= 1, got $iters")
    updateTable(prepared(emb).select("vec_id", "v", "nrm"),
      trainedCodebook(emb, k, iters - 1))
  }

  /** Per-vector cosine to the assigned centroid of `cb` — the
    * k-means objective surface. Vectors with no assignable centroid
    * (all-NaN cosines, centroid -1) drop out of the inner join. */
  private def assignmentCos(p: DataFrame,
      cb: Array[(Long, Array[Double], Double)]): DataFrame = {
    val spark = p.sparkSession
    import spark.implicits._
    val cbDf = cb.toSeq.map { case (id, v, n) => (id, v.toSeq, n) }
      .toDF("cid", "cv", "cn")
    assignTo(p, cb).join(broadcast(cbDf), col("centroid") === col("cid"))
      .selectExpr("vec_id", cosExpr.format("v", "cv", "nrm", "cn") + " AS cos")
  }

  /** Trained-vs-seed codebook quality: the summed (micro-quantized)
    * assignment cosine under the fixed seed codebook vs the
    * [[trainedCodebook]] after `iters - 1` Lloyd steps, plus the
    * strictly-better flag. The sum is an order-insensitive BIGINT
    * (round(cos·1e9) per vector), so the distributed aggregation is
    * deterministic and both engines produce the identical cell. */
  def kmeansGain(emb: DataFrame, k: Int, iters: Int): DataFrame = {
    val p = prepared(emb).select("vec_id", "v", "nrm")
    def quality(cb: Array[(Long, Array[Double], Double)]) =
      assignmentCos(p, cb)
        .agg(sum(expr("cast(round(cos * 1000000000) as bigint)")))
    quality(fixedCodebook(emb, k)).toDF("seed_quality")
      .crossJoin(quality(trainedCodebook(emb, k, iters - 1)).toDF("trained_quality"))
      .selectExpr("seed_quality", "trained_quality",
        "trained_quality > seed_quality AS trained_better")
  }

  /** Centroid-based silhouette score per cluster — the geometric
    * cluster-quality audit that needs NO labels (complementing the
    * label-based s22 cluster-purity query): for each vector, with cosine
    * distance d = 1 − cos, cohesion a = d(own centroid) and
    * separation b = min over OTHER centroids d(c). Because the
    * centroid ranking is cosine-descending, a = 1 − cos₁ and
    * b = 1 − cos₂ (the runner-up), and since a ≤ b the classic
    * (b − a)/max(a, b) collapses to (cos₁ − cos₂)/(1 − cos₂) — one
    * subtract, one subtract, one divide, one multiply, one round:
    * a fixed chain of correctly-rounded IEEE ops both engines
    * replay bit-identically, then exact BIGINT micro sums.
    *
    * Degenerate cases: a vector whose runner-up cosine is exactly 1
    * (coincides with two centroids) scores 0 by convention rather
    * than 0/0; vectors with fewer than two rankable centroids
    * (NaN-cosine tail) drop out, the [[assignmentCos]] closure
    * semantics.
    *
    * 100 TB shape: the codebook is O(k·D) plan-literal state; the
    * per-vector work is one columnar [[graft.functions.CentroidRanks]]
    * projection + a 2-element posexplode + a broadcast codebook join —
    * map-side only — then ONE partial-agg shuffle to k rows. */
  def silhouette(emb: DataFrame, kCentroids: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val cb = fixedCodebook(emb, kCentroids)
    val (cents, cnorms, ids) = codebookCols(cb)
    val cbDf = cb.toSeq.map { case (id, v, n) => (id, v.toSeq, n) }
      .toDF("cid", "cv", "cn")
    val p = prepared(emb).select("vec_id", "v", "nrm")
    val top2 = p.select(col("vec_id"), col("v"), col("nrm"),
        posexplode(slice(
          call_function("graft_centroid_ranks", col("v"), cents, cnorms), 1, 2)))
      .withColumn("cid", element_at(ids, col("col").cast("int") + 1))
      .join(broadcast(cbDf), Seq("cid"))
      .selectExpr("vec_id", "pos", "cid",
        cosExpr.format("v", "cv", "nrm", "cn") + " AS cos")
    top2.groupBy(col("vec_id"))
      .agg(max(when(col("pos") === 0, col("cid"))).as("cluster"),
        max(when(col("pos") === 0, col("cos"))).as("cos1"),
        max(when(col("pos") === 1, col("cos"))).as("cos2"),
        count(lit(1)).as("nranks"))
      .filter(col("nranks") === 2)
      .selectExpr("vec_id", "cluster",
        "cast(round(if(1.0d - cos2 = 0.0d, 0.0d, " +
          "((cos1 - cos2) / (1.0d - cos2)) * 1000000.0d)) as bigint) AS sil_micro")
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_vectors"), sum(col("sil_micro")).as("sum_sil_micro"))
      .selectExpr("cluster", "n_vectors", "sum_sil_micro",
        "sum_sil_micro div n_vectors AS mean_sil_micro")
  }

  def ivfTopK(emb: DataFrame, nQueries: Int, k: Int,
      kCentroids: Int, nprobe: Int): DataFrame =
    ivfTopKWith(emb, fixedCodebook(emb, kCentroids), nQueries, k, nprobe)

  /** [[ivfTopK]] under the [[trainedCodebook]] after `iters - 1`
    * Lloyd rebuilds — the trained-quantizer ANN search path (the same
    * codebook s12 reconstructs against), so training feeds the
    * search operator itself, not just the quality metrics. */
  def ivfTopKTrained(emb: DataFrame, kCentroids: Int, iters: Int,
      nQueries: Int, k: Int, nprobe: Int): DataFrame =
    ivfTopKWith(emb, trainedCodebook(emb, kCentroids, iters - 1), nQueries, k, nprobe)

  /** [[ivfTopK]] against an EXPLICIT (e.g. [[trainedCodebook]])
    * codebook. */
  def ivfTopKWith(emb: DataFrame, cb: Array[(Long, Array[Double], Double)],
      nQueries: Int, k: Int, nprobe: Int): DataFrame = {
    val (cents, cnorms, ids) = codebookCols(cb)
    val p = prepared(emb).select("vec_id", "v", "nrm")

    // each vector -> its nearest centroid (native columnar projection)
    val assigned = assignTo(p, cb)

    // each query -> its nprobe nearest centroids: the probe list is
    // the rank prefix, `slice(graft_centroid_ranks(..), 1, nprobe)`.
    // Positions map to centroid ids through the id literal (the
    // codebook is id-sorted, so position order IS ascending-cid order
    // and the (cos DESC, pos ASC) rank equals the (cos DESC, cid ASC)
    // rank the oracle replays). NaN-cosine centroids are never probed.
    val probes = p.filter(col("vec_id") < nQueries)
      .withColumn("__pos", explode(slice(
        call_function("graft_centroid_ranks", col("v"), cents, cnorms),
        1, nprobe)))
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"),
        element_at(ids, col("__pos").cast("int") + 1).as("qcentroid"))

    // (q_id, n_id) pairs are already distinct — each corpus vector is
    // assigned to exactly ONE centroid and the probe list is a slice of
    // DISTINCT ranked positions, so no neighbor can meet a query through
    // two probe rows. A defensive distinct() here would re-shuffle every
    // scored candidate for nothing at scale; SimilaritySpec pins the
    // uniqueness property the guard would have enforced.
    val scored = broadcast(probes)
      .join(assigned, col("qcentroid") === col("centroid") && col("vec_id") =!= col("q_id"))
      .selectExpr("q_id", "vec_id AS n_id",
        cosExpr.format("qv", "v", "qn", "nrm") + " AS cos")
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id").asc)
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("q_id"), col("rk").cast("long").as("rk"), col("n_id"), col("cos"))
  }

  /** IVF-PQ composed search — the "IVFADC" architecture of Jegou et
    * al. (PAMI 2011, §V): probe the `nprobe` nearest coarse lists
    * (IVF), score every candidate by its PRODUCT-QUANTIZED
    * reconstruction against the full-precision query (asymmetric
    * distance computation), keep only the `rerank` best approximate
    * hits per query, and exact-re-rank those to top k. Both stages
    * run against the [[trainedCodebook]] after `iters - 1` Lloyd
    * rebuilds (coarse lists AND PQ sub-codebooks, the s12/s13
    * pattern composed).
    *
    * 100 TB shape — why this beats [[ivfTopK]] as the corpus grows:
    * the per-candidate ADC row entering the top-k window shuffle is
    * (q_id, n_id, adc) — two longs and a double — where ivfTopK's
    * exact scoring needs nothing wider either, BUT the full-precision
    * re-rank here touches only |Q|·rerank rows (broadcast-joined back
    * to the corpus, no extra corpus shuffle), so the expensive
    * D-dimensional cosine runs |Q|·rerank times instead of
    * |Q|·listsize times. Candidate generation stays the bucketed
    * equi-join; PQ coding + reconstruction is a pure columnar
    * projection over O(k·D) plan-literal state (one [[graft.functions.PqEncode]]
    * call + literal slices, no object barrier). Reconstructing per
    * candidate is mathematically identical to the classical per-query
    * distance-table formulation (the table IS the reconstruction dot
    * decomposed sub-block-wise); the table form saves FLOPs per
    * candidate but needs per-query state — the columnar form keeps
    * whole-stage codegen and zero extra broadcast.
    *
    * @return (q_id, rk, n_id, adc, cos) — adc is the approximate
    *         (reconstruction) cosine the shortlist ranked on, cos the
    *         exact cosine of the final ranking. */
  def ivfPqTopK(emb: DataFrame, kCentroids: Int, iters: Int, nQueries: Int,
      k: Int, nprobe: Int, m: Int, rerank: Int): DataFrame =
    ivfPqTopKWith(emb, trainedCodebook(emb, kCentroids, iters - 1),
      nQueries, k, nprobe, m, rerank)

  /** [[ivfPqTopK]] against an EXPLICIT codebook. */
  def ivfPqTopKWith(emb: DataFrame, cb: Array[(Long, Array[Double], Double)],
      nQueries: Int, k: Int, nprobe: Int, m: Int, rerank: Int): DataFrame = {
    require(rerank >= k, s"rerank window $rerank must cover top-k $k")
    val dim = cb.headOption.map(_._2.length).getOrElse(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m subvectors")
    val sub = dim / m
    val (cents, cnorms, ids) = codebookCols(cb)
    val p = prepared(emb).select("vec_id", "v", "nrm")

    // corpus side: coarse assignment + PQ code + reconstruction, all
    // columnar (graft_centroid_ranks / graft_pq / literal slices) —
    // vr[j*sub .. (j+1)*sub) = cents[codes[j]][j*sub .. (j+1)*sub)
    val coded = assignTo(p, cb)
      .withColumn("__pq", call_function("graft_pq", col("v"), cents, lit(m)))
      .withColumn("vr", flatten(transform(col("__pq.codes"),
        (c, j) => slice(element_at(cents, c.cast("int") + 1),
          j * lit(sub) + 1, lit(sub)))))
      .withColumn("rn", expr("graft_dot(vr, vr)"))
      .select("vec_id", "centroid", "vr", "rn")

    // query side: same probe-list slice as [[ivfTopKWith]]
    val probes = p.filter(col("vec_id") < nQueries)
      .withColumn("__pos", explode(slice(
        call_function("graft_centroid_ranks", col("v"), cents, cnorms),
        1, nprobe)))
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"),
        element_at(ids, col("__pos").cast("int") + 1).as("qcentroid"))

    // ADC scoring: full-precision query vs candidate RECONSTRUCTION.
    // Projected down to (q_id, n_id, adc) BEFORE the per-query window
    // so the wide columns never enter the shuffle.
    val adc = broadcast(probes)
      .join(coded, col("qcentroid") === col("centroid") && col("vec_id") =!= col("q_id"))
      .selectExpr("q_id", "vec_id AS n_id",
        cosExpr.format("qv", "vr", "qn", "rn") + " AS adc")
    val wa = Window.partitionBy(col("q_id")).orderBy(col("adc").desc, col("n_id").asc)
    val shortlist = adc.withColumn("ark", row_number().over(wa))
      .filter(col("ark") <= rerank)
      .select("q_id", "n_id", "adc")

    // exact re-rank of the |Q|*rerank survivors: the shortlist is the
    // SMALL side of both hash joins (broadcast), so the corpus pays
    // one more scan but zero additional shuffle
    val q = p.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val exact = broadcast(shortlist)
      .join(p, col("n_id") === col("vec_id"))
      .join(broadcast(q), Seq("q_id"))
      .selectExpr("q_id", "n_id", "adc",
        cosExpr.format("qv", "v", "qn", "nrm") + " AS cos")
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id").asc)
    exact.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("q_id"), col("rk").cast("long").as("rk"),
        col("n_id"), col("adc"), col("cos"))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the corpus embeddings (the
    * [[assignCentroids]] coarse quantization — broadcast argmax, pure
    * map), compare vectors ONLY within their cluster, and drop every
    * vector that has a lower-id cluster-mate with cosine >= threshold
    * (one-pass keep-lowest-id policy, same greedy rule as d05). The
    * embedding twin of MinHash dedup: catches paraphrases and
    * re-encodings that share no n-grams.
    *
    * 100 TB shape: the only quadratic term is per-cluster pair
    * generation, an equi-join on centroid id whose fan-out is bounded
    * by cluster size — kCentroids must grow with the corpus (the
    * SemDeDup paper runs 50k clusters for 1e9 docs; sqrt(N) is the
    * usual rule) to keep clusters O(sqrt N). Assignment state stays
    * O(kCentroids) broadcast, constant in corpus size.
    *
    * EAGER: executes and materializes at call time (the
    * [[Storage.withCached]] contract); free the returned frame's
    * blocks with [[Storage.release]] after the terminal action.
    *
    * @return (vec_id, centroid, kept) for every corpus vector.
    */
  def semanticDedup(emb: DataFrame, kCentroids: Int, threshold: Double): DataFrame =
    // cached (spillable) while the result materializes: the
    // assignment is referenced three times (both pair sides + the
    // final keep/drop projection); [[Storage.withCached]] releases it
    // as soon as the result is checkpointed, so a long-lived session
    // doesn't accumulate corpus-sized assignment caches
    Storage.withCached(assignCentroids(emb, kCentroids))(
      semanticDedupFrom(_, threshold))

  /** the sqrt(N) default for [[semanticDedup]]'s cluster count —
    * keeps within-cluster pair generation O(sqrt N) per cluster as
    * the corpus grows (the SemDeDup paper's 50k clusters for 1e9 docs
    * is this rule's regime). Pinned by SimilaritySpec. */
  private[graft] def autoKCentroids(n: Long): Int =
    math.max(1, math.ceil(math.sqrt(n.toDouble)).toInt)

  /** [[semanticDedup]] with the cluster count DEFAULTED to
    * ceil(sqrt(N)) from a cheap `count()` (a parquet-metadata read,
    * not a collect) — so the 100 TB scaling contract ("kCentroids
    * must grow with the corpus") is the default behavior, not a
    * docstring instruction. Explicit-k callers keep full control via
    * [[semanticDedup]]. EAGER ([[Storage.withCached]]); release via
    * [[Storage.release]]. */
  def semanticDedupAuto(emb: DataFrame, threshold: Double): DataFrame =
    semanticDedup(emb, autoKCentroids(emb.count()), threshold)

  /** [[semanticDedup]] FORCED through the join-based assignment
    * ([[assignToJoin]]) — the large-codebook regime's plan.
    * [[assignTo]] auto-selects this form once k·D passes
    * [[LiteralCodebookMaxDoubles]]; the explicit entry point exists
    * so the regime is exercised (and CORRECTNESS-gated) at test
    * corpus scale, where a >10^6-double codebook can't. EAGER
    * ([[Storage.withCached]]); release via [[Storage.release]]. */
  def semanticDedupLargeK(emb: DataFrame, kCentroids: Int, threshold: Double): DataFrame =
    // parallelFloor: the join-based assignment scores every vector
    // against the codebook rows (k x N per-row work; measured s16
    // -0.24 s at bench scale, no-op on a multi-split scan)
    Storage.withCached(assignToJoin(
      Storage.parallelFloor(prepared(emb).select("vec_id", "v", "nrm")),
      fixedCodebook(emb, kCentroids)))(
      semanticDedupFrom(_, threshold))

  /** [[semanticDedup]] under the [[trainedCodebook]] after `iters - 1`
    * Lloyd rebuilds: trained clusters group semantically-close vectors
    * tighter, so the within-cluster comparison catches pairs the
    * arbitrary seed partition splits across clusters — same plan, same
    * state bounds, better recall (the SemDeDup paper trains its
    * clustering for exactly this reason). EAGER
    * ([[Storage.withCached]]); release via [[Storage.release]]. */
  def semanticDedupTrained(emb: DataFrame, kCentroids: Int, iters: Int,
      threshold: Double): DataFrame =
    Storage.withCached(
      assignTo(prepared(emb).select("vec_id", "v", "nrm"),
        trainedCodebook(emb, kCentroids, iters - 1)))(
      semanticDedupFrom(_, threshold))

  private[graft] def semanticDedupFrom(a: DataFrame, threshold: Double): DataFrame = {
    val l = a.select(col("centroid"), col("vec_id").as("d1"),
      col("v").as("v1"), col("nrm").as("nrm1"))
    val r = a.select(col("centroid"), col("vec_id").as("d2"),
      col("v").as("v2"), col("nrm").as("nrm2"))
    val losers = l.join(r, Seq("centroid"))
      .filter(col("d1") < col("d2"))
      .selectExpr("d2", cosExpr.format("v1", "v2", "nrm1", "nrm2") + " AS cos")
      .filter(col("cos") >= threshold)
      .select(col("d2").as("vec_id"))
      .distinct()
    a.select(col("vec_id"), col("centroid"))
      .join(losers.withColumn("__dropped", lit(true)), Seq("vec_id"), "left")
      .selectExpr("vec_id", "cast(centroid as bigint) AS centroid",
        "coalesce(NOT __dropped, true) AS kept")
  }

  /** Per-vector symmetric int8 quantization — the storage/transport
    * format a 100 TB embedding corpus actually ships (4x smaller than
    * float32, SIMD-friendly dot products). scale = maxabs/127;
    * q_i = round(v_i * 127 / maxabs) in [-127, 127]. Pure projection,
    * zero shuffle. All arithmetic is fixed-order IEEE (one multiply,
    * one divide, one round per element) so the DuckDB oracle
    * reproduces every q_i bit-exactly; zero vectors quantize to zeros
    * with scale 0.
    *
    * @return (vec_id, v, nrm, maxabs, q) — q is the int8 code array
    *         (stored as int; parquet INT8 annotation applies at write).
    */
  def quantizeInt8(emb: DataFrame): DataFrame =
    // parallelFloor: the int8 family's q x N scoring fans out from
    // here (measured s37 4.14 -> 1.86 s, s20 0.97 -> 0.45 s)
    Storage.parallelFloor(prepared(emb))
      .selectExpr("vec_id", "v", "nrm",
        "aggregate(v, cast(0 as double), (m, x) -> greatest(m, abs(x))) AS maxabs")
      .selectExpr("vec_id", "v", "nrm", "maxabs",
        "if(maxabs = 0d, transform(v, x -> 0), " +
          "transform(v, x -> cast(round((x * 127d) / maxabs) as int))) AS q")

  /** Signed random-projection sketch search (the ±1
    * Johnson–Lindenstrauss scheme of Achlioptas 2003, public method)
    * composed with the s08 int8 scalar quantization: each quantized
    * vector projects to `dims` EXACT-INTEGER sketch coordinates
    * `sk_j = Σ_d q_d · s(d, j)` under the deterministic sign matrix
    * `s(d, j) = 1 − 2·((d·31 + j·17) mod 2)` — no floats anywhere in
    * the sketch or its dot products, so the candidate ranking needs NO
    * rounding contract at all. Returns each query's sketch-space top-k
    * with the integer sketch dot and an `in_exact` recall audit
    * against the exact cosine top-k computed in the same plan
    * ([[cosineTopK]]).
    *
    * 100 TB shape: the sketch is a pure map-side projection (D → dims
    * compression — the column a scale deployment would band/bucket
    * like [[lshTopK]]); scoring broadcasts the Q-row query frame
    * (the s01 brute-baseline shape, deliberately); the recall join is
    * a (q_id, n_id) equi-join of two k-row-per-query frames. */
  def randomProjectionTopK(emb: DataFrame, dims: Int, nQueries: Int,
      k: Int): DataFrame = {
    require(dims >= 1, s"dims must be >= 1, got $dims")
    require(nQueries >= 1, s"nQueries must be >= 1, got $nQueries")
    require(k >= 1, s"k must be >= 1, got $k")
    // native nested-loop sketch (value-identical to the former
    // transform(sequence(0, dims-1), j -> aggregate(...)) lambda form;
    // see graft.functions.RpSketch — exact integer arithmetic, same
    // deterministic sign matrix, whole-stage codegen instead of
    // dims x D interpreted lambda dispatches per row)
    val sk = quantizeInt8(emb).selectExpr("vec_id",
      s"graft_rp_sketch(q, $dims) AS sk")
    val q = sk.filter(s"vec_id < $nQueries")
      .selectExpr("vec_id AS q_id", "sk AS qsk")
    val scored = broadcast(q).join(sk, col("vec_id") =!= col("q_id"))
      .selectExpr("q_id", "vec_id AS n_id",
        // native exact-integer dot (value-identical to the former
        // aggregate(zip_with(...)) lambda fold; see DotProductLong)
        "graft_dot_long(qsk, sk) AS sk_dot")
    val w = Window.partitionBy(col("q_id")).orderBy(col("sk_dot").desc, col("n_id").asc)
    val top = scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
    val exact = cosineTopK(emb, nQueries, k)
      .select(col("q_id"), col("n_id"), lit(true).as("in_exact"))
    top.join(exact, Seq("q_id", "n_id"), "left")
      .na.fill(false, Seq("in_exact"))
      .select(col("q_id"), col("rk").cast("long").as("rk"), col("n_id"),
        col("sk_dot"), col("in_exact"))
  }

  /** Product quantization (Jegou et al., "Product Quantization for
    * Nearest Neighbor Search", PAMI 2011): split each vector into `m`
    * subvectors and code each against a per-subvector codebook by
    * L2 argmin — m bytes per vector at kCodes <= 256, the compressed
    * storage format large ANN systems actually ship (vs [[quantizeInt8]]'s
    * scalar 1-byte-per-dim). Deterministic like the IVF path: the
    * codebook is the [[fixedCodebook]] (vec_id < kCodes), ties keep
    * the smallest code id, every distance/cosine fold runs in element
    * order so the DuckDB oracle matches bit-exactly, and degenerate
    * norms (zero input or zero reconstruction) pin recon_cos to 0 on
    * both sides rather than NaN-vs-NULL divergence.
    *
    * 100 TB shape: O(kCodes x D) broadcast state — constant in corpus
    * size — and the coding itself is a pure map pass, no shuffle.
    *
    * @return (vec_id, codes ARRAY<BIGINT> of length m, recon_cos —
    *         cosine between the vector and its codebook
    *         reconstruction). */
  def productQuantize(emb: DataFrame, m: Int = 8, kCodes: Int = 16): DataFrame =
    productQuantizeWith(emb, fixedCodebook(emb, kCodes), m)

  /** [[productQuantize]] against an EXPLICIT (e.g.
    * [[trainedCodebook]]) codebook. */
  def productQuantizeWith(emb: DataFrame,
      cb: Array[(Long, Array[Double], Double)], m: Int): DataFrame = {
    // coding runs in the native [[graft.functions.PqEncode]]
    // expression — argmin over codebook POSITIONS (a sparse id range
    // must not be indexed by cid), strict < keeping the smallest
    // position on ties; cb is id-sorted, so position order IS
    // ascending-cid order, matching the oracle's (dist, cid) rank.
    // Positions map back to codebook IDS through the id literal.
    // Degenerate norms (zero input or zero reconstruction) pin
    // recon_cos to 0 on both engines rather than NaN-vs-NULL
    // divergence. The whole pass is a columnar projection — no
    // Serialize/DeserializeToObject barrier, no broadcast round-trip.
    val ids = typedLit(cb.map(_._1).toSeq)
    val cents = typedLit(cb.map(_._2.toSeq).toSeq)
    prepared(emb)
      .select(col("vec_id"),
        call_function("graft_pq", col("v"), cents, lit(m)).as("__pq"))
      .select(col("vec_id"),
        transform(col("__pq.codes"),
          c => element_at(ids, c.cast("int") + 1)).as("codes"),
        col("__pq.recon_cos").as("recon_cos"))
  }

  /** Trained-vs-seed PRODUCT-QUANTIZER quality: summed
    * micro-quantized reconstruction cosine ([[productQuantizeWith]])
    * under the seed codebook vs the [[trainedCodebook]], plus the
    * strictly-better flag — the measured answer to "does feeding the
    * Lloyd loop back through the PQ family actually help"
    * (seed→trained lifts mean recon_cos ~0.46→0.51 on the synthetic
    * corpus at both sf0.001 and sf0.01). */
  def pqGain(emb: DataFrame, k: Int, iters: Int, m: Int): DataFrame = {
    def recon(cb: Array[(Long, Array[Double], Double)]) =
      productQuantizeWith(emb, cb, m)
        .agg(sum(expr("cast(round(recon_cos * 1000000000) as bigint)")))
    recon(fixedCodebook(emb, k)).toDF("seed_recon")
      .crossJoin(recon(trainedCodebook(emb, k, iters - 1)).toDF("trained_recon"))
      .selectExpr("seed_recon", "trained_recon",
        "trained_recon > seed_recon AS trained_better")
  }

  /** Near-duplicate vector pairs (cosine >= threshold, d1 < d2) via
    * banded hyperplane LSH + exact re-rank: one `nBands * bandBits`-
    * plane signature per vector (pure projection), sliced into
    * `nBands` bands; candidates share >= 1 exact band (OR-
    * construction); exact cosine filters the survivors.
    * Approximate-by-design recall, fully deterministic — the DuckDB
    * oracle replicates the bands and the re-rank bit-exactly.
    *
    * 100 TB shape: candidate generation is a (band, bucket) equi-join
    * — no N^2 scan, no driver-side state (the earlier brute-force
    * variant collected the whole table to the driver; it survives
    * only as the spec-level recall oracle in SimilaritySpec). */
  def nearDupPairs(emb: DataFrame, threshold: Double,
      nBands: Int = 3, bandBits: Int = 6): DataFrame = {
    val mask = (1 << bandBits) - 1
    val base = prepared(emb)
    val p = base.selectExpr("vec_id", "v", "nrm",
      s"${lshBucketExpr("v", nBands * bandBits)} AS sig")
    val bands = p.selectExpr("vec_id",
        s"explode(transform(sequence(0, ${nBands - 1}), " +
        s"b -> struct(b AS band, shiftright(sig, b * $bandBits) % ${mask + 1} AS bucket))) AS bb")
      .select(col("vec_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    // the band self-join's two sides are identical exchanges, so the
    // signature projection runs once (ReuseExchange)
    val cands = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("d1"), col("b.vec_id").as("d2"))
      .distinct()
    // re-rank sides skip the signature (18 hyperplane dot products per
    // row they would otherwise recompute and drop)
    val s1 = base.select(col("vec_id").as("d1"), col("v").as("v1"), col("nrm").as("nrm1"))
    val s2 = base.select(col("vec_id").as("d2"), col("v").as("v2"), col("nrm").as("nrm2"))
    cands.join(s1, "d1").join(s2, "d2")
      .selectExpr("d1", "d2", cosExpr.format("v1", "v2", "nrm1", "nrm2") + " AS cos")
      .filter(col("cos") >= threshold)
  }

  /** Spec-level exact oracle for [[nearDupPairs]] recall measurement:
    * brute-force N^2/2 — NOT registered as a query (driver-collect is
    * exactly the anti-pattern the banded plan exists to avoid). */
  private[graft] def nearDupPairsBrute(emb: DataFrame, threshold: Double): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val p = prepared(emb).select("vec_id", "v", "nrm").as[(Long, Seq[Double], Double)]
    val all = p.collect().sortBy(_._1)
    val bc = spark.sparkContext.broadcast(all.map { case (id, v, n) => (id, v.toArray, n) })
    val th = threshold
    p.flatMap { case (id, vSeq, nrm) =>
      val v = vSeq.toArray
      val out = List.newBuilder[(Long, Long, Double)]
      bc.value.foreach { case (wid, w, wn) =>
        if (wid > id) {
          var dot = 0.0
          var k = 0
          while (k < v.length) { dot += v(k) * w(k); k += 1 }
          val cos = dot / (math.sqrt(nrm) * math.sqrt(wn))
          if (cos >= th) out += ((id, wid, cos))
        }
      }
      out.result()
    }.toDF("d1", "d2", "cos")
  }

  /** Embedding-space anisotropy audit (Ethayarajh 2019, arXiv:
    * 1909.00512 — contextual embedding spaces are narrow cones): in
    * an isotropic space the expected cosine between UNRELATED
    * vectors is ~0; a large positive mean says every similarity
    * threshold in the pipeline (SemDeDup taus, near-dup cosines,
    * ANN scores) is measuring the cone, not semantics. The unrelated
    * pairing is pinned and deterministic — vec_id `i` pairs with
    * `i + floor(N/2)` — so both engines score identical pairs with
    * no RNG; per-pair cosines quantize to micro ints (single IEEE
    * chain + one round, the Pipeline12 idiom), then all stats are
    * exact-integer folds.
    *
    * 100 TB shape: one 1-row max aggregate broadcast back, one
    * shifted-key equi-join (never a cartesian, never a sample
    * collect), one 1-row fold. Degenerate zero-norm vectors yield
    * NULL cosines and are excluded (counted) rather than crashing.
    *
    * Returns 1 row: `n_pairs, n_scored, mean_cos_micro, n_negative,
    * min_cos_micro, max_cos_micro`. */
  def anisotropyAudit(emb: DataFrame): DataFrame = {
    val p = prepared(emb).select("vec_id", "v", "nrm")
    val half = p.agg(expr("(max(vec_id) + 1) div 2").as("half"))
    val b = p.select(col("vec_id").as("b_id"), col("v").as("bv"),
      col("nrm").as("bn"))
    p.crossJoin(broadcast(half))
      .filter(col("vec_id") < col("half"))
      .join(b, (col("vec_id") + col("half")) === col("b_id"))
      .selectExpr(
        s"cast(round((${cosExpr.format("v", "bv", "nrm", "bn")}) * 1000000) as bigint) AS cm")
      .agg(count(lit(1)).as("n_pairs"),
        count(col("cm")).as("n_scored"),
        coalesce(sum(col("cm")), lit(0L)).as("s"),
        coalesce(sum(expr("cast(cm < 0 as bigint)")), lit(0L)).as("n_negative"),
        min(col("cm")).as("min_cos_micro"),
        max(col("cm")).as("max_cos_micro"))
      .selectExpr("n_pairs", "n_scored",
        "if(n_scored = 0, 0L, s div n_scored) AS mean_cos_micro",
        "n_negative", "min_cos_micro", "max_cos_micro")
  }

  /** Embedding-space eval contamination audit — the SEMANTIC face of
    * the n-gram leakage gates (t37/p46/p15): an eval example leaks
    * into training not only verbatim (which shingle overlap catches)
    * but as a paraphrase or format-shifted near-copy, which only
    * embedding similarity sees (the published decontamination upgrade
    * — e.g. the LLM-decontaminator line of work, Yang et al. 2023,
    * arXiv:2311.04850, flags train docs whose embedding similarity to
    * an eval item is near-maximal). For every TRAIN vector: the max
    * cosine to ANY eval vector (micro-quantized — ONE IEEE op per
    * pair, then exact BIGINT max), the nearest eval id (ties → the
    * smallest id), and a `cm >= tauMicro` contamination flag.
    *
    * Zero-norm vectors carry no directional evidence and are excluded
    * from BOTH sides up front (the documented [[cosExpr]] NULL class,
    * filtered rather than NULL-ranked so the max aggregate never
    * compares NULL structs).
    *
    * 100 TB shape: the eval set is a bounded input (the BM25-family
    * rule), broadcast once; the scan is ONE corpus pass with a
    * map-side-combinable (vec, max-struct) aggregate — the shuffle
    * carries ONE row per train vector, never the pair frame. The
    * compute contract is O(|train| · |eval| · D) scored pairs with
    * |eval| held in executor memory: sized for BENCHMARK eval sets
    * (10^2–10^5 vectors), not a second corpus. When the eval set
    * outgrows a broadcast, swap the candidate generator for the IVF
    * bucket join ([[ivfTopK]]) — same downstream fold.
    *
    * The eval side is REQUIRED non-empty (eager count, matching the
    * operator's eager neighbors): a predicate that matches nothing —
    * or only zero-norm vectors — would otherwise return an empty
    * frame indistinguishable from "no train vectors contaminated",
    * silently passing a mis-specified audit. */
  def evalContamination(emb: DataFrame, evalPredicate: String,
      tauMicro: Long): DataFrame = {
    val p = prepared(emb).filter(col("nrm") > 0d).select("vec_id", "v", "nrm")
    // NULL predicates coalesce to false = TRAIN: under three-valued
    // logic a NULL row would fail BOTH filters and silently audit as
    // neither split (the Dedup.spanContamination/decontaminationScrub
    // rule — unknown provenance is scanned as train, never dropped)
    val isEval = coalesce(expr(evalPredicate), lit(false))
    val ev = p.filter(isEval)
      .select(col("vec_id").as("e_id"), col("v").as("ev"), col("nrm").as("en"))
    require(!ev.isEmpty,
      s"evalContamination: eval predicate '$evalPredicate' matched no " +
        "non-zero-norm vectors - an empty eval side would read as a " +
        "clean audit; fix the predicate")
    val tr = p.filter(not(isEval))
    tr.crossJoin(broadcast(ev))
      .selectExpr("vec_id",
        s"cast(round((${cosExpr.format("v", "ev", "nrm", "en")}) * 1000000)" +
          " as bigint) AS cm",
        "-e_id AS ne")
      .groupBy(col("vec_id"))
      .agg(max(struct(col("cm"), col("ne"))).as("m"))
      .selectExpr("vec_id", "-m.ne AS nn_eval_id", "m.cm AS max_cos_micro",
        s"m.cm >= ${tauMicro}L AS contaminated")
  }

  /** Greedy k-center (farthest-point / Gonzalez) coreset selection —
    * the diversity-maximizing counterpart to [[semanticDedup]]'s
    * redundancy removal: starting from the lowest vec_id, each step
    * adds the vector FARTHEST (squared L2, exact IEEE) from every
    * center chosen so far (ties by lowest vec_id). The selected k
    * vectors 2-approximate the optimal k-center cover — the standard
    * seed set for diversity-aware sampling and coreset construction.
    *
    * Deterministic end to end: d²(x, c) = nrm_x + nrm_c −
    * 2·graft_dot(x, c) with the centers embedded as exact double
    * literals, and the running min-distance is `least` over the
    * chosen centers in selection order — the DuckDB oracle replays
    * the identical fold, so even the DOUBLE outputs hash-match.
    *
    * @return k rows: (rk, vec_id, dist2_sel) — dist2_sel the max-min
    *         distance at selection time (NULL for the seed).
    *
    * 100 TB shape: k bounded (driver holds O(k·D) center state, the
    * codebook pattern); each of the k steps is one map-only distance
    * projection + a TakeOrdered(1) reduce over the corpus — no joins,
    * no windows, no shuffle beyond the k single-row argmax reduces.
    * The k passes re-scan the source; at real scale persist the
    * prepared frame first (serialized, the [[Storage]] rule). */
  def kCenterCoreset(emb: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"kCenterCoreset needs k >= 1, got $k")
    val spark = emb.sparkSession
    import spark.implicits._
    val p = prepared(emb).select("vec_id", "v", "nrm")
    val seedRow = p.orderBy(col("vec_id").asc).limit(1)
      .collect().headOption
      .getOrElse(throw new IllegalArgumentException(
        "kCenterCoreset: empty embedding table"))
    var centers = Vector[(Long, Seq[Double], Double, Option[Double])](
      (seedRow.getLong(0), seedRow.getSeq[Double](1), seedRow.getDouble(2), None))
    def distTo(c: (Long, Seq[Double], Double, Option[Double])): Column =
      col("nrm") + lit(c._3) -
        lit(2.0d) * call_function("graft_dot", col("v"),
          array(c._2.map(lit): _*))
    while (centers.size < k) {
      val minD = centers.map(distTo) match {
        case Seq(only) => only
        case ds => least(ds: _*)
      }
      val next = p.withColumn("md", minD)
        .orderBy(col("md").desc, col("vec_id").asc).limit(1)
        .select("vec_id", "v", "nrm", "md")
        .collect().head
      centers = centers :+ ((next.getLong(0), next.getSeq[Double](1),
        next.getDouble(2), Some(next.getDouble(3))))
    }
    centers.zipWithIndex
      .map { case ((id, _, _, d), i) => (i + 1L, id, d) }
      .toDF("rk", "vec_id", "dist2_sel")
  }

  /** Cluster-balanced coreset sampling — [[kCenterCoreset]] put to
    * work: every vector is assigned to its nearest of the k selected
    * centers (exact squared L2, ties to the lowest center id), and
    * each stratum keeps its `perStratum` lowest salted-hash members —
    * a deterministic, diversity-BALANCED subsample (a plain uniform
    * sample reproduces the corpus's redundancy; this one gives every
    * region of embedding space the same seat count regardless of how
    * over-represented it is).
    *
    * @return (centroid, rk, vec_id, d2) for the selected rows,
    *         rk = 1..perStratum within each stratum.
    *
    * 100 TB shape: the k-center pass (k bounded scans), then ONE
    * corpus scan against the k-row broadcast center frame folded to
    * an argmin (no join explosion — the k candidates collapse in a
    * partial-aggregable min(struct)), and one stratum-partitioned
    * top-perStratum window over k strata. */
  def coresetSample(emb: DataFrame, k: Int, perStratum: Int,
      salt: String): DataFrame = {
    require(perStratum >= 1, s"perStratum must be >= 1, got $perStratum")
    require(!salt.contains("'"), "salt must not contain quotes")
    val p = prepared(emb).select("vec_id", "v", "nrm")
    val ctr = kCenterCoreset(emb, k).select(col("vec_id").as("cid"))
      .join(p.selectExpr("vec_id AS cid", "v AS cv", "nrm AS cn"), Seq("cid"))
    val assigned = p.crossJoin(broadcast(ctr))
      .selectExpr("vec_id", "cid", "nrm + cn - 2 * graft_dot(v, cv) AS d2")
      .groupBy(col("vec_id"))
      .agg(min(struct(col("d2"), col("cid"))).as("m"))
      .selectExpr("vec_id", "m.cid AS centroid", "m.d2 AS d2")
    val h = TextOps.strHash60(s"concat('$salt', ':', cast(vec_id as string))")
    assigned.selectExpr("centroid", "vec_id", "d2", s"$h AS hkey")
      .withColumn("rk", row_number().over(Window.partitionBy(col("centroid"))
        .orderBy(col("hkey"), col("vec_id"))))
      .filter(col("rk") <= perStratum)
      .selectExpr("centroid", "cast(rk as bigint) AS rk", "vec_id", "d2")
      .orderBy(col("centroid"), col("rk"))
  }
}
