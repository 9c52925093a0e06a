package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import Storage.checkpointRdds

/** Distributed graph clustering for dedup: connected components over a
  * near-duplicate pair graph (the step after LSH pair generation that
  * turns pairwise matches into dedup GROUPS — "keep one doc per
  * component", the canonical corpus-dedup contraction).
  *
  * Algorithm: min-label propagation with pointer-jumping — each round
  * (a) every vertex takes the min label over itself and its
  * neighbors, then (b) labels shortcut through their current
  * representative (`lbl := lbl(lbl)`), the classic path-halving step,
  * so convergence is O(log diameter) rounds rather than O(diameter)
  * (the same round structure as the alternating large-star/small-star
  * MapReduce formulation). Every round is two distributed equi-joins
  * and a groupBy-min — no driver-side graph state; the driver holds
  * only the loop counter and a converged flag. LSH dup clusters are
  * near-cliques (diameter ~2), so in practice 2-3 rounds.
  *
  * Lineage across rounds is truncated with `localCheckpoint` —
  * without it the iterated join plan grows exponentially and the
  * optimizer re-analyzes the whole history each round (on a cluster
  * with a checkpoint dir, `checkpoint` would also survive executor
  * loss; the algorithm is identical).
  */
object Cluster {

  /** Connected components of the undirected graph given as an edge
    * list. Returns (`id`, `lbl`) where `lbl` is the MINIMUM vertex id
    * of the component — deterministic, so an oracle can replay it as
    * min-over-reachable-set. Vertices are the ids appearing in at
    * least one edge; callers join singletons back themselves (see
    * c01's coalesce).
    *
    * @param maxRounds safety valve: throws if not converged (a wrong
    *                  silent cutover would mislabel components). With
    *                  pointer-jumping, 2^maxRounds path length is
    *                  covered — 30 rounds handles any graph that fits
    *                  on disk.
    */
  def connectedComponents(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxRounds: Int = 30): DataFrame = {
    // serialized checkpoint storage (MEMORY_AND_DISK_SER): the edge
    // list is the loop's biggest resident — at 100× the dup-saturated
    // slice yields ~10⁸ symmetric pair rows, and the default
    // DESERIALIZED block format held them as boxed row objects that
    // outgrew a 60 g heap (round-14 OOM); serialized blocks are
    // several× smaller, evict cleanly, and the per-round consumers
    // scan them once each — the classic iterate-over-big-edge-list
    // storage rule
    val ser = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
    val sym = edges.selectExpr(s"$srcCol AS a", s"$dstCol AS b")
      .union(edges.selectExpr(s"$dstCol AS a", s"$srcCol AS b"))
      .distinct()
      .localCheckpoint(true, ser)
    // seed with min(self, neighbors) — round 1's propagation step (a)
    // computed directly from the grouped edge list, no join: every
    // neighbor label still equals its id at this point. Saves one full
    // loop round (near-clique LSH graphs then converge in 1-2)
    var labels = sym.groupBy(col("a"))
      .agg(min(col("b")).as("minb"))
      .select(col("a").as("id"), least(col("a"), col("minb")).as("lbl"))
      .localCheckpoint(true, ser)
    // round N's label blocks are consumed exactly once — by round
    // N+1's eager checkpoint materialization. Unpersist them as soon
    // as the new round is materialized, or executor storage holds one
    // full label-set PER ROUND for the life of the job
    var stale: Seq[RDD[_]] = checkpointRdds(labels)
    var round = 0
    // loop exchanges sized from the materialized symmetric edge frame
    // (r17, guide §2 scale-adaptive partitioning): the count reads the
    // eager checkpoint's blocks; at 100× slices rows/250k exceeds the
    // session width and the knob is a no-op
    Storage.withLoopPartitions(edges.sparkSession, sym.count()) {
    while (round < maxRounds) {
      // (a) min over self + neighbor labels
      val viaNeighbors = sym
        .join(labels, sym("b") === labels("id"))
        .select(sym("a").as("id"), col("lbl"))
      val propagated = labels.union(viaNeighbors)
        .groupBy(col("id")).agg(min(col("lbl")).as("lbl"))
      // (b) pointer-jump: lbl := lbl(lbl)  (labels are always vertex
      // ids, so the self-join total — every lbl resolves)
      val reps = propagated.select(col("id").as("rep_id"), col("lbl").as("rep_lbl"))
      val jumped = propagated
        .join(reps, propagated("lbl") === reps("rep_id"))
        .select(propagated("id"), col("rep_lbl").as("lbl"))
      // convergence flag computed INSIDE the checkpoint materialization
      // (one distributed pass per round: the old-label comparison join
      // runs in the same job that persists the round's labels; the
      // isEmpty probe then only scans the cached result)
      val flagged = jumped.alias("n")
        .join(labels.select(col("id"), col("lbl").as("prev")), Seq("id"))
        .select(col("id"), col("n.lbl").as("lbl"),
          (col("n.lbl") =!= col("prev")).as("chg"))
        .localCheckpoint(true, ser)
      stale.foreach(_.unpersist(blocking = false))
      stale = checkpointRdds(flagged)
      val done = flagged.filter(col("chg")).isEmpty
      labels = flagged.select(col("id"), col("lbl"))
      round += 1
      if (done) {
        // the result is checkpointed (materialized) — the edge blocks
        // are no longer reachable from it and can be freed too
        checkpointRdds(sym).foreach(_.unpersist(blocking = false))
        return labels
      }
    }
    }
    throw new IllegalStateException(
      s"connectedComponents did not converge in $maxRounds rounds")
  }

  /** INCREMENTAL component maintenance: merge a NEW edge slice into
    * standing labels without re-clustering the corpus. The standing
    * graph is CONTRACTED to its labels (each old vertex is replaced
    * by its component's min-id representative — exact, since a label
    * is itself a vertex id), the new edges run [[connectedComponents]]
    * over that contracted graph (whose size is O(touched components
    * + new vertices), not O(corpus)), and standing labels redirect
    * through the sub-result. Result is IDENTICAL to a full recompute
    * over old ∪ new edges: min-over-reachable-set distributes over
    * the contraction because every contracted node carries its
    * component's minimum.
    *
    * 100 TB shape: the whole point — the corpus-sized label table is
    * touched by exactly two equi-joins (endpoint contraction +
    * redirect); the iterative loop runs only on the new-slice
    * subgraph. Returns (`id`, `lbl`) covering old vertices and every
    * vertex of `newEdges`. */
  def mergeComponents(baseLabels: DataFrame, newEdges: DataFrame,
      srcCol: String, dstCol: String, maxRounds: Int = 30): DataFrame = {
    val e = newEdges.selectExpr(s"$srcCol AS a", s"$dstCol AS b")
    val contracted = e
      .join(baseLabels.selectExpr("id AS a", "lbl AS la"), Seq("a"), "left")
      .join(baseLabels.selectExpr("id AS b", "lbl AS lb"), Seq("b"), "left")
      .selectExpr("coalesce(la, a) AS a", "coalesce(lb, b) AS b")
    val sub = connectedComponents(contracted, "a", "b", maxRounds)
    val redirected = baseLabels
      .join(sub.selectExpr("id AS lbl", "lbl AS sub_lbl"), Seq("lbl"), "left")
      .selectExpr("id", "coalesce(sub_lbl, lbl) AS lbl")
    val fresh = sub.join(baseLabels.select(col("id")), Seq("id"), "left_anti")
    redirected.unionByName(fresh)
  }
}
