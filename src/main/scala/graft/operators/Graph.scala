package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import Storage.checkpointRdds

/** Distributed graph centrality over derived relationship graphs —
  * the analytics layer a corpus/citation/link graph needs after the
  * pair-generation operators ([[Dedup]]) and the contraction step
  * ([[Cluster]]): which nodes matter, not just which nodes connect.
  *
  * PageRank here is the classic damped random-surfer iteration
  * (Brin & Page 1998, public method) with a fixed round count —
  * fixed, not convergence-tested, so the oracle can replay the exact
  * unrolled computation.
  *
  * Determinism contract (cell-exact across engines): ranks live in
  * integer MICRO units. Every per-edge contribution is
  * `(rank_src * w) div out_w(src)` — exact BIGINT floor division —
  * and per-node inflows are exact integer sums (order-insensitive, so
  * shuffle nondeterminism cannot change a hash). The damping step is
  * `teleport + (d_micro * inflow) div 1e6`, again exact. No doubles
  * anywhere. Floor rounding loses ~1 micro-unit per edge per round of
  * total mass — irrelevant for ranking and identical in both engines.
  *
  * 100 TB shape: each round is ONE equi-join of the rank frame
  * (V rows) with the edge list (E rows) on `src` plus a partially
  * aggregated groupBy(dst) shuffle, one O(1)-row dangling-mass
  * aggregate (broadcast back), and a left join to the node set —
  * no driver-side graph state; the driver holds the loop counter.
  * Lineage is truncated per round with `localCheckpoint` and stale
  * round blocks are released as soon as the next round materializes
  * (the [[Cluster.connectedComponents]] discipline).
  *
  * EAGER (per [[Storage]]'s contract): each round materializes; call
  * [[Storage.release]] on the result after the terminal action.
  *
  * Overflow bound: `rank_src * w` must stay inside Int64 —
  * rank_src <= V * 1e6 (total mass), so weights up to ~9e18/(V*1e6)
  * are safe (w <= 9e6 even at V = 1e6 nodes); `require`d in
  * [[pageRank]] via an O(1)-row max-weight aggregate before the loop.
  */
object Graph {

  /** Weighted PageRank over a directed edge list. Returns
    * (`id`, `rank_micro`) for every node appearing as a source or
    * destination of any edge. Edge weights must be positive.
    *
    * @param dampingMicro damping factor in micro units (850000 = 0.85)
    * @param iterations   fixed round count (deterministic, replayable)
    */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      wCol: String,
      iterations: Int,
      dampingMicro: Long = 850000L): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(dampingMicro >= 0L && dampingMicro <= 1000000L,
      s"dampingMicro must be in [0, 1e6], got $dampingMicro")
    // every checkpoint taken before the loop is tracked so a failure
    // ANYWHERE below (including the empty-graph guard) releases the
    // partially acquired blocks before rethrowing (the Storage /
    // StorageChaosSpec discipline)
    val acquired = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def ckpt(df: DataFrame): DataFrame = {
      val c = Storage.checkpointed(df); acquired += c; c
    }
    try {
      val e = ckpt(edges
        .selectExpr(s"$srcCol AS src", s"$dstCol AS dst", s"cast($wCol as bigint) AS w")
        .filter(col("w") > 0))
      val nodes = ckpt(e.select(col("src").as("id"))
        .union(e.select(col("dst").as("id")))
        .distinct())
      val nNodes = nodes.count()
      require(nNodes > 0, "pageRank needs at least one positive-weight edge")
      // the documented Int64 bound, enforced: any rank is at most the
      // total mass V·1e6 (mass is conserved up to floor loss), so the
      // per-edge product rank_src·w stays exact iff
      // V·1e6·max(w) < 2^63. One O(1)-row aggregate over the already
      // checkpointed edge frame — constant cost, corpus-independent.
      val maxW = e.agg(max(col("w"))).head.getLong(0)
      require(
        BigInt(nNodes) * BigInt(1000000L) * BigInt(maxW) < BigInt(Long.MaxValue),
        s"pageRank exact-integer contract: nNodes($nNodes) * 1e6 * maxWeight($maxW) " +
          "must stay below 2^63; rescale weights first")
      val teleport = 1000000L - dampingMicro
      // out-weight per source; nodes absent here are dangling
      val outW = ckpt(e.groupBy(col("src")).agg(sum(col("w")).as("ow")))
      val ew = ckpt(e.join(outW, Seq("src"))) // (src, dst, w, ow)
      // loop-invariant dangling node set (no out-edges), computed once
      val danglers = ckpt(
        nodes.join(outW.select(col("src").as("id")), Seq("id"), "left_anti"))
      // e's blocks are no longer reachable once nodes/outW/ew/danglers
      // are materialized above
      Storage.release(e)
      var ranks = ckpt(nodes.select(col("id"), lit(1000000L).as("rank_micro")))
      var stale: Seq[RDD[_]] = checkpointRdds(ranks)
      var round = 0
      while (round < iterations) {
        // tracked too: a failure in a LATER round must release the
        // surviving previous-round blocks (re-releasing rounds already
        // freed via `stale` is a no-op)
        val next = ckpt(
          rankStep(ew, ranks, nodes, danglers, nNodes, dampingMicro, teleport))
        stale.foreach(_.unpersist(blocking = false))
        stale = checkpointRdds(next)
        ranks = next
        round += 1
      }
      // the result is materialized — the graph-side blocks are no
      // longer reachable from it and can be freed (the Cluster
      // discipline)
      Seq(nodes, outW, ew, danglers).foreach(Storage.release)
      ranks
    } catch {
      case t: Throwable =>
        acquired.foreach(Storage.release)
        throw t
    }
  }

  /** One damped iteration: exact-integer inflow + dangling
    * redistribution + teleport. Kept separate so the arithmetic reads
    * like the oracle's unrolled CTE. package-private: PlanAuditSpec
    * audits the per-round join shape here (the public loop
    * checkpoints each round, collapsing it to a LogicalRDD). */
  private[graft] def rankStep(ew: DataFrame, ranks: DataFrame, nodes: DataFrame,
      danglers: DataFrame, nNodes: Long, dampingMicro: Long,
      teleport: Long): DataFrame = {
    val inflow = ew.join(ranks, ew("src") === ranks("id"))
      .selectExpr("dst AS id", "(rank_micro * w) div ow AS c")
      .groupBy(col("id")).agg(sum(col("c")).as("inflow"))
    // dangling mass: rank held by nodes with no out-edges, spread
    // uniformly (floor) — one O(1)-row aggregate, broadcast back
    val dangling = ranks.join(danglers, Seq("id"), "left_semi")
      .agg(coalesce(sum(col("rank_micro")), lit(0L)).as("dm"))
      .selectExpr(s"dm div ${nNodes}L AS dshare")
    nodes.join(inflow, Seq("id"), "left")
      .na.fill(0L, Seq("inflow"))
      .crossJoin(broadcast(dangling))
      .selectExpr("id",
        s"${teleport}L + ($dampingMicro * (inflow + dshare)) div 1000000 AS rank_micro")
  }
}
