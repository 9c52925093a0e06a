package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Graph, TextOps}

/** Round-11 additions, part 42: condensation-DAG cascade depth over
  * the cross-source duplication flow — [[graft.operators.Graph
  * .condensationDepth]] composing c13's SCC closure with d26's edge
  * universe.
  */
object Pipeline77 {

  def all: Seq[QueryDef] = Seq(c17)

  /** Duplication-cascade depth: the d26 flow construction (keeper
    * source → duplicate source per fingerprint group) over the
    * 40-token-PREFIX fingerprint — shared-boilerplate-prefix groups,
    * the near-dup face that actually populates cross-source edges at
    * every test SF (the exact-text face is empty there by generator
    * design; the 10× slice exercises both) — condensed by SCC so
    * mutually-copying source rings collapse to one super-node, each
    * scored with its longest incoming path: 0 = an ultimate origin
    * ring, k = content reaches it through k copying hops. The oracle
    * nests the edge CTE verbatim (single source of truth) and replays
    * closure, condensation, and path depth with recursive CTEs.
    *
    * 100 TB shape: the corpus-sized work is one tokenize+hash pass,
    * the fingerprint agg and two id-keyed joins; everything after
    * lives on the source-vocabulary graph (O(S²) closure,
    * O(components²) depth rounds, one driver Long per round —
    * [[Graph.scc]]'s contract). */
  val c17: QueryDef = QueryDef(
    "c17_dup_cascade_depth",
    (s, d) => {
      // fp is consumed by THREE differently-keyed subtrees (keep's
      // fp-agg, kSrc's keeper join, edges' fp join) — exchange reuse
      // cannot share the tokenize+hash lineage across them, so r16
      // profiling showed the corpus map evaluated 2-3x at ~0.45 s a
      // pass (single-task, hence also parallelFloor'd). Cache it for
      // the duration of the edges materialization.
      val fp = graft.operators.Storage.parallelFloor(Tables.documents(s, d))
        .selectExpr("doc_id", "source", s"${TextOps.tokens("text")} AS t")
        .selectExpr("doc_id", "source",
          s"${TextOps.strHash60("concat_ws(' ', slice(t, 1, 40))")} AS fp")
      fp.cache()
      try {
        val keep = fp.groupBy(col("fp")).agg(min(col("doc_id")).as("keeper"))
        val kSrc = keep.join(
          fp.selectExpr("doc_id AS keeper", "source AS keeper_source"),
          Seq("keeper"))
        val edges = fp.join(kSrc, Seq("fp"))
          .filter(col("doc_id") =!= col("keeper") &&
            col("keeper_source") =!= col("source"))
          .select(col("keeper_source").as("ks"), col("source").as("ds"))
          .distinct()
        // the O(S²) edge frame is re-read by scc's closure seed AND the
        // condensation join — cache it so the tokenize+join lineage
        // runs once, not once per graph-loop consumer (withCached
        // materializes the result BEFORE fp is released)
        graft.operators.Storage.withCached(edges)(e =>
          Graph.condensationDepth(e, "ks", "ds").orderBy(col("scc_id")))
      } finally fp.unpersist(blocking = false)
    },
    Some(s"""WITH RECURSIVE tk AS (SELECT doc_id, source,
          ${DuckOps.tokens("text")} AS t FROM documents),
      fp AS MATERIALIZED (
        SELECT doc_id, source,
          ${DuckOps.strHash60("array_to_string(t[1:40], ' ')")} AS fp
        FROM tk),
      keep AS (SELECT fp, min(doc_id) AS keeper FROM fp GROUP BY 1),
      ks AS (SELECT keep.fp, keep.keeper, f.source AS keeper_source
             FROM keep JOIN fp f ON keep.keeper = f.doc_id),
      ed AS MATERIALIZED (
        SELECT DISTINCT ks.keeper_source AS s, m.source AS t
        FROM fp m JOIN ks ON m.fp = ks.fp
        WHERE m.doc_id <> ks.keeper AND ks.keeper_source <> m.source),
      nodes AS (SELECT s AS n FROM ed UNION SELECT t FROM ed),
      reach(s, t) AS (
        SELECT n, n FROM nodes
        UNION
        SELECT r.s, e.t FROM reach r JOIN ed e ON r.t = e.s),
      mutual AS (SELECT r1.s, r1.t
                 FROM reach r1 JOIN reach r2 ON r1.s = r2.t AND r1.t = r2.s),
      lab AS (SELECT s AS node, min(t) AS scc_id FROM mutual GROUP BY 1),
      cond AS MATERIALIZED (
        SELECT DISTINCT l1.scc_id AS s, l2.scc_id AS t
        FROM ed JOIN lab l1 ON ed.s = l1.node JOIN lab l2 ON ed.t = l2.node
        WHERE l1.scc_id <> l2.scc_id),
      cn AS (SELECT DISTINCT scc_id FROM lab),
      paths(n, dd) AS (
        SELECT scc_id, 0 FROM cn
        UNION
        SELECT c.t, p.dd + 1 FROM paths p JOIN cond c ON p.n = c.s),
      dep AS (SELECT n AS scc_id, CAST(max(dd) AS BIGINT) AS depth
              FROM paths GROUP BY 1),
      sz AS (SELECT scc_id, CAST(count(*) AS BIGINT) AS scc_size
             FROM lab GROUP BY 1)
      SELECT dep.scc_id, dep.depth, sz.scc_size
      FROM dep JOIN sz ON dep.scc_id = sz.scc_id
      ORDER BY dep.scc_id"""))
}
