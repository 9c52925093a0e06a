package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Dedup, Graph, LanguageModel}

/** Round-10 additions: triangle counting over derived graphs
  * (degree-ordered, the second graph-analytics primitive after c02's
  * PageRank), repetition-aware weighted-Jaccard dedup, per-doc n-gram
  * novelty scoring, and collocation mining by exact-integer
  * association lift — four operators a corpus-curation stack layers
  * on top of the existing dedup/graph surface.
  */
object Pipeline11 {

  def all: Seq[QueryDef] = Seq(c03, d09, p21, t24)

  /** The inter-nation trade edge list shared with c02: an edge
    * cust_nation -> supp_nation per (customer, supplier) trade flow,
    * weighted by lineitem count. */
  private def tradeEdges(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
      .agg(count(lit(1)).as("w"))

  private val tradeEdgesSql =
    """e AS (SELECT c.c_nationkey AS src, s.s_nationkey AS dst
             FROM lineitem l
               JOIN orders o ON l.l_orderkey = o.o_orderkey
               JOIN customer c ON o.o_custkey = c.c_custkey
               JOIN supplier s ON l.l_suppkey = s.s_suppkey
             GROUP BY 1, 2)"""

  /** Per-nation triangle participation
    * ([[graft.operators.Graph.triangleCounts]]) in the undirected
    * trade graph — "how embedded is each nation in 3-way trade
    * cliques". The Spark side runs the degree-ORIENTED enumeration
    * (wedge fan-out bounded O(E^1.5) — the shape that survives a
    * celebrity node at 100 TB); the oracle replays the naive
    * a < b < c three-way join, which must produce the identical
    * triangle set — orientation changes the plan, never the answer. */
  val c03: QueryDef = QueryDef(
    "c03_triangles",
    (s, d) => Graph.triangleCounts(tradeEdges(s, d), "src", "dst")
      .join(Tables.nation(s, d), col("id") === col("n_nationkey"))
      .select(col("id").cast("long").as("nation_id"),
        col("n_name").as("nation"), col("tri_n"))
      .orderBy(col("nation_id")),
    Some(s"""WITH $tradeEdgesSql,
      und AS (SELECT least(src, dst) AS a, greatest(src, dst) AS b
              FROM e WHERE src <> dst GROUP BY 1, 2),
      tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
              FROM und e1
                JOIN und e2 ON e2.a = e1.a AND e2.b > e1.b
                JOIN und e3 ON e3.a = e1.b AND e3.b = e2.b),
      verts AS (SELECT x AS id FROM tri UNION ALL
                SELECT y FROM tri UNION ALL
                SELECT z FROM tri),
      cnt AS (SELECT id, CAST(count(*) AS BIGINT) AS tri_n FROM verts GROUP BY 1),
      nodes AS (SELECT a AS id FROM und UNION SELECT b FROM und)
      SELECT CAST(n.id AS BIGINT) AS nation_id, nat.n_name AS nation,
        CAST(COALESCE(cnt.tri_n, 0) AS BIGINT) AS tri_n
      FROM nodes n
        JOIN nation nat ON n.id = nat.n_nationkey
        LEFT JOIN cnt ON n.id = cnt.id
      ORDER BY nation_id"""))

  /** Weighted (multiset) Jaccard pairs
    * ([[graft.operators.Dedup.weightedJaccardPairs]]): token-COUNT
    * overlap >= 0.3 over candidates from the capped 3-gram machinery
    * (df cap 64, d02's audited bound). Catches repetition asymmetry
    * that set Jaccard flattens. The oracle replays candidate
    * generation (cap == df prune), the shared-term min-sum, and the
    * sum-max identity T1 + T2 - minsum. */
  val d09: QueryDef = QueryDef(
    "d09_weighted_jaccard",
    (s, d) => Dedup.weightedJaccardPairs(Tables.documents(s, d), "text", 3, 0.3,
        maxDocFreq = 64)
      .orderBy(col("d1"), col("d2")),
    Some(s"""WITH toks AS (SELECT doc_id, ${DuckOps.tokens("text")} AS t FROM documents),
      sh AS (SELECT doc_id, ${DuckOps.shingles("t", 3)} AS s FROM toks),
      hsets AS (SELECT doc_id,
          list_distinct(list_transform(s, x -> ${DuckOps.strHash60("x")})) AS hs FROM sh),
      e AS (SELECT doc_id, unnest(hs) AS sgl FROM hsets),
      hot AS (SELECT sgl FROM e GROUP BY sgl HAVING count(*) > 64),
      kept AS (SELECT doc_id, sgl FROM e ANTI JOIN hot USING (sgl)),
      cand AS (SELECT a.doc_id AS d1, b.doc_id AS d2
               FROM kept a JOIN kept b ON a.sgl = b.sgl AND a.doc_id < b.doc_id
               GROUP BY 1, 2),
      tc AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS c
             FROM (SELECT doc_id, unnest(t) AS term FROM toks) GROUP BY 1, 2),
      tot AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS t FROM tc GROUP BY 1),
      ms AS (SELECT cand.d1, cand.d2, CAST(sum(least(a.c, b.c)) AS BIGINT) AS minsum
             FROM cand
               JOIN tc a ON cand.d1 = a.doc_id
               JOIN tc b ON cand.d2 = b.doc_id AND a.term = b.term
             GROUP BY 1, 2)
      SELECT ms.d1, ms.d2, ms.minsum, t1.t AS t1, t2.t AS t2,
        CAST(ms.minsum AS DOUBLE) / CAST(t1.t + t2.t - ms.minsum AS DOUBLE) AS wjaccard
      FROM ms JOIN tot t1 ON ms.d1 = t1.doc_id JOIN tot t2 ON ms.d2 = t2.doc_id
      WHERE CAST(ms.minsum AS DOUBLE) / CAST(t1.t + t2.t - ms.minsum AS DOUBLE) >= 0.3
      ORDER BY d1, d2"""))

  /** Per-doc 5-gram novelty ([[graft.operators.Dedup.noveltyScores]]):
    * the micro-unit fraction of a doc's distinct shingles with corpus
    * doc-frequency 1 — the linear-cost inverse-boilerplate signal
    * (no pair generation; one shingle-keyed and one doc-keyed
    * partial-agg shuffle). */
  val p21: QueryDef = QueryDef(
    "p21_novelty",
    (s, d) => Dedup.noveltyScores(Tables.documents(s, d), "text", 5)
      .orderBy(col("doc_id")),
    Some(s"""WITH toks AS (SELECT doc_id, ${DuckOps.tokens("text")} AS t FROM documents),
      sh AS (SELECT doc_id, ${DuckOps.shingles("t", 5)} AS s FROM toks),
      hsets AS (SELECT doc_id,
          list_distinct(list_transform(s, x -> ${DuckOps.strHash60("x")})) AS hs FROM sh),
      e AS (SELECT doc_id, unnest(hs) AS sgl FROM hsets),
      dfq AS (SELECT sgl, CAST(count(*) AS BIGINT) AS df FROM e GROUP BY 1),
      agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
                CAST(sum(CASE WHEN dfq.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique
              FROM e JOIN dfq USING (sgl) GROUP BY 1)
      SELECT doc_id, n_shingles, n_unique,
        CAST((n_unique * 1000000) // n_shingles AS BIGINT) AS novelty_micro
      FROM agg ORDER BY doc_id"""))

  /** Collocation mining
    * ([[graft.operators.LanguageModel.pmiCollocations]]): top-100
    * adjacent token pairs by exact-integer association lift
    * (cxy * T * 1e6 // (cx * cy), min count 5), total ORDER BY for a
    * deterministic cut. The oracle rebuilds bigram/unigram counts and
    * the identical floor arithmetic. */
  val t24: QueryDef = QueryDef(
    "t24_collocations",
    (s, d) => LanguageModel.pmiCollocations(Tables.documents(s, d), "text",
      minCount = 5L, topK = 100),
    Some(s"""WITH tk AS (SELECT ${DuckOps.tokens("text")} AS t FROM documents),
      bg AS (SELECT unnest(${DuckOps.shingles("t", 2)}) AS s FROM tk WHERE len(t) >= 2),
      bi AS (SELECT split_part(s, ' ', 1) AS x, split_part(s, ' ', 2) AS y,
               CAST(count(*) AS BIGINT) AS cxy
             FROM bg GROUP BY 1, 2 HAVING count(*) >= 5),
      un AS (SELECT w, CAST(count(*) AS BIGINT) AS c
             FROM (SELECT unnest(t) AS w FROM tk) GROUP BY 1),
      tt AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM un)
      SELECT bi.x, bi.y, bi.cxy, ux.c AS cx, uy.c AS cy,
        CAST((bi.cxy * tt.t * 1000000) // (ux.c * uy.c) AS BIGINT) AS lift_micro
      FROM bi JOIN un ux ON bi.x = ux.w JOIN un uy ON bi.y = uy.w, tt
      ORDER BY lift_micro DESC, x, y LIMIT 100"""))
}
