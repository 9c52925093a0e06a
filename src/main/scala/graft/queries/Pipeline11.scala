package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Dedup, Graph, LanguageModel, Similarity, TextOps}

/** Round-10 additions: triangle counting over derived graphs
  * (degree-ordered, the second graph-analytics primitive after c02's
  * PageRank), repetition-aware weighted-Jaccard dedup, per-doc n-gram
  * novelty scoring, and collocation mining by exact-integer
  * association lift — four operators a corpus-curation stack layers
  * on top of the existing dedup/graph surface.
  */
object Pipeline11 {

  def all: Seq[QueryDef] = Seq(c03, d09, p21, t24, s18, t25)

  /** The inter-nation trade edge list shared with c02: an edge
    * cust_nation -> supp_nation per (customer, supplier) trade flow,
    * weighted by lineitem count. */
  private[queries] def tradeEdges(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
      .agg(count(lit(1)).as("w"))

  private[queries] val tradeEdgesSql =
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
    * overlap >= 0.4 over candidates from the capped 5-GRAM machinery
    * (df cap 64, d02's audited bound). 5-gram candidates, not 3-gram:
    * at sf0.1 the 3-gram candidate graph is ~1M pairs (every shared
    * stock phrase), and the min-sum pass pays candidates × vocab —
    * the longer shingle keeps candidate generation selective the way
    * a production near-dup pass would (bench: 7.9 s -> well under
    * half). Catches repetition asymmetry that set Jaccard flattens.
    * The oracle replays candidate generation (cap == df prune), the
    * shared-term min-sum, and the sum-max identity T1 + T2 - minsum. */
  val d09: QueryDef = QueryDef(
    "d09_weighted_jaccard",
    (s, d) => Dedup.weightedJaccardPairs(Tables.documents(s, d), "text", 5, 0.4,
        maxDocFreq = 64)
      .orderBy(col("d1"), col("d2")),
    Some(s"""WITH toks AS (SELECT doc_id, ${DuckOps.tokens("text")} AS t FROM documents),
      sh AS (SELECT doc_id, ${DuckOps.shingles("t", 5)} AS s FROM toks),
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
      WHERE CAST(ms.minsum AS DOUBLE) / CAST(t1.t + t2.t - ms.minsum AS DOUBLE) >= 0.4
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

  /** MMR constants shared by the Spark call and the generated oracle
    * CTEs (the c02 single-source-of-truth discipline). */
  private val MmrLambda = 700000L
  private val MmrOneMinus = 1000000L - MmrLambda

  /** One MMR selection round as DuckDB CTEs — the exact-integer twin
    * of [[graft.operators.Similarity.mmrRerank]]'s loop body: drop
    * already-selected candidates, max similarity to the selected set,
    * undivided p12 score, argmax with n_id tie-break. */
  private def mmrStep(r: Int): String = {
    val prev = s"sel${r - 1}"
    s"""m$r AS (SELECT c.q_id, c.n_id, c.rel_micro, max(s.sim_micro) AS ms_micro
             FROM cand c
               ANTI JOIN $prev px ON c.q_id = px.q_id AND c.n_id = px.n_id
               JOIN sims s ON s.q_id = c.q_id AND s.a = c.n_id
               JOIN $prev pb ON pb.q_id = s.q_id AND pb.n_id = s.b
             GROUP BY 1, 2, 3),
      s$r AS (SELECT q_id, n_id, rel_micro, ms_micro,
                $MmrLambda * rel_micro - $MmrOneMinus * ms_micro AS score_p12,
                CAST($r AS BIGINT) AS rank
              FROM (SELECT *, row_number() OVER (PARTITION BY q_id
                      ORDER BY ($MmrLambda * rel_micro - $MmrOneMinus * ms_micro) DESC,
                        n_id ASC) AS rn
                    FROM m$r) WHERE rn = 1),
      sel$r AS (SELECT q_id, n_id FROM $prev UNION ALL SELECT q_id, n_id FROM s$r)"""
  }

  /** MMR diversified re-rank
    * ([[graft.operators.Similarity.mmrRerank]]): each query's brute
    * top-10 cosine pool greedily re-ranked to 3 results trading
    * relevance against redundancy (λ = 0.7). All scores are
    * micro-quantized integers and the MMR score is an UNDIVIDED p12
    * value (negative-safe: Spark div truncates where DuckDB floors,
    * so the contract is never to divide); the oracle unrolls the
    * greedy loop as generated CTEs. */
  val s18: QueryDef = QueryDef(
    "s18_mmr_rerank",
    (s, d) => Similarity.mmrRerank(Tables.embeddings(s, d), "vec_id < 8",
        pool = 10, k = 3, lambdaMicro = MmrLambda)
      .orderBy(col("q_id"), col("rank")),
    Some(s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
                        FROM embeddings),
      n AS (SELECT vec_id, v, ${DuckOps.norm2("v")} AS nrm FROM e),
      pq AS (SELECT q.vec_id AS q_id, c.vec_id AS n_id,
               ${DuckOps.dot("q.v", "c.v")} / (sqrt(q.nrm) * sqrt(c.nrm)) AS cos
             FROM n q JOIN n c ON q.vec_id < 8 AND c.vec_id <> q.vec_id),
      cand AS (SELECT q_id, n_id, CAST(round(cos * 1000000) AS BIGINT) AS rel_micro
               FROM (SELECT q_id, n_id, cos,
                       row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rk
                     FROM pq) WHERE rk <= 10),
      simp AS (SELECT ca.q_id, ca.n_id AS a, cb.n_id AS b,
                 CAST(round((${DuckOps.dot("na.v", "nb.v")} /
                   (sqrt(na.nrm) * sqrt(nb.nrm))) * 1000000) AS BIGINT) AS sim_micro
               FROM cand ca
                 JOIN cand cb ON cb.q_id = ca.q_id AND ca.n_id < cb.n_id
                 JOIN n na ON na.vec_id = ca.n_id
                 JOIN n nb ON nb.vec_id = cb.n_id),
      sims AS (SELECT q_id, a, b, sim_micro FROM simp UNION ALL
               SELECT q_id, b AS a, a AS b, sim_micro FROM simp),
      s1 AS (SELECT q_id, n_id, rel_micro, CAST(0 AS BIGINT) AS ms_micro,
               $MmrLambda * rel_micro AS score_p12, CAST(1 AS BIGINT) AS rank
             FROM (SELECT *, row_number() OVER (PARTITION BY q_id
                     ORDER BY ($MmrLambda * rel_micro) DESC, n_id ASC) AS rn
                   FROM cand) WHERE rn = 1),
      sel1 AS (SELECT q_id, n_id FROM s1),
      ${(2 to 3).map(mmrStep).mkString(",\n      ")}
      SELECT q_id, rank, n_id, rel_micro, ms_micro, score_p12
      FROM (SELECT * FROM s1 UNION ALL SELECT * FROM s2 UNION ALL SELECT * FROM s3)
      ORDER BY q_id, rank"""))

  /** Flesch-style readability ([[graft.operators.TextOps.readability]]):
    * map-only exact-integer scoring with engine-deterministic sentence
    * (terminal-punctuation runs) and syllable (vowel-group) surrogates. */
  val t25: QueryDef = QueryDef(
    "t25_readability",
    (s, d) => TextOps.readability(Tables.documents(s, d), "text")
      .orderBy(col("doc_id")),
    Some(s"""WITH b AS (SELECT doc_id,
               CAST(len(${DuckOps.tokens("text")}) AS BIGINT) AS n_words,
               greatest(CAST(1 AS BIGINT),
                 CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT)) AS n_sentences,
               CAST(len(regexp_extract_all(lower(text), '[aeiou]+')) AS BIGINT) AS n_vowel_groups
             FROM documents)
      SELECT doc_id, n_words, n_sentences, n_vowel_groups,
        CAST(206835000 - (1015000 * n_words) // n_sentences
          - (84600000 * n_vowel_groups) // n_words AS BIGINT) AS flesch_micro
      FROM b WHERE n_words > 0 ORDER BY doc_id"""))

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
