package graft.queries

import graft.Tables
import graft.operators.{Dedup, Profile}

/** Round-15 additions, part 90: the source×source union-MinHash
  * overlap matrix (mergeable-sketch corpus diagnostics) and the
  * join-strategy advisor (q93's skew audit asked of both sides of a
  * prospective join, folded into the broadcast/salt/shuffle call).
  */
object Pipeline101 {

  def all: Seq[QueryDef] = Seq(d38, q94)

  /** Union-MinHash(32) 3-gram overlap estimates for every source
    * pair. The oracle folds the same per-doc signatures with
    * element-wise mins. */
  val d38: QueryDef = QueryDef(
    "d38_source_overlap_sketch",
    (s, d) => Dedup.sourceOverlapSketch(Tables.documents(s, d), "text", 3, 32),
    Some(s"""WITH toks AS (SELECT source, doc_id, ${DuckOps.tokens("text")} AS t
               FROM documents),
      sh AS (SELECT source, doc_id, ${DuckOps.shingles("t", 3)} AS s FROM toks),
      hs AS (SELECT source, doc_id, list_distinct(
               list_transform(s, x -> ${DuckOps.strHash60("x")})) AS h FROM sh),
      sig AS (SELECT source, ${DuckOps.minhashSig("h", 32)} AS sig FROM hs),
      slot AS (SELECT source, i, min(sig[i]) AS v
               FROM sig, unnest(range(1, 33)) AS t(i) GROUP BY 1, 2),
      ssig AS (SELECT source, list(v ORDER BY i) AS sig FROM slot GROUP BY 1),
      pairs AS (SELECT a.source AS s1, b.source AS s2,
          CAST(len(list_filter(range(1, 33),
            i -> a.sig[i] = b.sig[i])) AS BIGINT) AS matches
        FROM ssig a JOIN ssig b ON a.source < b.source)
      SELECT s1, s2, matches,
        CAST(matches * 1000000 // 32 AS BIGINT) AS est_jaccard_micro
      FROM pairs ORDER BY s1, s2"""))

  /** Join advisor for orders ⋈ lineitem on the order key, broadcast
    * budget 20k rows, skew threshold 20%: at sf0.001/sf0.01 the
    * orders side fits the broadcast budget; at sf0.1 neither does and
    * the uniform key spread reads plain shuffle — the decision
    * changes with scale, which is the point of measuring. */
  val q94: QueryDef = QueryDef(
    "q94_join_advisor",
    (s, d) => Profile.joinAdvisor(
      Tables.load(s, d, "orders"), "o_orderkey",
      Tables.load(s, d, "lineitem"), "l_orderkey",
      broadcastRows = 20000L, skewShareMicro = 200000L),
    Some("""WITH lgs AS (SELECT o_orderkey AS k, CAST(count(*) AS BIGINT) AS c
               FROM orders GROUP BY 1),
      ltot AS (SELECT CAST(count(*) AS BIGINT) AS l_keys,
          CAST(sum(c) AS BIGINT) AS l_rows,
          CAST(max(c) AS BIGINT) AS l_max_key_rows FROM lgs),
      l AS (SELECT l_rows, l_keys, l_max_key_rows,
          CAST((CAST(l_max_key_rows AS HUGEINT) * 1000000) // l_rows
            AS BIGINT) AS l_top1_micro FROM ltot),
      rgs AS (SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS c
               FROM lineitem GROUP BY 1),
      rtot AS (SELECT CAST(count(*) AS BIGINT) AS r_keys,
          CAST(sum(c) AS BIGINT) AS r_rows,
          CAST(max(c) AS BIGINT) AS r_max_key_rows FROM rgs),
      r AS (SELECT r_rows, r_keys, r_max_key_rows,
          CAST((CAST(r_max_key_rows AS HUGEINT) * 1000000) // r_rows
            AS BIGINT) AS r_top1_micro FROM rtot)
      SELECT l_rows, l_keys, l_max_key_rows, l_top1_micro,
        r_rows, r_keys, r_max_key_rows, r_top1_micro,
        CASE WHEN least(l_rows, r_rows) <= 20000 THEN 'broadcast'
          WHEN greatest(l_top1_micro, r_top1_micro) >= 200000
            THEN 'salted_shuffle'
          ELSE 'shuffle_join' END AS strategy,
        CASE WHEN least(l_rows, r_rows) <= 20000 THEN
          CASE WHEN l_rows <= r_rows THEN 'left' ELSE 'right' END
          ELSE NULL END AS broadcast_side
      FROM l, r"""))
}
