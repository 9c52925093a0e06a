package graft.queries

import graft.Tables
import graft.operators.{Dedup, Similarity}

/** Round-15 additions, part 87: the k-anonymity rare-window privacy
  * audit (the dedup family's inverse question — windows that occur too
  * RARELY) and greedy k-center coreset selection (the diversity
  * counterpart to SemDeDup's redundancy removal).
  */
object Pipeline98 {

  def all: Seq[QueryDef] = Seq(d37, s40)

  /** Rare-window (k-anonymity) audit at n = 8, kAnon = 3: per source,
    * total window mass, windows with corpus frequency < 3, the rare
    * share, docs carrying any rare window, and the worst doc. */
  val d37: QueryDef = QueryDef(
    "d37_rare_window_kanon",
    (s, d) => Dedup.rareWindowAudit(Tables.documents(s, d), "text", 8, 3),
    Some(s"""WITH tk AS (SELECT source, doc_id,
               ${DuckOps.tokens("text")} AS t FROM documents),
      occ AS (SELECT source, doc_id,
          unnest(list_transform(${DuckOps.shingles("t", 8)},
            s -> ${DuckOps.strHash60("s")})) AS sgl
        FROM tk),
      df AS (SELECT sgl, CAST(count(*) AS BIGINT) AS c FROM occ GROUP BY 1),
      pd AS (SELECT source, doc_id, CAST(count(*) AS BIGINT) AS w_all,
          CAST(sum(CASE WHEN c < 3 THEN 1 ELSE 0 END) AS BIGINT) AS w_rare
        FROM occ JOIN df USING (sgl) GROUP BY 1, 2),
      ps AS (SELECT source, CAST(sum(w_all) AS BIGINT) AS n_windows,
          CAST(sum(w_rare) AS BIGINT) AS n_rare,
          CAST(sum(CASE WHEN w_rare > 0 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_docs_rare
        FROM pd GROUP BY 1),
      top AS (SELECT source, doc_id AS top_doc_id, w_rare AS top_doc_rare,
          row_number() OVER (PARTITION BY source
            ORDER BY w_rare DESC, doc_id ASC) AS rn
        FROM pd)
      SELECT ps.source, n_windows, n_rare,
        CAST((CAST(n_rare AS HUGEINT) * 1000000) // n_windows AS BIGINT)
          AS rare_share_micro,
        n_docs_rare, top_doc_id, top_doc_rare
      FROM ps JOIN top ON ps.source = top.source AND rn = 1
      ORDER BY ps.source"""))

  private[queries] val K = 8

  /** The greedy k-center CTE chain shared by s40 and p60: defines
    * `n` (vec_id, v, nrm), c1..cK (selected centers with their
    * selection distance `cd` from c2 on) and d1..dK (running
    * min-distance frames). */
  private[queries] val kcenterChain: String = {
    val steps = (2 to K).map { i =>
      val p = s"d${i - 1}"
      s""",
      c$i AS (SELECT vec_id AS cid, v AS cv, nrm AS cn, md AS cd
              FROM $p ORDER BY md DESC, vec_id LIMIT 1),
      d$i AS (SELECT $p.vec_id, $p.v, $p.nrm,
              least($p.md, $p.nrm + c$i.cn - 2 * ${DuckOps.dot(s"$p.v", s"c$i.cv")}) AS md
              FROM $p, c$i)"""
    }.mkString
    s"""e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
               FROM embeddings),
      n AS (SELECT vec_id, v, ${DuckOps.norm2("v")} AS nrm FROM e),
      c1 AS (SELECT vec_id, v, nrm FROM n ORDER BY vec_id LIMIT 1),
      d1 AS (SELECT n.vec_id, n.v, n.nrm,
             n.nrm + c1.nrm - 2 * ${DuckOps.dot("n.v", "c1.v")} AS md
             FROM n, c1)$steps"""
  }

  /** Greedy k-center (k = 8) from the lowest vec_id; the oracle
    * unrolls the identical 8-step farthest-point fold, so even the
    * DOUBLE selection distances hash-match. */
  val s40: QueryDef = QueryDef(
    "s40_kcenter_coreset",
    (s, d) => Similarity.kCenterCoreset(Tables.embeddings(s, d), K),
    Some {
      val tail = (2 to K).map(i =>
        s"UNION ALL SELECT ${i}::BIGINT, c$i.cid, c$i.cd FROM c$i").mkString("\n      ")
      s"""WITH $kcenterChain
      SELECT * FROM (
      SELECT 1::BIGINT AS rk, c1.vec_id, NULL::DOUBLE AS dist2_sel FROM c1
      $tail) ORDER BY rk"""
    })
}
