package graft.queries

import graft.Tables
import graft.operators.Similarity

/** Round-15 additions, part 92: cluster-balanced coreset sampling —
  * the s40 k-center selection put to work as a diversity-BALANCED
  * subsample (equal seats per embedding-space region).
  */
object Pipeline103 {

  def all: Seq[QueryDef] = Seq(p60)

  /** k = 8 strata, 10 seats each, salt 'p60'. Oracle replays the
    * k-center chain, the argmin assignment (ties to the lowest center
    * id) and the salted-hash seat ranking. */
  val p60: QueryDef = QueryDef(
    "p60_coreset_sample",
    (s, d) => Similarity.coresetSample(Tables.embeddings(s, d),
      Pipeline98.K, perStratum = 10, salt = "p60"),
    Some {
      val centers = (2 to Pipeline98.K)
        .map(i => s"UNION ALL SELECT cid FROM c$i").mkString(" ")
      s"""WITH ${Pipeline98.kcenterChain},
      centers AS (SELECT vec_id AS cid FROM c1 $centers),
      cvec AS (SELECT n.vec_id AS cid, n.v AS cv, n.nrm AS cn
               FROM n JOIN centers ON n.vec_id = centers.cid),
      asg0 AS (SELECT n.vec_id, cvec.cid,
                 n.nrm + cvec.cn - 2 * ${DuckOps.dot("n.v", "cvec.cv")} AS d2
               FROM n, cvec),
      asg AS (SELECT vec_id, cid AS centroid, d2,
                row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid)
                  AS brk
              FROM asg0),
      best AS (SELECT vec_id, centroid, d2 FROM asg WHERE brk = 1),
      sam AS (SELECT centroid, vec_id, d2,
                ${DuckOps.strHash60("concat('p60', ':', CAST(vec_id AS VARCHAR))")}
                  AS hkey
              FROM best),
      rked AS (SELECT centroid, vec_id, d2,
                 row_number() OVER (PARTITION BY centroid
                   ORDER BY hkey, vec_id) AS rk
               FROM sam)
      SELECT centroid, CAST(rk AS BIGINT) AS rk, vec_id, d2
      FROM rked WHERE rk <= 10 ORDER BY centroid, rk"""
    })
}
