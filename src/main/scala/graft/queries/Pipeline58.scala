package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Similarity, TextOps}

/** Round-11 additions, part 23: cross-source duplication flow and
  * the ANN recall@k curve.
  */
object Pipeline58 {

  def all: Seq[QueryDef] = Seq(d26, s34)

  /** Cross-source duplication FLOW: for every exact-dup group (d01's
    * fingerprint), the keeper's source vs each duplicate member's
    * source — the provenance matrix that says who copies whom
    * (mirrors syndicate from origins; scrapers shadow both). One
    * fingerprint agg + two id-keyed equi-joins; fan-out bounded by
    * dup-group size. */
  val d26: QueryDef = QueryDef(
    "d26_dup_flow",
    (s, d) => {
      val fp = Tables.documents(s, d)
        .selectExpr("doc_id", "source", s"${TextOps.strHash60("text")} AS fp")
      val keep = fp.groupBy(col("fp")).agg(min(col("doc_id")).as("keeper"))
      val kSrc = keep.join(fp.selectExpr("doc_id AS keeper", "source AS keeper_source"),
        Seq("keeper"))
      fp.join(kSrc, Seq("fp"))
        .filter(col("doc_id") =!= col("keeper"))
        .groupBy(col("keeper_source"), col("source").as("dup_source"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("keeper_source"), col("dup_source"))
    },
    Some(s"""WITH fp AS (SELECT doc_id, source, ${DuckOps.strHash60("text")} AS fp
               FROM documents),
      keep AS (SELECT fp, min(doc_id) AS keeper FROM fp GROUP BY 1),
      ks AS (SELECT keep.fp, keep.keeper, f.source AS keeper_source
             FROM keep JOIN fp f ON keep.keeper = f.doc_id)
      SELECT ks.keeper_source, m.source AS dup_source,
        CAST(count(*) AS BIGINT) AS n_docs
      FROM fp m JOIN ks ON m.fp = ks.fp
      WHERE m.doc_id <> ks.keeper
      GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** ANN recall@k curve: the 16-plane LSH top-k (s02's audited
    * machinery) scored against the exact top-k at k = 1, 5, 10 —
    * mean recall per cutoff in micro units, the one-glance quality
    * curve an index ships with (s05 pinned k=3 overlap; this reads
    * the CURVE). Both rankings replayed fully by the oracle, so the
    * recall numbers are cell-exact, not sampled. */
  val s34: QueryDef = QueryDef(
    "s34_recall_curve",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val exact = Similarity.cosineTopK(emb, 10, 10)
        .select(col("q_id"), col("rk"), col("n_id"))
      val ann = Similarity.lshTopK(emb, 10, 10)
        .select(col("q_id").as("aq"), col("rk").as("ark"), col("n_id").as("an"))
      val ks = s.range(0, 3).selectExpr(
        "element_at(array(1L, 5L, 10L), cast(id as int) + 1) AS k")
      val hits = exact.crossJoin(broadcast(ks))
        .filter(col("rk") <= col("k"))
        .join(ann, col("q_id") === col("aq") && col("n_id") === col("an") &&
          col("ark") <= col("k"), "left")
        .selectExpr("k", "q_id", "cast(an is not null as bigint) AS hit")
        .groupBy(col("k"))
        .agg(countDistinct(col("q_id")).as("n_queries"),
          coalesce(sum(col("hit")), lit(0L)).as("n_hits"))
      hits.selectExpr("k", "n_queries", "n_hits",
          "cast((cast(n_hits as decimal(38,0)) * 1000000) div (k * n_queries) as bigint) AS mean_recall_micro")
        .orderBy(col("k"))
    },
    Some(s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
                        FROM embeddings),
      n AS (SELECT vec_id, v, ${DuckOps.norm2("v")} AS nrm,
              list_reduce(list_concat([0::BIGINT], list_transform(range(0, ${Similarity.NPlanes}), p ->
                CASE WHEN list_reduce(list_concat([0.0::DOUBLE],
                    list_transform(range(1, 65), d ->
                      v[d] * CAST(${Similarity.planeWeight} AS DOUBLE))),
                    (acc, x) -> acc + x) > 0
                THEN (1::BIGINT << p) ELSE 0::BIGINT END)), (a, x) -> a + x) AS bucket
            FROM e),
      px AS (SELECT q.vec_id AS q_id, c.vec_id AS n_id,
              ${DuckOps.dot("q.v", "c.v")} / (sqrt(q.nrm) * sqrt(c.nrm)) AS cos
            FROM n q JOIN n c ON q.vec_id < 10 AND c.vec_id <> q.vec_id),
      et AS (SELECT q_id, n_id, row_number() OVER (PARTITION BY q_id
               ORDER BY cos DESC, n_id ASC) AS rk FROM px),
      pa AS (SELECT q.vec_id AS q_id, c.vec_id AS n_id,
              ${DuckOps.dot("q.v", "c.v")} / (sqrt(q.nrm) * sqrt(c.nrm)) AS cos
            FROM n q JOIN n c
            ON q.vec_id < 10 AND q.bucket = c.bucket AND c.vec_id <> q.vec_id),
      at AS (SELECT q_id, n_id, row_number() OVER (PARTITION BY q_id
               ORDER BY cos DESC, n_id ASC) AS rk FROM pa),
      ks AS (SELECT CAST(k AS BIGINT) AS k FROM unnest([1, 5, 10]) AS t(k)),
      h AS (SELECT ks.k, et.q_id,
              CASE WHEN at.n_id IS NOT NULL THEN 1 ELSE 0 END AS hit
            FROM et CROSS JOIN ks
              LEFT JOIN at ON et.q_id = at.q_id AND et.n_id = at.n_id
                AND at.rk <= ks.k
            WHERE et.rk <= ks.k)
      SELECT k, CAST(count(DISTINCT q_id) AS BIGINT) AS n_queries,
        CAST(COALESCE(sum(hit), 0) AS BIGINT) AS n_hits,
        CAST((CAST(COALESCE(sum(hit), 0) AS HUGEINT) * 1000000)
          // (k * count(DISTINCT q_id)) AS BIGINT) AS mean_recall_micro
      FROM h GROUP BY 1 ORDER BY 1"""))
}
