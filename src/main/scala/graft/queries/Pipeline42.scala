package graft.queries

import graft.Tables
import graft.operators.{Dedup, Events, Similarity}

/** Round-11 additions, part 7: embedding anisotropy audit, token
  * savings under segment dedup, and per-user peak burst rate.
  */
object Pipeline42 {

  def all: Seq[QueryDef] = Seq(s29, p35, e31)

  private val W = 8 // d22's segment width, priced here

  /** Embedding anisotropy ([[graft.operators.Similarity.anisotropyAudit]]):
    * mean cosine over the pinned unrelated pairing (i vs i+N/2) —
    * near zero means thresholds measure semantics, large positive
    * means they measure the cone. */
  val s29: QueryDef = QueryDef(
    "s29_anisotropy",
    (s, d) => Similarity.anisotropyAudit(Tables.embeddings(s, d)),
    Some(s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
                        FROM embeddings),
      n AS (SELECT vec_id, v, ${DuckOps.norm2("v")} AS nrm FROM e),
      h AS (SELECT (max(vec_id) + 1) // 2 AS half FROM n),
      p AS (SELECT CASE WHEN a.nrm = 0 OR b.nrm = 0 THEN NULL
              ELSE CAST(round((${DuckOps.dot("a.v", "b.v")}
                / (sqrt(a.nrm) * sqrt(b.nrm))) * 1000000) AS BIGINT) END AS cm
            FROM n a JOIN h ON a.vec_id < h.half
              JOIN n b ON b.vec_id = a.vec_id + h.half)
      SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        CAST(count(cm) AS BIGINT) AS n_scored,
        CAST(CASE WHEN count(cm) = 0 THEN 0
          ELSE COALESCE(sum(cm), 0) // count(cm) END AS BIGINT) AS mean_cos_micro,
        CAST(COALESCE(sum(CASE WHEN cm < 0 THEN 1 ELSE 0 END), 0) AS BIGINT)
          AS n_negative,
        CAST(min(cm) AS BIGINT) AS min_cos_micro,
        CAST(max(cm) AS BIGINT) AS max_cos_micro
      FROM p"""))

  /** Token savings under exact segment dedup
    * ([[graft.operators.Dedup.segmentDedupSavings]]): keep one pinned
    * copy per repeated 8-token run; price each source's cut. */
  val p35: QueryDef = QueryDef(
    "p35_dedup_savings",
    (s, d) => Dedup.segmentDedupSavings(Tables.documents(s, d), "text", W),
    Some(s"""WITH t0 AS (SELECT doc_id, source, ${DuckOps.tokens("text")} AS t
               FROM documents),
      t AS (SELECT doc_id, source, ${DuckOps.hashAll("t")} AS th,
              len(t) AS nt FROM t0),
      inst AS (SELECT doc_id, source, u.i AS idx, u.s AS seg,
                 doc_id * 1048576 + u.i AS packed
               FROM (SELECT doc_id, source,
                       unnest(list_transform(range(1, len(th) // $W + 1),
                         i -> {'i': i - 1,
                               's': ${DuckOps.foldHash(s"th[(i - 1) * $W + 1 : i * $W]")}})) AS u
                     FROM t WHERE len(th) >= $W)),
      k AS (SELECT seg, min(packed) AS keep_packed FROM inst GROUP BY 1),
      red AS (SELECT i.source,
                CASE WHEN i.packed <> k.keep_packed THEN 1 ELSE 0 END AS is_red
              FROM inst i JOIN k USING (seg)),
      rs AS (SELECT source, CAST(count(*) AS BIGINT) AS n_segments,
               CAST(COALESCE(sum(is_red), 0) AS BIGINT) AS n_red
             FROM red GROUP BY 1),
      tok AS (SELECT source, CAST(COALESCE(sum(nt), 0) AS BIGINT) AS n_tokens
              FROM t GROUP BY 1)
      SELECT tok.source, tok.n_tokens,
        CAST(COALESCE(rs.n_segments, 0) AS BIGINT) AS n_segments,
        CAST(COALESCE(rs.n_red, 0) AS BIGINT) AS n_redundant_segments,
        CAST(tok.n_tokens - COALESCE(rs.n_red, 0) * $W AS BIGINT)
          AS effective_tokens,
        CAST((CAST(COALESCE(rs.n_red, 0) AS HUGEINT) * $W * 1000000)
          // tok.n_tokens AS BIGINT) AS savings_micro
      FROM tok LEFT JOIN rs USING (source)
      ORDER BY tok.source"""))

  /** Per-user peak burst rate
    * ([[graft.operators.Events.peakUserBurst]]): each user's max
    * events in any trailing 10-minute interval, bucketed. */
  val e31: QueryDef = QueryDef(
    "e31_peak_burst",
    (s, d) => Events.peakUserBurst(Tables.events(s, d), "user_id", "ts", 600000000L),
    Some("""WITH s AS (SELECT user_id AS u, epoch_us(ts) AS tus FROM events),
      b AS (SELECT u, count(*) OVER (PARTITION BY u ORDER BY tus
              RANGE BETWEEN 599999999 PRECEDING AND CURRENT ROW) AS c FROM s),
      m AS (SELECT u, max(c) AS mb FROM b GROUP BY 1)
      SELECT CAST(CASE WHEN mb >= 10 THEN 10 WHEN mb >= 5 THEN 5
               ELSE mb END AS BIGINT) AS bucket,
        CAST(count(*) AS BIGINT) AS n_users
      FROM m GROUP BY 1 ORDER BY 1"""))
}
