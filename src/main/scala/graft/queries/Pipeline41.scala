package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Decontaminate, Dedup, Graph}

/** Round-11 additions, part 6: paragraph-granularity duplication
  * accounting, the eval-side n-gram contamination audit, and the
  * bipartite co-occurrence projection.
  */
object Pipeline41 {

  def all: Seq[QueryDef] = Seq(d22, t37, c09)

  private val W = 8 // segment width (tokens) for d22

  /** Per-source duplicated-segment mass
    * ([[graft.operators.Dedup.segmentDupStats]]): docs cut into
    * non-overlapping 8-token segments, an instance is duplicated
    * when the same token run appears in >= 2 docs; report each
    * source's segment counts and duplicated micro-share — the
    * corpus-curation number behind "dedup before training". */
  val d22: QueryDef = QueryDef(
    "d22_segment_dup_mass",
    (s, d) => Dedup.segmentDupStats(Tables.documents(s, d), "text", W),
    Some(s"""WITH t AS (SELECT doc_id, source,
               ${DuckOps.hashAll(DuckOps.tokens("text"))} AS th FROM documents),
      inst AS (SELECT doc_id, source,
          unnest(list_transform(range(1, len(th) // $W + 1),
            i -> ${DuckOps.foldHash(s"th[(i - 1) * $W + 1 : i * $W]")})) AS seg
        FROM t WHERE len(th) >= $W),
      df AS (SELECT seg, count(DISTINCT doc_id) AS seg_docs
             FROM inst GROUP BY 1),
      j AS (SELECT i.source, i.doc_id,
              CASE WHEN df.seg_docs >= 2 THEN 1 ELSE 0 END AS is_dup
            FROM inst i JOIN df USING (seg))
      SELECT source,
        CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs_segmented,
        CAST(count(*) AS BIGINT) AS n_segments,
        CAST(COALESCE(sum(is_dup), 0) AS BIGINT) AS n_dup_segments,
        CAST((CAST(COALESCE(sum(is_dup), 0) AS HUGEINT) * 1000000)
          // count(*) AS BIGINT) AS dup_micro
      FROM j GROUP BY source ORDER BY source"""))

  /** Eval-side n-gram contamination audit
    * ([[graft.operators.Decontaminate.ngramOverlapAudit]]): the
    * pinned eval slice is doc_id < 50 (an eval set is a bounded
    * input, not a corpus fraction — the BM25-family rule), train is
    * the rest; per eval doc the share of its distinct 5-gram hashes
    * found anywhere in train, with a 50% contamination verdict. */
  val t37: QueryDef = QueryDef(
    "t37_eval_contamination",
    (s, d) => {
      val docs = Tables.documents(s, d)
      Decontaminate.ngramOverlapAudit(
        docs.filter(col("doc_id") < 50),
        docs.filter(col("doc_id") >= 50),
        "text", 5, 500000L)
    },
    Some(s"""WITH toks AS (SELECT doc_id, ${DuckOps.tokens("text")} AS t
               FROM documents),
      sh AS (SELECT doc_id, list_distinct(list_transform(
               ${DuckOps.shingles("t", 5)}, x -> ${DuckOps.strHash60("x")}))
               AS hs FROM toks),
      ev AS (SELECT doc_id, unnest(hs) AS sgl FROM sh WHERE doc_id < 50),
      tr AS (SELECT DISTINCT unnest(hs) AS sgl FROM sh WHERE doc_id >= 50),
      hits AS (SELECT ev.doc_id, CAST(count(*) AS BIGINT) AS n_hit
               FROM ev JOIN tr USING (sgl) GROUP BY 1),
      base AS (SELECT doc_id, CAST(len(hs) AS BIGINT) AS n_ngrams
               FROM sh WHERE doc_id < 50)
      SELECT b.doc_id, b.n_ngrams,
        CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
        CAST(CASE WHEN b.n_ngrams = 0 THEN 0
          ELSE (CAST(COALESCE(h.n_hit, 0) AS HUGEINT) * 1000000) // b.n_ngrams
          END AS BIGINT) AS overlap_micro,
        CAST(CASE WHEN b.n_ngrams = 0 THEN 0
          ELSE (CAST(COALESCE(h.n_hit, 0) AS HUGEINT) * 1000000) // b.n_ngrams
          END AS BIGINT) >= 500000 AS contaminated
      FROM base b LEFT JOIN hits h USING (doc_id)
      ORDER BY b.doc_id"""))

  /** Event-type co-occurrence
    * ([[graft.operators.Graph.bipartiteCooccurrence]]): the
    * user–event_type bipartite relation projected onto types —
    * shared-user counts, per-type reach, and Jaccard affinity per
    * type pair ("users who did X also did Y"). */
  val c09: QueryDef = QueryDef(
    "c09_type_cooccurrence",
    (s, d) => Graph.bipartiteCooccurrence(Tables.events(s, d), "user_id", "event_type"),
    Some("""WITH d AS (SELECT DISTINCT user_id AS u, event_type AS t
               FROM events),
      per AS (SELECT t, CAST(count(*) AS BIGINT) AS n_t FROM d GROUP BY 1),
      pairs AS (SELECT a.t AS t1, b.t AS t2, CAST(count(*) AS BIGINT) AS n_both
                FROM d a JOIN d b ON a.u = b.u AND a.t < b.t GROUP BY 1, 2)
      SELECT t1, t2, n_both, p1.n_t AS n_t1, p2.n_t AS n_t2,
        CAST((CAST(n_both AS HUGEINT) * 1000000)
          // (p1.n_t + p2.n_t - n_both) AS BIGINT) AS jaccard_micro
      FROM pairs JOIN per p1 ON t1 = p1.t JOIN per p2 ON t2 = p2.t
      ORDER BY t1, t2"""))
}
