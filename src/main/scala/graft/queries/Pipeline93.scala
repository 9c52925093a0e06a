package graft.queries

import graft.Tables
import graft.operators.Dedup

/** Round-14 additions, part 77: saturation observability for capped
  * candidate generation (VERDICT r13 #2) — the df-cap recall trade as
  * a first-class, oracle-gated operational signal.
  */
object Pipeline93 {

  def all: Seq[QueryDef] = Seq(d33)

  /** Df-saturation audit at d02's registered parameters (3-gram
    * shingles, cap 64): the 1-row gate a curator reads before
    * trusting capped pair generation on a new corpus — see
    * [[graft.operators.Dedup.dfSaturationAudit]]. On the BENCH_SCALE
    * Finding-2 slice this is the query that turns "d02 returned 0
    * rows" from a silent empty result into "97% of shingles are over
    * the cap; use the signature tiers". */
  val d33: QueryDef = QueryDef(
    "d33_df_saturation",
    (s, d) => Dedup.dfSaturationAudit(Tables.documents(s, d), "text", 3, 64),
    Some(s"""WITH toks AS (SELECT doc_id, ${DuckOps.tokens("text")} AS t
               FROM documents),
      sh AS (SELECT doc_id, ${DuckOps.shingles("t", 3)} AS s FROM toks),
      hsets AS (SELECT doc_id, list_distinct(
          list_transform(s, x -> ${DuckOps.strHash60("x")})) AS hs FROM sh),
      e AS (SELECT doc_id, unnest(hs) AS sgl FROM hsets),
      df AS (SELECT sgl, CAST(count(*) AS BIGINT) AS df FROM e GROUP BY sgl),
      a AS (SELECT CAST(count(*) AS BIGINT) AS n_shingles,
              CAST(coalesce(sum(CASE WHEN df > 64 THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS n_pruned,
              CAST(coalesce(max(df), 0) AS BIGINT) AS max_df,
              CAST(coalesce(sum(CASE WHEN df > 64 THEN df ELSE 0 END), 0)
                AS BIGINT) AS pruned_occurrences,
              CAST(coalesce(sum(CASE WHEN df > 64 THEN df * (df - 1) // 2
                ELSE 0 END), 0) AS BIGINT) AS pruned_pairs
            FROM df)
      SELECT n_shingles, n_pruned, max_df, pruned_occurrences, pruned_pairs,
        CAST(CASE WHEN n_shingles = 0 THEN 0
          ELSE n_pruned * 1000000 // n_shingles END AS BIGINT)
          AS saturated_micro
      FROM a"""))
}
