package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Dedup, TextOps}

/** Round-13 additions, part 67: dedup-corrected mixture re-weighting
  * (VERDICT r12 #8's named candidate) — the curation-loop closure that
  * composes d30's per-source ExactSubstr dup mass with p02's
  * exact-integer mixture arithmetic, so sampling budgets are assigned
  * on UNIQUE token mass and a heavily-duplicated source stops being
  * over-sampled relative to its novel content.
  */
object Pipeline90 {

  def all: Seq[QueryDef] = Seq(p48)

  /** floor(x·1e6 / y) via the p02 long-division decomposition: exact
    * pure-BIGINT micro share up to ~9e15 tokens (naive x*1e6 overflows
    * past ~9e12 — a 100 TB corpus is ~2.5e13 tokens), floor semantics
    * identical across engines. */
  private def microDiv(x0: String, y0: String): String = {
    // parenthesize both operands: a composite y ("n_sources * eff")
    // would otherwise bind as (x div n_sources) * eff
    val (x, y) = (s"($x0)", s"($y0)")
    s"($x div $y) * 1000000 + (($x % $y) * 1000 div $y) * 1000 + " +
      s"((($x % $y) * 1000 % $y) * 1000 div $y)"
  }

  /** Dedup-corrected per-source mixture weights: each source's
    * EFFECTIVE token mass is its raw mass minus the cross-document
    * verbatim ≥8-token span mass (d30's inventory — the tokens a
    * downstream ExactSubstr scrub would reclaim), and both the
    * corpus share and the uniform-balance weight are computed over
    * effective mass. `weight_micro` is p02's balance form
    * (total_eff / (n_sources · eff) in micro units): > 1e6 means
    * up-sample, < 1e6 down-sample — now judged on novel content.
    * The drift column `eff_vs_raw_micro` (eff share / raw share)
    * names the sources whose budget the correction actually moves.
    *
    * 100 TB shape: d30's span passes (map-only seed hashing, one
    * map-side-combinable hash agg, one hash-keyed equi-join, per-doc
    * island-merge window), one doc-keyed left join onto the per-doc
    * token counts, one source-keyed partial agg, a 1-row broadcast
    * total, exact long-division arithmetic — no collect beyond the
    * O(sources) result. */
  val p48: QueryDef = QueryDef(
    "p48_dedup_corrected_mix",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val perDoc = Dedup.exactSubstrSpans(docs, "text", 8)
        .groupBy(col("doc_id")).agg(sum(col("span_tokens")).as("dup_tokens"))
      val perSource = docs.selectExpr("doc_id", "source",
          s"cast(size(${TextOps.tokens("text")}) as bigint) AS n_toks")
        .join(perDoc, Seq("doc_id"), "left")
        .na.fill(0L, Seq("dup_tokens"))
        .groupBy(col("source"))
        .agg(sum(col("n_toks")).as("n_tokens"),
          sum(col("dup_tokens")).as("dup_span_tokens"))
        .selectExpr("source", "n_tokens", "dup_span_tokens",
          "n_tokens - dup_span_tokens AS eff_tokens")
      val tot = perSource.agg(sum(col("n_tokens")).as("total_raw"),
        sum(col("eff_tokens")).as("total_eff"), count(lit(1)).as("n_sources"))
      // boundary semantics, pinned (caught by the 10× oracle gate: a
      // dup-saturated source CAN have eff_tokens = 0 — every token
      // inside a cross-document span — and the unguarded div/% threw
      // REMAINDER_BY_ZERO under ANSI): a source with NO novel mass
      // has no finite balance weight → weight_micro NULL (its
      // eff share is exactly 0, so budget arithmetic downstream
      // already assigns it nothing); a source with zero RAW share
      // (possible only for an all-empty source) has no drift ratio →
      // eff_vs_raw_micro NULL. The same class one level up: when the
      // WHOLE corpus is dup-saturated (total_eff = 0 — reachable when
      // identical docs span every source) there is no effective-share
      // denominator, and when every doc is empty (total_raw = 0) no
      // raw one — both share columns go NULL rather than throwing.
      // Conditional branches evaluate lazily in both engines, so the
      // guarded row never runs the division.
      perSource.crossJoin(broadcast(tot))
        .selectExpr("source", "n_tokens", "dup_span_tokens", "eff_tokens",
          "if(total_raw = 0, cast(null as bigint), " +
            s"${microDiv("n_tokens", "total_raw")}) AS raw_share_micro",
          "if(total_eff = 0, cast(null as bigint), " +
            s"${microDiv("eff_tokens", "total_eff")}) AS eff_share_micro",
          "if(eff_tokens = 0, cast(null as bigint), " +
            s"${microDiv("total_eff", "n_sources * eff_tokens")}) AS weight_micro")
        .selectExpr("source", "n_tokens", "dup_span_tokens", "eff_tokens",
          "raw_share_micro", "eff_share_micro", "weight_micro",
          "if(raw_share_micro = 0, cast(null as bigint), " +
            s"${microDiv("eff_share_micro", "raw_share_micro")}) AS eff_vs_raw_micro")
        .orderBy(col("source"))
    },
    Some(s"""WITH tk AS (SELECT doc_id, source, ${DuckOps.tokens("text")} AS t
               FROM documents),
      hx AS (SELECT doc_id, list_transform(${DuckOps.shingles("t", 8)},
               s -> ${DuckOps.strHash60("s")}) AS hs FROM tk),
      occ AS (SELECT doc_id, unnest(list_transform(range(1, len(hs) + 1),
              i -> {'pos': i, 'h': hs[i]}), recursive := true) FROM hx),
      cd AS (SELECT h FROM occ GROUP BY h HAVING min(doc_id) <> max(doc_id)),
      dp AS (SELECT occ.doc_id, CAST(occ.pos AS BIGINT) AS pos
             FROM occ JOIN cd USING (h)),
      br AS (SELECT doc_id, pos, CASE WHEN pos - lag(pos) OVER
               (PARTITION BY doc_id ORDER BY pos) <= 8 THEN 0 ELSE 1 END AS brk
             FROM dp),
      gr AS (SELECT doc_id, pos, sum(brk) OVER (PARTITION BY doc_id
               ORDER BY pos) AS grp FROM br),
      sp AS (SELECT doc_id, min(pos) AS s, max(pos) + 7 AS e
             FROM gr GROUP BY doc_id, grp),
      pd AS (SELECT doc_id, CAST(sum(e - s + 1) AS BIGINT) AS dup_tokens
             FROM sp GROUP BY 1),
      ps AS (SELECT tk.source,
               CAST(sum(len(tk.t)) AS BIGINT) AS n_tokens,
               CAST(sum(coalesce(pd.dup_tokens, 0)) AS BIGINT) AS dup_span_tokens
             FROM tk LEFT JOIN pd USING (doc_id) GROUP BY 1),
      pe AS (SELECT source, n_tokens, dup_span_tokens,
               n_tokens - dup_span_tokens AS eff_tokens FROM ps),
      tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total_raw,
                CAST(sum(eff_tokens) AS BIGINT) AS total_eff,
                CAST(count(*) AS BIGINT) AS n_sources FROM pe),
      m AS (SELECT source, n_tokens, dup_span_tokens, eff_tokens,
              CASE WHEN total_raw = 0 THEN NULL ELSE
              (n_tokens // total_raw) * 1000000
                + ((n_tokens % total_raw) * 1000 // total_raw) * 1000
                + (((n_tokens % total_raw) * 1000 % total_raw) * 1000 // total_raw)
                END AS raw_share_micro,
              CASE WHEN total_eff = 0 THEN NULL ELSE
              (eff_tokens // total_eff) * 1000000
                + ((eff_tokens % total_eff) * 1000 // total_eff) * 1000
                + (((eff_tokens % total_eff) * 1000 % total_eff) * 1000 // total_eff)
                END AS eff_share_micro,
              CASE WHEN eff_tokens = 0 THEN NULL ELSE
                (total_eff // (n_sources * eff_tokens)) * 1000000
                + ((total_eff % (n_sources * eff_tokens)) * 1000
                    // (n_sources * eff_tokens)) * 1000
                + (((total_eff % (n_sources * eff_tokens)) * 1000
                    % (n_sources * eff_tokens)) * 1000 // (n_sources * eff_tokens))
                END AS weight_micro
            FROM pe, tot)
      SELECT source, n_tokens, dup_span_tokens, eff_tokens, raw_share_micro,
        eff_share_micro, CAST(weight_micro AS BIGINT) AS weight_micro,
        CAST(CASE WHEN raw_share_micro = 0 THEN NULL ELSE
          (eff_share_micro // raw_share_micro) * 1000000
          + ((eff_share_micro % raw_share_micro) * 1000 // raw_share_micro) * 1000
          + (((eff_share_micro % raw_share_micro) * 1000 % raw_share_micro)
              * 1000 // raw_share_micro) END AS BIGINT) AS eff_vs_raw_micro
      FROM m ORDER BY source"""))
}
