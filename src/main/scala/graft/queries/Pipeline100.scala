package graft.queries

import graft.Tables
import graft.operators.{Dedup, TextOps}

/** Round-15 additions, part 89: the Heaps-law vocabulary-growth curve
  * (t50's Zipf fit asks "is the frequency distribution natural?"; this
  * asks "does more data keep buying vocabulary?") and the privacy GATE
  * acting on d37's rare-window audit.
  */
object Pipeline100 {

  def all: Seq[QueryDef] = Seq(t51, p59)

  /** Types-seen-after-each-decile curve over the corpus token stream
    * (docs in doc_id order). The cumulative distinct needs no ordered
    * scan: a type is seen by checkpoint c iff its FIRST global
    * occurrence position is <= c — one per-term min + a 10-bucket
    * histogram. */
  val t51: QueryDef = QueryDef(
    "t51_heaps_curve",
    (s, d) => TextOps.heapsCurve(Tables.documents(s, d), "text", 10),
    Some(s"""WITH tk AS (SELECT doc_id, ${DuckOps.tokens("text")} AS t
               FROM documents),
      cnt AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS nt FROM tk),
      off AS (SELECT doc_id, CAST(COALESCE(sum(nt) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
            AS bef
        FROM cnt),
      occ AS (SELECT doc_id, unnest(list_transform(range(1, len(t) + 1),
            j -> {'j': j, 'trm': t[j]}), recursive := true)
        FROM tk),
      frst AS (SELECT occ.trm AS term, CAST(min(o.bef + occ.j) AS BIGINT) AS fp
        FROM occ JOIN off o USING (doc_id) GROUP BY 1),
      tot AS (SELECT CAST(sum(nt) AS BIGINT) AS total_tokens FROM cnt),
      bkt AS (SELECT 1 + CAST(len(list_filter(list_transform(range(1, 11),
            k -> (k * total_tokens) // 10), c -> c < fp)) AS BIGINT) AS b
        FROM frst, tot),
      nb AS (SELECT b, CAST(count(*) AS BIGINT) AS new_types FROM bkt
             GROUP BY 1),
      grid AS (SELECT unnest(range(1, 11)) AS decile)
      SELECT CAST(decile AS BIGINT) AS decile,
        (CAST(decile AS BIGINT) * total_tokens) // 10 AS checkpoint_tokens,
        CAST(COALESCE(new_types, 0) AS BIGINT) AS new_types,
        CAST(sum(COALESCE(new_types, 0)) OVER (ORDER BY decile
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS n_types
      FROM grid CROSS JOIN tot LEFT JOIN nb ON nb.b = grid.decile
      ORDER BY decile"""))

  /** Privacy gate at n = 3, kAnon = 3, max share 50% (n picked where
    * the synthetic corpus spreads doc shares across the threshold, so
    * BOTH branches provably fire at every SF: ~45 of 500 docs pass);
    * short docs (no windows) pass with zeros. */
  val p59: QueryDef = QueryDef(
    "p59_privacy_gate",
    (s, d) => Dedup.privacyGate(Tables.documents(s, d), "text", 3, 3,
      maxShareMicro = 500000L)
      .orderBy(org.apache.spark.sql.functions.col("doc_id")),
    Some(s"""WITH tk AS (SELECT source, doc_id,
               ${DuckOps.tokens("text")} AS t FROM documents),
      occ AS (SELECT source, doc_id,
          unnest(list_transform(${DuckOps.shingles("t", 3)},
            s -> ${DuckOps.strHash60("s")})) AS sgl
        FROM tk),
      df AS (SELECT sgl, CAST(count(*) AS BIGINT) AS c FROM occ GROUP BY 1),
      pd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS w_all,
          CAST(sum(CASE WHEN c < 3 THEN 1 ELSE 0 END) AS BIGINT) AS w_rare
        FROM occ JOIN df USING (sgl) GROUP BY 1),
      pds AS (SELECT doc_id, w_all, w_rare,
          CAST((CAST(w_rare AS HUGEINT) * 1000000) // w_all AS BIGINT)
            AS rare_share_micro
        FROM pd)
      SELECT d.doc_id, d.source,
        CAST(COALESCE(p.w_all, 0) AS BIGINT) AS w_all,
        CAST(COALESCE(p.w_rare, 0) AS BIGINT) AS w_rare,
        CAST(COALESCE(p.rare_share_micro, 0) AS BIGINT) AS rare_share_micro
      FROM documents d LEFT JOIN pds p USING (doc_id)
      WHERE COALESCE(p.rare_share_micro, 0) <= 500000
      ORDER BY d.doc_id"""))
}
