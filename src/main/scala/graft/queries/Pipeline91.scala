package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.TextOps

/** Round-13 additions, part 69: the two curation faces between dedup
  * and mixture weighting that the surface still lacked — the published
  * within-document repetition filters (the Gopher rules, Rae et al.
  * 2021, token-fraction form) and quality-aware canonical selection
  * for exact-dup groups (keep the BEST copy, not the first).
  */
object Pipeline91 {

  def all: Seq[QueryDef] = Seq(t48, p49, t49)

  /** Deterministic sliding-window chunk inventory — the
    * retrieval-corpus preparation step (RAG chunking) pinned exactly:
    * window = 32 tokens, stride = 24 (25% overlap), chunk starts at
    * 1, 25, 49, … until the start exceeds the doc; the LAST chunk is
    * truncated to the doc end (never padded, never dropped), so every
    * token belongs to ≥ 1 chunk and chunk k covers
    * [1 + 24(k−1), min(n, 32 + 24(k−1))]. Empty docs emit no chunks.
    * Output: one row per chunk with its exact token span and a
    * 60-bit content fingerprint of the chunk text (the dedup handle a
    * chunk store keys on).
    *
    * 100 TB shape: map-only — one tokenize, a per-doc sequence
    * explode bounded by ⌈n/stride⌉, no shuffle at all before the
    * result sort. */
  val t49: QueryDef = QueryDef(
    "t49_chunk_inventory",
    (s, d) => Tables.documents(s, d)
      .selectExpr("doc_id", s"${TextOps.tokens("text")} AS t")
      // the chunk count is floored at 1 (Spark's sequence(1, 0) is
      // the DESCENDING [1, 0] — the lexicalDiversity guard class);
      // the k=1 row of an empty doc dies on the start<=end filter
      .selectExpr("doc_id", "t",
        "explode(sequence(1, greatest(1, " +
          "1 + cast(ceil((size(t) - 32) / 24.0) as int)))) AS k")
      .selectExpr("doc_id", "cast(k as bigint) AS chunk_id",
        "cast(1 + 24 * (k - 1) as bigint) AS start_tok",
        "cast(least(size(t), 32 + 24 * (k - 1)) as bigint) AS end_tok",
        "concat_ws(' ', slice(t, 1 + 24 * (k - 1), " +
          "least(size(t), 32 + 24 * (k - 1)) - 24 * (k - 1))) AS chunk")
      .filter(col("start_tok") <= col("end_tok"))
      .selectExpr("doc_id", "chunk_id", "start_tok", "end_tok",
        "end_tok - start_tok + 1 AS n_tokens",
        s"${TextOps.strHash60("chunk")} AS chunk_fp")
      .orderBy(col("doc_id"), col("chunk_id")),
    Some(s"""WITH tk AS (SELECT doc_id, ${DuckOps.tokens("text")} AS t FROM documents),
      ks AS (SELECT doc_id, t, unnest(range(1, 1 + greatest(1,
               1 + CAST(ceil((len(t) - 32) / 24.0) AS INT)))) AS k FROM tk),
      c AS (SELECT doc_id, CAST(k AS BIGINT) AS chunk_id,
              CAST(1 + 24 * (k - 1) AS BIGINT) AS start_tok,
              CAST(least(len(t), 32 + 24 * (k - 1)) AS BIGINT) AS end_tok,
              array_to_string(t[(1 + 24 * (k - 1)):(least(len(t),
                32 + 24 * (k - 1)))], ' ') AS chunk
            FROM ks)
      SELECT doc_id, chunk_id, start_tok, end_tok,
        end_tok - start_tok + 1 AS n_tokens,
        ${DuckOps.strHash60("chunk")} AS chunk_fp
      FROM c WHERE start_tok <= end_tok ORDER BY doc_id, chunk_id"""))

  /** Within-document repetition gates
    * ([[graft.operators.TextOps.repetitionGates]] — the Rae et al.
    * 2021 Gopher repetition filters, token-fraction form; exact
    * semantics, thresholds, and the 100 TB shape are pinned in the
    * operator scaladoc and TextOpsSpec's hand fixtures). The oracle
    * replays the per-doc top-2-gram max, the repeated-3-gram coverage
    * union, and the pinned 0.20/0.30 flags. */
  val t48: QueryDef = QueryDef(
    "t48_repetition_gates",
    (s, d) => TextOps.repetitionGates(Tables.documents(s, d), "text")
      .orderBy(col("doc_id")),
    Some(s"""WITH tk AS (SELECT doc_id, ${DuckOps.tokens("text")} AS t FROM documents),
      hx AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n,
               list_transform(${DuckOps.shingles("t", 2)},
                 s -> ${DuckOps.strHash60("s")}) AS h2,
               list_transform(${DuckOps.shingles("t", 3)},
                 s -> ${DuckOps.strHash60("s")}) AS h3 FROM tk),
      e2 AS (SELECT doc_id, unnest(h2) AS h FROM hx),
      c2 AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS top2_count FROM
              (SELECT doc_id, h, count(*) AS c FROM e2 GROUP BY 1, 2)
             GROUP BY 1),
      e3 AS (SELECT doc_id, unnest(list_transform(range(1, len(h3) + 1),
              i -> {'pos': i, 'h': h3[i]}), recursive := true) FROM hx),
      r3 AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos,
               count(*) OVER (PARTITION BY doc_id, h) AS cnt FROM e3),
      cov AS (SELECT doc_id, list_sort(list(pos)) AS cov FROM r3
              WHERE cnt >= 2 GROUP BY 1),
      j AS (SELECT hx.doc_id, hx.n,
              coalesce(c2.top2_count, 0) AS top2_count,
              coalesce(cov.cov, []::BIGINT[]) AS cov
            FROM hx LEFT JOIN c2 USING (doc_id) LEFT JOIN cov USING (doc_id)),
      k AS (SELECT doc_id, n, top2_count,
              n - CAST(len(list_filter(range(1, n + 1),
                p -> len(list_filter(cov, i -> i <= p AND i > p - 3)) = 0))
                AS BIGINT) AS dup3_cov_tokens
            FROM j),
      m AS (SELECT doc_id, n AS n_tokens, top2_count,
              CASE WHEN n < 2 THEN 0
                ELSE (top2_count * 1000000) // (n - 1) END AS top2_share_micro,
              dup3_cov_tokens,
              CASE WHEN n = 0 THEN 0
                ELSE (dup3_cov_tokens * 1000000) // n END AS dup3_cov_micro
            FROM k)
      SELECT doc_id, n_tokens, top2_count, top2_share_micro, dup3_cov_tokens,
        dup3_cov_micro,
        top2_share_micro > 200000 OR dup3_cov_micro > 300000 AS flagged
      FROM m ORDER BY doc_id"""))

  /** Quality-aware exact-dup canonical selection — d01's exact dup
    * groups resolved by KEEPING THE BEST copy (highest type/token
    * ratio, tie → lowest doc_id) instead of the first: the canonical-
    * election upgrade a curator wants when dup copies differ in
    * trailing boilerplate. NOTE the fingerprint is the raw-text hash,
    * so same-fp copies here are byte-identical and TTR ties are broken
    * by doc_id — the ELECTION RULE is what this query pins (swap the
    * fp for a normalized tier from d24 to make the quality rank bite).
    * Per source: docs, kept, dropped, and the token mass each way.
    *
    * 100 TB shape: one map-only (fp, ttr, n_toks) projection, ONE
    * fp-keyed window for the rank (fine-grained 60-bit keys), one
    * source-keyed partial agg. */
  val p49: QueryDef = QueryDef(
    "p49_quality_dedup_keep_best",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val scored = Tables.documents(s, d).selectExpr("doc_id", "source",
          s"${TextOps.strHash60("text")} AS fp",
          s"${TextOps.tokens("text")} AS t")
        .selectExpr("doc_id", "source", "fp",
          "cast(size(t) as bigint) AS n_toks",
          "if(size(t) = 0, 0L, (cast(size(array_distinct(t)) as bigint)" +
            " * 1000000) div size(t)) AS ttr_micro")
      scored
        .withColumn("rk", row_number().over(Window.partitionBy(col("fp"))
          .orderBy(col("ttr_micro").desc, col("doc_id"))))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(expr("cast(rk = 1 as bigint)")).as("n_kept"),
          sum(expr("cast(rk > 1 as bigint)")).as("n_dropped"),
          sum(expr("if(rk = 1, n_toks, 0L)")).as("kept_tokens"),
          sum(expr("if(rk > 1, n_toks, 0L)")).as("dropped_tokens"))
        .orderBy(col("source"))
    },
    Some(s"""WITH sc AS (SELECT doc_id, source, ${DuckOps.strHash60("text")} AS fp,
               ${DuckOps.tokens("text")} AS t FROM documents),
      m AS (SELECT doc_id, source, fp, CAST(len(t) AS BIGINT) AS n_toks,
              CASE WHEN len(t) = 0 THEN 0
                ELSE (CAST(len(list_distinct(t)) AS BIGINT) * 1000000) // len(t)
                END AS ttr_micro FROM sc),
      r AS (SELECT *, row_number() OVER (PARTITION BY fp
              ORDER BY ttr_micro DESC, doc_id) AS rk FROM m)
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        CAST(sum(CASE WHEN rk > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
        CAST(sum(CASE WHEN rk = 1 THEN n_toks ELSE 0 END) AS BIGINT) AS kept_tokens,
        CAST(sum(CASE WHEN rk > 1 THEN n_toks ELSE 0 END) AS BIGINT) AS dropped_tokens
      FROM r GROUP BY 1 ORDER BY 1"""))
}
