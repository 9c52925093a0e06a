package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Dedup, Dialogue}

/** Round-15 additions, part 84: band-skew saturation observability
  * for the banded LSH joins (VERDICT r14 #5) and dialogue-aware
  * (role-tagged multi-turn) dedup/scrub (VERDICT r14 #7).
  */
object Pipeline95 {

  def all: Seq[QueryDef] = Seq(d34, d35, d36, p55, p56)

  /** SimHash band-skew audit
    * ([[graft.operators.Dedup.simhashBandSkewAudit]]): the hot-BUCKET
    * companion to d33's shingle-df audit, over d04's exact banding
    * (4 bands × 15 bits of the 60-bit SimHash). d33 catches a corpus
    * whose SHINGLES saturate the df cap; this catches a corpus whose
    * DOCUMENTS funnel into one band bucket — the degeneracy that
    * turns the banded equi-join quadratic with no df-side signal.
    * One row: occupied buckets, fattest bucket, total candidate-pair
    * mass, the hottest bucket's pair mass and micro share, and the
    * band carrying the most pairs. */
  val d34: QueryDef = QueryDef(
    "d34_band_skew",
    (s, d) => Dedup.simhashBandSkewAudit(Tables.documents(s, d), "text"),
    Some(s"""WITH toks AS (SELECT doc_id, ${DuckOps.tokens("text")} AS t
               FROM documents),
      hs AS (SELECT doc_id,
               list_transform(t, s -> ${DuckOps.strHash60("s")}) AS h
             FROM toks),
      sh AS (SELECT doc_id,
               CASE WHEN len(h) = 0 THEN 0::BIGINT
                 ELSE ${DuckOps.simhash60("h")} END AS simhash
             FROM hs),
      bb AS (SELECT doc_id, CAST(b AS BIGINT) AS band,
               (simhash >> (b * 15)) % 32768 AS bucket
             FROM sh, unnest(range(0, 4)) AS u(b)),
      sz AS (SELECT band, bucket, CAST(count(*) AS BIGINT) AS sz
             FROM bb GROUP BY 1, 2),
      pb AS (SELECT band, CAST(count(*) AS BIGINT) AS n_buckets,
               CAST(max(sz) AS BIGINT) AS max_bucket,
               CAST(sum(sz * (sz - 1) // 2) AS BIGINT) AS band_pairs
             FROM sz GROUP BY 1),
      top AS (SELECT band AS top_band, band_pairs AS top_band_pairs
              FROM pb ORDER BY band_pairs DESC, band ASC LIMIT 1),
      a AS (SELECT CAST(coalesce(sum(n_buckets), 0) AS BIGINT) AS n_buckets,
              CAST(coalesce(max(max_bucket), 0) AS BIGINT) AS max_bucket,
              CAST(coalesce(sum(band_pairs), 0) AS BIGINT) AS cand_pairs
            FROM pb)
      SELECT a.n_buckets, a.max_bucket, a.cand_pairs,
        CAST(a.max_bucket * (a.max_bucket - 1) // 2 AS BIGINT)
          AS hot_bucket_pairs,
        CAST(top.top_band AS BIGINT) AS top_band,
        CAST(top.top_band_pairs AS BIGINT) AS top_band_pairs,
        CAST(CASE WHEN a.cand_pairs = 0 THEN 0
          ELSE (a.max_bucket * (a.max_bucket - 1) // 2) * 1000000
            // a.cand_pairs END AS BIGINT) AS skew_micro
      FROM a, top"""))

  /** MinHash band-skew audit
    * ([[graft.operators.Dedup.minhashBandSkewAudit]]) at d03/d05's
    * registered instance (3-gram shingles, 16-perm signature,
    * 4 bands × 4 rows): the 1-row summary companion to d16's
    * per-band rows, shaped exactly like d34 so the two banded-join
    * mechanisms (MinHash slices vs SimHash bit bands) read on one
    * dashboard. The oracle reuses d03's banding CTEs verbatim. */
  val d36: QueryDef = QueryDef(
    "d36_minhash_band_skew",
    (s, d) => Dedup.minhashBandSkewAudit(Tables.documents(s, d), "text",
      3, 16, 4),
    Some(s"""${Pipeline.minhashCtes},
      sz2 AS (SELECT CAST(b AS BIGINT) AS band, bucket,
               CAST(count(*) AS BIGINT) AS sz
             FROM bands GROUP BY 1, 2),
      pb AS (SELECT band, CAST(count(*) AS BIGINT) AS n_buckets,
               CAST(max(sz) AS BIGINT) AS max_bucket,
               CAST(sum(sz * (sz - 1) // 2) AS BIGINT) AS band_pairs
             FROM sz2 GROUP BY 1),
      top AS (SELECT band AS top_band, band_pairs AS top_band_pairs
              FROM pb ORDER BY band_pairs DESC, band ASC LIMIT 1),
      a AS (SELECT CAST(coalesce(sum(n_buckets), 0) AS BIGINT) AS n_buckets,
              CAST(coalesce(max(max_bucket), 0) AS BIGINT) AS max_bucket,
              CAST(coalesce(sum(band_pairs), 0) AS BIGINT) AS cand_pairs
            FROM pb)
      SELECT a.n_buckets, a.max_bucket, a.cand_pairs,
        CAST(a.max_bucket * (a.max_bucket - 1) // 2 AS BIGINT)
          AS hot_bucket_pairs,
        CAST(top.top_band AS BIGINT) AS top_band,
        CAST(top.top_band_pairs AS BIGINT) AS top_band_pairs,
        CAST(CASE WHEN a.cand_pairs = 0 THEN 0
          ELSE (a.max_bucket * (a.max_bucket - 1) // 2) * 1000000
            // a.cand_pairs END AS BIGINT) AS skew_micro
      FROM a, top"""))

  /** Deterministic dialogue view of the documents table, shared by
    * d35/p55: each doc is a conversation, its tokens segmented into
    * 8-token turns, odd turns user / even turns assistant. `userJunk`
    * replaces user-turn text with conversation-specific filler —
    * d35's fixture twist that PROVES role awareness: exact-dup docs
    * keep identical assistant streams while every user turn differs,
    * so whole-text hashing finds nothing and the dialogue fingerprint
    * still groups them. */
  private[queries] def turnsDf(s: org.apache.spark.sql.SparkSession, d: String,
      userJunk: Boolean) = {
    val userText = if (userJunk) "concat('u', conv_id, '_', j)"
      else "concat_ws(' ', slice(t, (j - 1) * 8 + 1, 8))"
    Tables.documents(s, d)
      .selectExpr("doc_id AS conv_id",
        s"${graft.operators.TextOps.tokens("text")} AS t")
      .selectExpr("conv_id", "t",
        "explode(sequence(1, greatest(1," +
          " cast(ceil(size(t) / 8.0) as int)))) AS j")
      .selectExpr("conv_id", "cast(j as bigint) AS turn_idx",
        "if(j % 2 = 0, 'assistant', 'user') AS role",
        s"if(j % 2 = 0, concat_ws(' ', slice(t, (j - 1) * 8 + 1, 8))," +
          s" $userText) AS text")
  }

  /** The same turn synthesis as a DuckDB fragment. */
  private[queries] def turnsCtes(userJunk: Boolean): String = {
    val userText = if (userJunk) "concat('u', conv_id, '_', j)"
      else "array_to_string(t[((j - 1) * 8 + 1):least(len(t), j * 8)], ' ')"
    s"""tkq AS (SELECT doc_id AS conv_id, ${DuckOps.tokens("text")} AS t
          FROM documents),
      trq AS (SELECT conv_id, t, unnest(range(1, 1 + greatest(1,
            CAST(ceil(len(t) / 8.0) AS INT)))) AS j FROM tkq),
      turns AS (SELECT conv_id, CAST(j AS BIGINT) AS turn_idx,
          CASE WHEN j % 2 = 0 THEN 'assistant' ELSE 'user' END AS role,
          CASE WHEN j % 2 = 0
            THEN array_to_string(t[((j - 1) * 8 + 1):least(len(t), j * 8)], ' ')
            ELSE $userText END AS text
        FROM trq)"""
  }

  /** Dialogue-aware exact dedup
    * ([[graft.operators.Dialogue.dialogueExactDedup]]): conversations
    * fingerprinted on ASSISTANT turns only (order-sensitive fold),
    * user turns invisible — here each conversation's user turns are
    * conversation-specific filler, so any group_size > 1 row is a
    * duplicate ONLY a role-aware fingerprint can see. The oracle
    * replays per-turn token-hash folds, the turn-ordered conversation
    * fold, the empty-assistant seed, and the keep-first election. */
  val d35: QueryDef = QueryDef(
    "d35_dialogue_dedup",
    (s, d) => Dialogue.dialogueExactDedup(turnsDf(s, d, userJunk = true))
      .orderBy(col("conv_id")),
    Some(s"""WITH ${turnsCtes(userJunk = true)},
      at AS (SELECT conv_id, turn_idx,
               ${DuckOps.foldHash(DuckOps.hashAll(DuckOps.tokens("text"), 31))}
                 AS tha,
               ${DuckOps.foldHashWith(
                   DuckOps.hashAll(DuckOps.tokens("text"), 131), 999983L, 13L)}
                 AS thb
             FROM turns WHERE role = 'assistant'),
      fs AS (SELECT conv_id,
               list_transform(list_sort(list({'i': turn_idx, 'a': tha,
                 'b': thb})), s -> s.a) AS ha,
               list_transform(list_sort(list({'i': turn_idx, 'a': tha,
                 'b': thb})), s -> s.b) AS hb
             FROM at GROUP BY 1),
      fp AS (SELECT c.conv_id,
               coalesce(${DuckOps.foldHash("fs.ha")} * 1073741824
                 + ${DuckOps.foldHashWith("fs.hb", 999983L, 13L)} % 1073741824,
                 ${graft.operators.Dialogue.EmptyAssistantFp}) AS asst_fp
             FROM (SELECT DISTINCT conv_id FROM turns) c
             LEFT JOIN fs USING (conv_id)),
      g AS (SELECT conv_id, asst_fp,
              CAST(count(*) OVER (PARTITION BY asst_fp) AS BIGINT)
                AS group_size,
              min(conv_id) OVER (PARTITION BY asst_fp) AS canonical_conv
            FROM fp)
      SELECT conv_id, asst_fp, group_size, canonical_conv,
        conv_id = canonical_conv AS is_canonical
      FROM g ORDER BY conv_id"""))

  /** Dialogue decontamination scrub
    * ([[graft.operators.Dialogue.dialogueScrub]], k = 5, eval =
    * conv_id % 7 = 0 — denser than p52's % 97 split so the scrub has
    * verified non-zero ACTION at both registered SFs, not just on
    * the dup-injected scale slices): every ≥5-token window of a train
    * conversation's assistant turn that appears in any eval
    * conversation's assistant turn is scrubbed; user turns pass
    * through VERBATIM and never contribute hashes; eval
    * conversations never appear in the output. Real turn text on
    * both roles here (no junk) — the oracle replays turn-bounded
    * window hashing, the assistant-only eval set, and the per-turn
    * coverage rebuild cell-exactly. */
  val p55: QueryDef = QueryDef(
    "p55_dialogue_scrub",
    (s, d) => Dialogue.dialogueScrub(turnsDf(s, d, userJunk = false), 5,
        "conv_id % 7 = 0")
      .orderBy(col("conv_id"), col("turn_idx")),
    Some(s"""WITH ${turnsCtes(userJunk = false)},
      hx AS (SELECT conv_id, turn_idx, role, text,
               conv_id % 7 = 0 AS is_eval, role = 'assistant' AS is_asst,
               ${DuckOps.tokens("text")} AS tt
             FROM turns),
      hh AS (SELECT *, list_transform(${DuckOps.shingles("tt", 5)},
               s -> ${DuckOps.strHash60("s")}) AS hs FROM hx),
      eh AS (SELECT DISTINCT unnest(hs) AS h FROM hh
             WHERE is_eval AND is_asst),
      occ AS (SELECT conv_id, turn_idx,
                unnest(list_transform(range(1, len(hs) + 1),
                  i -> {'pos': i, 'h': hs[i]}), recursive := true)
              FROM hh WHERE NOT is_eval AND is_asst),
      cov AS (SELECT occ.conv_id, occ.turn_idx,
                list_sort(list(CAST(occ.pos AS BIGINT))) AS cov
              FROM occ JOIN eh USING (h) GROUP BY 1, 2),
      j2 AS (SELECT hh.conv_id, hh.turn_idx, hh.role, hh.text,
               hh.tt AS t, hh.is_asst, coalesce(cov, []::BIGINT[]) AS cov
             FROM hh LEFT JOIN cov USING (conv_id, turn_idx)
             WHERE NOT hh.is_eval),
      kp AS (SELECT *, list_filter(range(1, len(t) + 1),
               p -> len(list_filter(cov, i -> i <= p AND i > p - 5)) = 0)
                 AS kept
             FROM j2)
      SELECT conv_id, turn_idx, role, CAST(len(t) AS BIGINT) AS n_before,
        CAST(CASE WHEN is_asst THEN len(kept) ELSE len(t) END AS BIGINT)
          AS n_after,
        CASE WHEN is_asst THEN coalesce(array_to_string(
          list_transform(kept, p -> t[p]), ' '), '') ELSE text END
          AS text_out
      FROM kp ORDER BY conv_id, turn_idx"""))

  /** Dialogue contamination AUDIT
    * ([[graft.operators.Dialogue.dialogueContamination]], k = 5,
    * eval = conv_id % 7 = 0): p55's read-only half — for each eval
    * conversation, the island-merged spans of its assistant-turn
    * windows that occur in any TRAIN assistant turn, zero-filled per
    * eval conversation. The p46 ↔ p52 audit/action pairing at
    * conversation grain, same parameters as p55 so the two numbers
    * reconcile (the audit's contaminated span mass is what the scrub
    * removes). */
  val p56: QueryDef = QueryDef(
    "p56_dialogue_contamination",
    (s, d) => Dialogue.dialogueContamination(turnsDf(s, d, userJunk = false),
        5, "conv_id % 7 = 0")
      .orderBy(col("conv_id")),
    Some(s"""WITH ${turnsCtes(userJunk = false)},
      hx AS (SELECT conv_id, turn_idx,
               conv_id % 7 = 0 AS is_eval, role = 'assistant' AS is_asst,
               ${DuckOps.tokens("text")} AS tt
             FROM turns),
      hh AS (SELECT *, CAST(len(tt) AS BIGINT) AS n_tokens,
               list_transform(${DuckOps.shingles("tt", 5)},
                 s -> ${DuckOps.strHash60("s")}) AS hs FROM hx),
      occ AS (SELECT conv_id, turn_idx, is_eval,
                unnest(list_transform(range(1, len(hs) + 1),
                  i -> {'pos': i, 'h': hs[i]}), recursive := true)
              FROM hh WHERE is_asst),
      th AS (SELECT DISTINCT h FROM occ WHERE NOT is_eval),
      dp AS (SELECT occ.conv_id, occ.turn_idx, CAST(occ.pos AS BIGINT) AS pos
             FROM occ JOIN th USING (h) WHERE occ.is_eval),
      br AS (SELECT conv_id, turn_idx, pos, CASE WHEN pos - lag(pos) OVER
               (PARTITION BY conv_id, turn_idx ORDER BY pos) <= 5
               THEN 0 ELSE 1 END AS brk
             FROM dp),
      gr AS (SELECT conv_id, turn_idx, pos, sum(brk) OVER
               (PARTITION BY conv_id, turn_idx ORDER BY pos) AS grp FROM br),
      sp AS (SELECT conv_id, min(pos) AS s, max(pos) + 4 AS e
             FROM gr GROUP BY conv_id, turn_idx, grp),
      pd AS (SELECT conv_id, CAST(count(*) AS BIGINT) AS n_spans,
               CAST(sum(e - s + 1) AS BIGINT) AS ct FROM sp GROUP BY 1),
      ec AS (SELECT conv_id, CAST(sum(CASE WHEN is_asst THEN n_tokens
               ELSE 0 END) AS BIGINT) AS asst_tokens
             FROM hh WHERE is_eval GROUP BY 1)
      SELECT ec.conv_id, ec.asst_tokens,
        COALESCE(pd.n_spans, 0) AS n_spans,
        COALESCE(pd.ct, 0) AS contaminated_tokens,
        CAST(CASE WHEN ec.asst_tokens = 0 THEN 0
          ELSE (CAST(COALESCE(pd.ct, 0) AS HUGEINT) * 1000000)
            // ec.asst_tokens END AS BIGINT) AS contamination_micro
      FROM ec LEFT JOIN pd USING (conv_id) ORDER BY conv_id"""))
}
