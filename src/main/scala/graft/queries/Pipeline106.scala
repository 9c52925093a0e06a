package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Dialogue, Packing}

/** Round-16 additions, part 97: the dialogue-grain curation
  * composition (VERDICT r15 #5) — the conversation-data analog of
  * p54's corpus chain, proving the round-15 dialogue faces compose
  * cell-exactly as ONE plan.
  */
object Pipeline106 {

  def all: Seq[QueryDef] = Seq(p62)

  /** The real SFT-curation loop as ONE registered query:
    * eval/train split (eval = `conv_id % 7 = 0`) →
    * [[Dialogue.dialogueExactDedup]] over the TRAIN conversations
    * (keep canonical — eval is never deduped against train; you
    * scrub train, you don't drop eval) →
    * [[Dialogue.dialogueScrub]] (k = 5) of the canonical train
    * conversations against the eval assistant hash set →
    * [[Dialogue.sftTokenAccounting]] over the SCRUBBED text →
    * [[Packing.packGreedy]] per language at budget 200 on total
    * context tokens. Output: one row per packed canonical train
    * conversation with its post-scrub loss-mask split and bin
    * placement.
    *
    * The oracle replays the entire chain as one recursive CTE
    * (two-track fingerprint dedup → turn-bounded scrub → accounting
    * → packing recurrence). Composition invariant pinned in
    * DialogueSpec: [[Dialogue.dialogueContamination]] over
    * (scrubbed train ∪ eval) reads zero contaminated tokens.
    *
    * 100 TB shape: each stage keeps its audited plan — the dedup is
    * one conv-keyed fold + fingerprint window, the scrub one
    * broadcast eval set + (conv, turn)-keyed bounded collect, the
    * accounting one conv-keyed combinable agg, the packing one
    * lang-partitioned sequential fill; the only joins added by the
    * composition are conv-keyed equi-joins (canonical filter, lang
    * attach) — no pair join, no collect. */
  val p62: QueryDef = QueryDef(
    "p62_sft_curation_compose",
    (s, d) => {
      val turns = Pipeline95.turnsDf(s, d, userJunk = false)
      val train = turns.filter(expr("conv_id % 7 <> 0"))
      val evalT = turns.filter(expr("conv_id % 7 = 0"))
      val canon = Dialogue.dialogueExactDedup(train)
        .filter(col("is_canonical")).select(col("conv_id"))
      val scrubIn = train.join(canon, Seq("conv_id")).unionByName(evalT)
      val scrubbed = Dialogue.dialogueScrub(scrubIn, 5, "conv_id % 7 = 0")
      val acct = Dialogue.sftTokenAccounting(
        scrubbed.select(col("conv_id"), col("turn_idx"), col("role"),
          col("text_out").as("text")))
      val sized = Tables.documents(s, d)
        .selectExpr("doc_id AS conv_id", "lang")
        .join(acct, Seq("conv_id"))
      Packing.packGreedy(sized, "lang", "conv_id", "n_tokens", budget = 200L)
        .join(acct.select(col("conv_id"), col("n_trainable"),
          col("n_masked"), col("trainable_share_micro")), Seq("conv_id"))
        .select(col("conv_id"), col("lang"), col("n_tokens"),
          col("n_trainable"), col("n_masked"), col("trainable_share_micro"),
          col("bin_id"), col("fill_after"))
        .orderBy(col("conv_id"))
    },
    Some(s"""WITH RECURSIVE ${Pipeline95.turnsCtes(userJunk = false)},
      tr AS (SELECT conv_id, turn_idx, role, text FROM turns
             WHERE conv_id % 7 <> 0),
      ev AS (SELECT conv_id, turn_idx, role, text FROM turns
             WHERE conv_id % 7 = 0),
      dt AS (SELECT conv_id, turn_idx,
               ${DuckOps.foldHash(DuckOps.hashAll(DuckOps.tokens("text"), 31))}
                 AS tha,
               ${DuckOps.foldHashWith(
                   DuckOps.hashAll(DuckOps.tokens("text"), 131), 999983L, 13L)}
                 AS thb
             FROM tr WHERE role = 'assistant'),
      df2 AS (SELECT conv_id,
               list_transform(list_sort(list({'i': turn_idx, 'a': tha,
                 'b': thb})), s -> s.a) AS ha,
               list_transform(list_sort(list({'i': turn_idx, 'a': tha,
                 'b': thb})), s -> s.b) AS hb
             FROM dt GROUP BY 1),
      dfp AS (SELECT c.conv_id,
               coalesce(${DuckOps.foldHash("df2.ha")} * 1073741824
                 + ${DuckOps.foldHashWith("df2.hb", 999983L, 13L)} % 1073741824,
                 ${Dialogue.EmptyAssistantFp}) AS asst_fp
             FROM (SELECT DISTINCT conv_id FROM tr) c
             LEFT JOIN df2 USING (conv_id)),
      canon AS (SELECT min(conv_id) AS conv_id FROM dfp GROUP BY asst_fp),
      si AS (SELECT t.conv_id, t.turn_idx, t.role, t.text
             FROM tr t JOIN canon USING (conv_id)
             UNION ALL SELECT conv_id, turn_idx, role, text FROM ev),
      hx AS (SELECT conv_id, turn_idx, role, text,
               conv_id % 7 = 0 AS is_eval, role = 'assistant' AS is_asst,
               ${DuckOps.tokens("text")} AS tt
             FROM si),
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
             FROM j2),
      sc AS (SELECT conv_id, turn_idx, role,
               CASE WHEN is_asst THEN coalesce(array_to_string(
                 list_transform(kept, p -> t[p]), ' '), '') ELSE text END
                 AS text_out
             FROM kp),
      acct AS MATERIALIZED (SELECT conv_id,
          CAST(sum(len(${DuckOps.tokens("text_out")})) AS BIGINT)
            AS n_tokens,
          CAST(sum(CASE WHEN role = 'assistant'
            THEN len(${DuckOps.tokens("text_out")}) ELSE 0 END) AS BIGINT)
            AS n_trainable
        FROM sc GROUP BY 1),
      a2 AS MATERIALIZED (SELECT conv_id, n_tokens, n_trainable,
          n_tokens - n_trainable AS n_masked,
          CASE WHEN n_tokens = 0 THEN 0
            ELSE (n_trainable * 1000000) // n_tokens END
            AS trainable_share_micro
        FROM acct),
      sized AS MATERIALIZED (SELECT d.lang, a.conv_id, a.n_tokens,
          row_number() OVER (PARTITION BY d.lang ORDER BY a.conv_id) AS rn
        FROM a2 a JOIN documents d ON d.doc_id = a.conv_id),
      packed AS (
        SELECT lang, conv_id, n_tokens, rn, CAST(0 AS BIGINT) AS bin_id,
          n_tokens AS fill_after
        FROM sized WHERE rn = 1
        UNION ALL
        SELECT o.lang, o.conv_id, o.n_tokens, o.rn,
          CASE WHEN p.fill_after + o.n_tokens > 200 THEN p.bin_id + 1
               ELSE p.bin_id END,
          CASE WHEN p.fill_after + o.n_tokens > 200 THEN o.n_tokens
               ELSE p.fill_after + o.n_tokens END
        FROM packed p JOIN sized o ON o.lang = p.lang AND o.rn = p.rn + 1)
      SELECT p.conv_id, p.lang, p.n_tokens, a.n_trainable, a.n_masked,
        a.trainable_share_micro, p.bin_id, p.fill_after
      FROM packed p JOIN a2 a USING (conv_id) ORDER BY p.conv_id"""))
}
