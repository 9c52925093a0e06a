package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Curate, Dialogue, Packing, TextOps}

/** Round-16 additions, part 97: the dialogue-grain curation
  * composition (VERDICT r15 #5) — the conversation-data analog of
  * p54's corpus chain, proving the round-15 dialogue faces compose
  * cell-exactly as ONE plan — plus the round's registry growth at
  * the bar: near-dup dialogue pairs (d40), SFT waterfill on
  * trainable tokens (p63), and the MATTR lexical-diversity gate
  * (t53).
  */
object Pipeline106 {

  def all: Seq[QueryDef] = Seq(p62, d40, p63, t53)

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

  /** NEAR-dup dialogue pairs
    * ([[Dialogue.dialogueMinhashPairs]], 3-gram shingles, 16-perm
    * signature, 4 bands, est. Jaccard ≥ 0.5) over the junk-user
    * dialogue view: each conversation's user turns are
    * conversation-specific filler, so every pair found is evidence
    * only a role-aware signature can see (whole-text MinHash would
    * drown in the differing user filler). The assistant stream is
    * shingled ACROSS turn boundaries — the re-segmentation-robust
    * complement to d35's segmentation-sensitive exact fingerprint.
    * Oracle replays the concat + d03's full signature/banding CTEs
    * at conversation grain. */
  val d40: QueryDef = QueryDef(
    "d40_dialogue_minhash",
    (s, d) => Dialogue.dialogueMinhashPairs(
        Pipeline95.turnsDf(s, d, userJunk = true), 3, 16, 4, 0.5)
      .orderBy(col("d1"), col("d2")),
    Some(s"""WITH ${Pipeline95.turnsCtes(userJunk = true)},
      cd AS (SELECT conv_id AS doc_id,
               array_to_string(list(text ORDER BY turn_idx), ' ') AS text
             FROM turns WHERE role = 'assistant' GROUP BY 1),
      toks AS (SELECT doc_id, ${DuckOps.tokens("text")} AS t FROM cd),
      sh AS (SELECT doc_id, ${DuckOps.shingles("t", 3)} AS s FROM toks),
      hs AS (SELECT doc_id, list_distinct(
               list_transform(s, x -> ${DuckOps.strHash60("x")})) AS h
             FROM sh),
      sig AS (SELECT doc_id, ${DuckOps.minhashSig("h", 16)} AS sig FROM hs),
      bands AS (SELECT doc_id, b,
                  ${DuckOps.foldHash("sig[b * 4 + 1 : b * 4 + 4]")} AS bucket
                FROM sig, unnest(range(0, 4)) AS t(b)),
      cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
               FROM bands a JOIN bands b
               ON a.b = b.b AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
      est AS (SELECT d1, d2,
                CAST(len(list_filter(range(1, 17),
                  i -> s1.sig[i] = s2.sig[i])) AS BIGINT) AS matches
              FROM cand JOIN sig s1 ON d1 = s1.doc_id
              JOIN sig s2 ON d2 = s2.doc_id)
      SELECT d1, d2, matches, CAST(matches AS DOUBLE) / 16 AS est_jaccard
      FROM est WHERE CAST(matches AS DOUBLE) / 16 >= 0.5
      ORDER BY d1, d2"""))

  /** SFT-aware mixture planning: water-fill a 40%-of-trainable-mass
    * token budget across sources where each source's availability
    * cap is its TRAINABLE (assistant, loss-taking) token mass from
    * [[Dialogue.sftTokenAccounting]] — not its raw length. Two
    * sources of equal raw size can differ several-fold in gradient
    * signal; a plan that fills on raw tokens systematically
    * over-allocates to masked-heavy sources. Sources with zero
    * trainable mass are excluded from the plan (nothing to allocate
    * to; an explicit filter, not a silent drop — the cap would
    * divide fill_micro by zero). Oracle replays accounting, the
    * per-source trainable mass, and the exact waterfill recurrence
    * ([[Curate.waterfillFrom]]'s integer algorithm). */
  val p63: QueryDef = QueryDef(
    "p63_sft_waterfill",
    (s, d) => {
      val acct = Dialogue.sftTokenAccounting(
        Pipeline95.turnsDf(s, d, userJunk = false))
      def per = Tables.documents(s, d)
        .selectExpr("doc_id AS conv_id", "source")
        .join(acct, Seq("conv_id"))
        .groupBy(col("source")).agg(sum(col("n_trainable")).as("cap_tokens"))
        .filter(col("cap_tokens") > 0L)
        .selectExpr("source", "cap_tokens", "1L AS weight")
      val total = per.agg(sum(col("cap_tokens"))).head.getLong(0)
      Curate.waterfillFrom(per, 2L * total / 5L)
    },
    Some(s"""WITH ${Pipeline95.turnsCtes(userJunk = false)},
      acct AS (SELECT conv_id,
          CAST(sum(CASE WHEN role = 'assistant'
            THEN len(${DuckOps.tokens("text")}) ELSE 0 END) AS BIGINT)
            AS n_trainable
        FROM turns GROUP BY 1),
      per AS (SELECT d.source,
               CAST(sum(a.n_trainable) AS BIGINT) AS cap_tokens
             FROM acct a JOIN documents d ON d.doc_id = a.conv_id
             GROUP BY 1 HAVING sum(a.n_trainable) > 0),
      b AS (SELECT (2 * CAST(sum(cap_tokens) AS BIGINT)) // 5 AS budget
            FROM per),
      keyed AS (SELECT source, cap_tokens, 1::BIGINT AS weight,
          (CAST(cap_tokens AS HUGEINT) * 1000000000000) // weight AS sat_key
        FROM per),
      scan AS (SELECT *,
          COALESCE(CAST(sum(cap_tokens) OVER w0 AS BIGINT), 0) AS cap_before,
          COALESCE(CAST(sum(weight) OVER w0 AS BIGINT), 0) AS w_before,
          CAST(sum(weight) OVER () AS BIGINT) AS w_total
        FROM keyed, b
        WINDOW w0 AS (ORDER BY sat_key, source
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      cnd AS (SELECT *,
          CAST(cap_tokens AS HUGEINT) * (w_total - w_before)
            <= CAST(budget - cap_before AS HUGEINT) * weight AS c
        FROM scan),
      sat AS (SELECT *,
          min(CASE WHEN c THEN 1 ELSE 0 END) OVER
            (ORDER BY sat_key, source
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1 AS saturated
        FROM cnd),
      fin AS (SELECT *,
          budget - CAST(sum(CASE WHEN saturated THEN cap_tokens ELSE 0 END)
            OVER () AS BIGINT) AS r_budget,
          CAST(sum(CASE WHEN saturated THEN 0 ELSE weight END)
            OVER () AS BIGINT) AS w_unsat
        FROM sat),
      alloc AS (SELECT source, cap_tokens, weight, saturated,
          CASE WHEN saturated THEN cap_tokens
            ELSE least(cap_tokens,
              CAST(CAST(r_budget AS HUGEINT) * weight // w_unsat AS BIGINT))
          END AS alloc_tokens
        FROM fin)
      SELECT source, cap_tokens, weight, saturated, alloc_tokens,
        CAST(CAST(alloc_tokens AS HUGEINT) * 1000000 // cap_tokens AS BIGINT)
          AS fill_micro
      FROM alloc ORDER BY source"""))

  /** MATTR lexical diversity ([[TextOps.mattrDiversity]], window 25)
    * — the length-robust type-token gate; oracle replays the exact
    * integer window sums. */
  val t53: QueryDef = QueryDef(
    "t53_mattr_diversity",
    (s, d) => TextOps.mattrDiversity(Tables.documents(s, d), "text", 25)
      .orderBy(col("doc_id")),
    Some(s"""WITH tk AS (SELECT doc_id, ${DuckOps.tokens("text")} AS t
               FROM documents),
      b AS (SELECT doc_id, t, CAST(len(t) AS BIGINT) AS n_tokens,
              CAST(CASE WHEN len(t) <= 25 THEN least(len(t), 1)
                ELSE len(t) - 24 END AS BIGINT) AS n_windows
            FROM tk)
      SELECT doc_id, n_tokens, n_windows,
        CASE WHEN n_tokens = 0 THEN 0
          ELSE CAST(len(list_distinct(t)) AS BIGINT) * 1000000 // n_tokens
          END AS ttr_micro,
        CASE WHEN n_tokens = 0 THEN 0
          WHEN n_tokens <= 25
            THEN CAST(len(list_distinct(t)) AS BIGINT) * 1000000 // n_tokens
          ELSE CAST(list_sum(list_transform(range(1, n_windows + 1),
              i -> len(list_distinct(t[i:i+24])))) AS BIGINT) * 1000000
            // (n_windows * 25)
          END AS mattr_micro
      FROM b ORDER BY doc_id"""))
}
