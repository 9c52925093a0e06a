package graft.queries

import org.apache.spark.sql.functions.col
import graft.Tables
import graft.operators.{Dialogue, Packing, Profile}

/** Round-15 additions, part 88: SFT loss-mask token accounting packed
  * per language (the dialogue family's packing face — bins fill on
  * TOTAL context tokens while the trainable/masked split rides along),
  * and the generic shuffle-key skew audit (d34/d36's question asked of
  * ANY keyed operation, here the event stream's user key).
  */
object Pipeline99 {

  def all: Seq[QueryDef] = Seq(p58, q93)

  /** Conversations (the shared 8-token-turn dialogue view, odd turns
    * user / even assistant) accounted under the SFT loss mask —
    * trainable = assistant tokens — then greedy-packed per language at
    * budget 200 on TOTAL tokens (the context window fills with masked
    * tokens too; the mask split is what the packed bins are then
    * judged by). Oracle replays accounting + the recursive packing
    * recurrence and joins the mask split back on. */
  val p58: QueryDef = QueryDef(
    "p58_sft_packing",
    (s, d) => {
      val acct = Dialogue.sftTokenAccounting(
        Pipeline95.turnsDf(s, d, userJunk = false))
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
    Some(s"""WITH RECURSIVE ${Pipeline95.turnsCtes(false)},
      acct AS MATERIALIZED (SELECT conv_id,
          CAST(sum(len(toks)) AS BIGINT) AS n_tokens,
          CAST(sum(CASE WHEN role = 'assistant' THEN len(toks) ELSE 0 END)
            AS BIGINT) AS n_trainable
        FROM (SELECT conv_id, role, ${DuckOps.tokens("text")} AS toks
              FROM turns)
        GROUP BY 1),
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

  /** Key-skew audit of the event stream's user key — the exchange
    * every e-family session/funnel query shuffles on. */
  val q93: QueryDef = QueryDef(
    "q93_key_skew_audit",
    (s, d) => Profile.keySkewAudit(Tables.events(s, d), "user_id"),
    Some("""WITH gs AS (SELECT user_id AS k, CAST(count(*) AS BIGINT) AS c
               FROM events GROUP BY 1),
      h AS (SELECT c, CAST(count(*) AS BIGINT) AS nk FROM gs GROUP BY 1),
      cum AS (SELECT c, nk, CAST(sum(nk) OVER (ORDER BY c
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        FROM h),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
          CAST(sum(c) AS BIGINT) AS n_rows,
          CAST(max(c) AS BIGINT) AS max_key_rows FROM gs),
      p50 AS (SELECT min(c) AS p50_key_rows FROM cum, tot
              WHERE cum >= (50 * n_keys + 99) // 100),
      p99 AS (SELECT min(c) AS p99_key_rows FROM cum, tot
              WHERE cum >= (99 * n_keys + 99) // 100)
      SELECT n_rows, n_keys, max_key_rows,
        CAST((CAST(max_key_rows AS HUGEINT) * 1000000) // n_rows AS BIGINT)
          AS top1_share_micro,
        p50_key_rows, p99_key_rows,
        CAST((CAST(p99_key_rows AS HUGEINT) * 1000000) // p50_key_rows
          AS BIGINT) AS p99_over_p50_micro
      FROM tot, p50, p99"""))
}
