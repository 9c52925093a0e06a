package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Curate, Events}

/** Round-10 additions, part 7: deterministic source rebalancing
  * (fractional oversampling) and transition-matrix algebra.
  */
object Pipeline17 {

  def all: Seq[QueryDef] = Seq(p25, e14)

  /** Deterministic source rebalancing
    * ([[graft.operators.Curate.rebalanceSources]]): every source
    * upsampled toward the largest source's token mass by a fractional
    * replication factor — the integer part replicates every doc, the
    * fractional part replicates the hash-selected prefix — so
    * expected per-source token mass equalizes with NO randomness.
    * One row per (doc, copy). */
  val p25: QueryDef = QueryDef(
    "p25_rebalance",
    (s, d) => Curate.rebalanceSources(Tables.documents(s, d),
        "doc_id", "source", "text", salt = "graft")
      .orderBy(col("id"), col("copy_idx")),
    Some(s"""WITH toks AS (SELECT doc_id AS id, source,
               CAST(len(list_filter(regexp_split_to_array(text, '[ ]+'),
                 x -> x <> '')) AS BIGINT) AS n_tokens
             FROM documents),
      ps AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS w FROM toks GROUP BY 1),
      mx AS (SELECT max(w) AS max_w FROM ps),
      f AS (SELECT source, (max_w * 1000000) // w AS factor_micro FROM ps, mx),
      h AS (SELECT id, source, n_tokens,
              (((${DuckOps.strHash60("('graft:' || CAST(id AS VARCHAR))")} % 2147483648)
                * 2654435761) % 2147483648) % 1000000 AS bucket
            FROM toks),
      c AS (SELECT h.id, h.source, h.n_tokens,
              CAST(f.factor_micro // 1000000
                + CASE WHEN h.bucket < f.factor_micro % 1000000 THEN 1 ELSE 0 END
                AS BIGINT) AS copies
            FROM h JOIN f ON h.source = f.source)
      SELECT id, source, n_tokens, copies, CAST(i AS BIGINT) AS copy_idx
      FROM c, unnest(range(0, copies)) AS t(i)
      ORDER BY id, copy_idx"""))

  /** Two-step transition probabilities: e08's first-order matrix
    * composed with itself — `p2(i,j) = Σ_k (p(i,k)·p(k,j)) div 1e6`,
    * the floor-composed integer matrix square (one equi-join of the
    * T²-row matrix with itself + one partial agg). The oracle nests
    * e08's generated chain. */
  val e14: QueryDef = QueryDef(
    "e14_two_step_transitions",
    (s, d) => {
      val m = Events.transitionMatrix(Tables.events(s, d),
        "event_type", "user_id", "ts", "event_id")
      val a = m.select(col("from_type").as("i"), col("to_type").as("k"),
        col("p_micro").as("p1"))
      val b = m.select(col("from_type").as("k"), col("to_type").as("j"),
        col("p_micro").as("p2"))
      a.join(b, Seq("k"))
        .groupBy(col("i").as("from_type"), col("j").as("to_type"))
        .agg(sum(expr("(p1 * p2) div 1000000")).as("p2_micro"),
          count(lit(1)).as("n_paths"))
        .orderBy(col("from_type"), col("to_type"))
    },
    Some(s"""WITH m AS (SELECT from_type, to_type, p_micro
               FROM (${Pipeline13.e08.oracle.get}) AS e08)
      SELECT a.from_type, b.to_type,
        CAST(sum((a.p_micro * b.p_micro) // 1000000) AS BIGINT) AS p2_micro,
        CAST(count(*) AS BIGINT) AS n_paths
      FROM m a JOIN m b ON a.to_type = b.from_type
      GROUP BY 1, 2 ORDER BY 1, 2"""))
}
