package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Curate, Events, Similarity, TextOps}

/** Round-10 additions, part 8: cohort LTV curves, corpus
  * concentration (HHI), Zipf head of the vocabulary, and k-NN
  * majority-vote label propagation.
  */
object Pipeline18 {

  def all: Seq[QueryDef] = Seq(e17, p28, t28, s21)

  /** Cohort LTV ([[graft.operators.Events.cohortLtv]]): revenue
    * curves per first-purchase ISO-week cohort — active purchasers,
    * exact cents, cumulative cents, and cumulative cents per cohort
    * member at each week of age. */
  val e17: QueryDef = QueryDef(
    "e17_cohort_ltv",
    (s, d) => Events.cohortLtv(Tables.events(s, d), "event_type", "user_id",
        "ts", "value", "purchase")
      .orderBy(col("cohort_wk"), col("age_wk")),
    Some("""WITH p AS (SELECT user_id AS uid, CAST(ts AS DATE) AS od,
               CAST(round(value * 100) AS BIGINT) AS cents
             FROM events WHERE event_type = 'purchase'),
      f AS (SELECT uid, min(od) AS cd FROM p GROUP BY 1),
      cs AS (SELECT CAST(date_trunc('week', cd) AS VARCHAR) AS cohort_wk,
               CAST(count(*) AS BIGINT) AS cohort_users
             FROM f GROUP BY 1),
      g AS (SELECT CAST(date_trunc('week', f.cd) AS VARCHAR) AS cohort_wk,
              CAST((p.od - f.cd) // 7 AS BIGINT) AS age_wk,
              CAST(count(DISTINCT p.uid) AS BIGINT) AS n_active,
              CAST(sum(p.cents) AS BIGINT) AS cents
            FROM p JOIN f ON p.uid = f.uid GROUP BY 1, 2)
      SELECT g.cohort_wk, g.age_wk, cs.cohort_users, g.n_active, g.cents,
        CAST(sum(g.cents) OVER (PARTITION BY g.cohort_wk
          ORDER BY g.age_wk) AS BIGINT) AS cum_cents,
        CAST(sum(g.cents) OVER (PARTITION BY g.cohort_wk
          ORDER BY g.age_wk) AS BIGINT) // cs.cohort_users AS ltv_cents_per_user
      FROM g JOIN cs ON g.cohort_wk = cs.cohort_wk
      ORDER BY g.cohort_wk, g.age_wk"""))

  /** Corpus concentration
    * ([[graft.operators.Curate.sourceConcentration]]): one-row HHI /
    * effective-source-count summary of the per-source token mass. */
  val p28: QueryDef = QueryDef(
    "p28_source_hhi",
    (s, d) => Curate.sourceConcentration(Tables.documents(s, d),
      "source", "text"),
    Some("""WITH toks AS (SELECT source,
               CAST(len(list_filter(regexp_split_to_array(text, '[ ]+'),
                 x -> x <> '')) AS BIGINT) AS n_tokens
             FROM documents),
      per AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS w
              FROM toks GROUP BY 1),
      tot AS (SELECT CAST(sum(w) AS BIGINT) AS total,
                CAST(count(*) AS BIGINT) AS n_sources FROM per),
      sh AS (SELECT n_sources, total,
               CAST((CAST(w AS HUGEINT) * 1000000) // total AS BIGINT)
                 AS share_micro
             FROM per, tot)
      SELECT n_sources, total AS total_tokens,
        CAST(max(share_micro) AS BIGINT) AS max_share_micro,
        CAST(sum(share_micro * share_micro) AS BIGINT) // 1000000 AS hhi_micro,
        CAST(CASE WHEN CAST(sum(share_micro * share_micro) AS BIGINT) // 1000000 = 0
          THEN 0 ELSE 1000000000000
            // (CAST(sum(share_micro * share_micro) AS BIGINT) // 1000000)
          END AS BIGINT) AS effective_sources_micro
      FROM sh GROUP BY 1, 2"""))

  /** Zipf head of the vocabulary: the 50 most frequent lowercase
    * alnum tokens with their rank and the rank·frequency product (a
    * Zipf's-law constancy check — flat `zipf_c` ≈ power-law tail).
    * The global sort is a top-k (TakeOrderedAndProject), never a full
    * vocabulary sort; the rank window runs over the 50 survivors. */
  val t28: QueryDef = QueryDef(
    "t28_zipf_head",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val top = Tables.documents(s, d)
        .selectExpr(s"explode(${TextOps.tokens("text")}) AS term")
        .groupBy(col("term")).agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("term").asc).limit(50)
      top.withColumn("rank", row_number().over(
          Window.orderBy(col("freq").desc, col("term").asc)).cast("long"))
        .selectExpr("rank", "term", "freq", "rank * freq AS zipf_c")
        .orderBy(col("rank"))
    },
    Some(s"""WITH tk AS (SELECT unnest(${DuckOps.tokens("text")}) AS term
               FROM documents),
      f AS (SELECT term, CAST(count(*) AS BIGINT) AS freq FROM tk GROUP BY 1),
      top AS (SELECT term, freq FROM f ORDER BY freq DESC, term LIMIT 50)
      SELECT CAST(row_number() OVER (ORDER BY freq DESC, term) AS BIGINT) AS rank,
        term, freq,
        CAST(row_number() OVER (ORDER BY freq DESC, term) AS BIGINT) * freq AS zipf_c
      FROM top ORDER BY rank"""))

  /** k-NN label propagation
    * ([[graft.operators.Similarity.knnClassify]]): every 7th vector
    * of the PINNED eval set (`vec_id < 1400` — the round-12
    * consolidated sweep caught the unbounded every-7th predicate
    * going quadratic at 10×: queries scaled with the corpus, the
    * t19/s19 corpus-fraction trap again) classified by the majority
    * label of its 5 exact-cosine nearest neighbors, reported against
    * its own label (leave-one-out accuracy audit). Candidates still
    * scale with the corpus; the eval set does not — exponent 2.04 →
    * linear. */
  val s21: QueryDef = QueryDef(
    "s21_knn_label",
    (s, d) => Similarity.knnClassify(Tables.embeddings(s, d),
        "vec_id % 7 = 0 AND vec_id < 1400", 5)
      .orderBy(col("q_id")),
    Some(s"""WITH e AS (SELECT vec_id,
               list_transform(embedding, x -> x::DOUBLE) AS v,
               CAST(label AS BIGINT) AS label FROM embeddings),
      n AS (SELECT vec_id, v, label, ${DuckOps.norm2("v")} AS nrm FROM e),
      p AS (SELECT q.vec_id AS q_id, c.vec_id AS n_id, c.label,
              ${DuckOps.dot("q.v", "c.v")} / (sqrt(q.nrm) * sqrt(c.nrm)) AS cos
            FROM n q JOIN n c ON q.vec_id % 7 = 0 AND q.vec_id < 1400 AND c.vec_id <> q.vec_id),
      top AS (SELECT q_id, n_id, label FROM (
          SELECT q_id, n_id, label,
            row_number() OVER (PARTITION BY q_id
              ORDER BY cos DESC, n_id ASC) AS rk
          FROM p) WHERE rk <= 5),
      votes AS (SELECT q_id, label, CAST(count(*) AS BIGINT) AS n_votes
                FROM top GROUP BY 1, 2),
      pick AS (SELECT q_id, label AS pred_label, n_votes FROM (
          SELECT q_id, label, n_votes,
            row_number() OVER (PARTITION BY q_id
              ORDER BY n_votes DESC, label ASC) AS rn
          FROM votes) WHERE rn = 1)
      SELECT p.q_id, p.pred_label, p.n_votes, a.label AS actual,
        p.pred_label = a.label AS correct
      FROM pick p JOIN n a ON p.q_id = a.vec_id
      ORDER BY q_id"""))
}
