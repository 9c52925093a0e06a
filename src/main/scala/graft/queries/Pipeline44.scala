package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Cluster, Dedup}

/** Round-11 additions, part 9: incremental connected-component
  * maintenance, the MinHash estimator calibration curve, and
  * correlated-subquery decorrelation.
  */
object Pipeline44 {

  def all: Seq[QueryDef] = Seq(c10, d23, q66)

  /** Incremental component maintenance
    * ([[graft.operators.Cluster.mergeComponents]]): the corpus is
    * split at a pinned 80% id cut; the standing 80% is clustered
    * once, then the new 20% slice's pairs merge in via contraction —
    * the corpus label table is touched by exactly two equi-joins and
    * the iterative loop runs only on the touched subgraph. The
    * oracle is a FULL-recompute transitive closure over ALL pairs
    * (c01's CTE), so the hash match proves incremental == full —
    * the invariant that makes nightly ingest clustering trustworthy.
    */
  val c10: QueryDef = QueryDef(
    "c10_cc_incremental",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = Dedup.minhashLshPairs(docs, "text", 3, 16, 4, 0.5)
        .select(col("d1"), col("d2"))
      val cut = docs.agg(expr("((max(doc_id) + 1) * 4) div 5").as("cut"))
      val withCut = pairs.crossJoin(broadcast(cut))
      val oldPairs = withCut.filter(col("d2") < col("cut")).select(col("d1"), col("d2"))
      val newPairs = withCut.filter(col("d2") >= col("cut")).select(col("d1"), col("d2"))
      val base = Cluster.connectedComponents(oldPairs, "d1", "d2")
      val merged = Cluster.mergeComponents(base, newPairs, "d1", "d2")
        .withColumnRenamed("id", "doc_id")
      docs.select(col("doc_id"))
        .join(merged, Seq("doc_id"), "left")
        .selectExpr("doc_id", "cast(coalesce(lbl, doc_id) as bigint) AS cluster_id")
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH RECURSIVE toks AS (SELECT doc_id, ${DuckOps.tokens("text")} AS t FROM documents),
      sh AS (SELECT doc_id, ${DuckOps.shingles("t", 3)} AS s FROM toks),
      hs AS (SELECT doc_id, list_distinct(
               list_transform(s, x -> ${DuckOps.strHash60("x")})) AS h FROM sh),
      sig AS (SELECT doc_id, ${DuckOps.minhashSig("h", 16)} AS sig FROM hs),
      bands AS (SELECT doc_id, b, ${DuckOps.foldHash("sig[b * 4 + 1 : b * 4 + 4]")} AS bucket
                FROM sig, unnest(range(0, 4)) AS t(b)),
      cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
               FROM bands a JOIN bands b
               ON a.b = b.b AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
      pairs AS (SELECT d1, d2 FROM cand
                JOIN sig s1 ON d1 = s1.doc_id JOIN sig s2 ON d2 = s2.doc_id
                WHERE CAST(len(list_filter(range(1, 17),
                  i -> s1.sig[i] = s2.sig[i])) AS DOUBLE) / 16 >= 0.5),
      e2 AS (SELECT d1 AS a, d2 AS b FROM pairs
             UNION SELECT d2, d1 FROM pairs),
      reach AS (SELECT doc_id AS id, doc_id AS r FROM documents
                UNION
                SELECT e2.b AS id, reach.r FROM reach JOIN e2 ON e2.a = reach.id),
      lbl AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id)
      SELECT doc_id, CAST(cluster_id AS BIGINT) AS cluster_id
      FROM lbl ORDER BY doc_id"""))

  /** MinHash estimator calibration: per signature-agreement level
    * m/16 over ALL LSH candidates (threshold 0), the pair count, the
    * EXACT mean true Jaccard (micro), and how many pairs truly clear
    * 0.5 — the curve that tells you what a 16-perm estimate is worth
    * before trusting d03's threshold. Candidates stay band-bounded;
    * truth is the d02-style exact-set verify join (two id-keyed
    * equi-joins). Two empty shingle sets define Jaccard 1 (pinned on
    * both sides — degenerate docs are dup-alike, not crash-alike). */
  val d23: QueryDef = QueryDef(
    "d23_lsh_calibration",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val cand = Dedup.minhashLshPairs(docs, "text", 3, 16, 4, 0.0)
        .select(col("d1"), col("d2"), col("matches"))
      val sets = Dedup.shingleHashSets(docs, "text", 3)
        .selectExpr("doc_id", "hs", "cast(n_shingles as bigint) AS ns")
      cand
        .join(sets.selectExpr("doc_id AS d1", "hs AS h1", "ns AS n1"), Seq("d1"))
        .join(sets.selectExpr("doc_id AS d2", "hs AS h2", "ns AS n2"), Seq("d2"))
        .selectExpr("matches",
          "cast(size(array_intersect(h1, h2)) as bigint) AS inter", "n1", "n2")
        .selectExpr("matches",
          "if(n1 + n2 - inter = 0, 1000000L, (inter * 1000000) div (n1 + n2 - inter)) AS tj")
        .groupBy(col("matches"))
        .agg(count(lit(1)).as("n_pairs"),
          coalesce(sum(col("tj")), lit(0L)).as("s"),
          coalesce(sum(expr("cast(tj >= 500000 as bigint)")), lit(0L)).as("n_true_ge_50"))
        .selectExpr("matches", "n_pairs", "s div n_pairs AS mean_true_jaccard_micro",
          "n_true_ge_50")
        .orderBy(col("matches"))
    },
    Some(s"""WITH toks AS (SELECT doc_id, ${DuckOps.tokens("text")} AS t FROM documents),
      sh AS (SELECT doc_id, ${DuckOps.shingles("t", 3)} AS s FROM toks),
      hs AS (SELECT doc_id, list_distinct(
               list_transform(s, x -> ${DuckOps.strHash60("x")})) AS h FROM sh),
      sig AS (SELECT doc_id, ${DuckOps.minhashSig("h", 16)} AS sig FROM hs),
      bands AS (SELECT doc_id, b, ${DuckOps.foldHash("sig[b * 4 + 1 : b * 4 + 4]")} AS bucket
                FROM sig, unnest(range(0, 4)) AS t(b)),
      cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
               FROM bands a JOIN bands b
               ON a.b = b.b AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
      p AS (SELECT CAST(len(list_filter(range(1, 17),
                i -> s1.sig[i] = s2.sig[i])) AS BIGINT) AS matches,
              CAST(len(list_intersect(h1.h, h2.h)) AS BIGINT) AS inter,
              CAST(len(h1.h) AS BIGINT) AS n1, CAST(len(h2.h) AS BIGINT) AS n2
            FROM cand
              JOIN sig s1 ON cand.d1 = s1.doc_id
              JOIN sig s2 ON cand.d2 = s2.doc_id
              JOIN hs h1 ON cand.d1 = h1.doc_id
              JOIN hs h2 ON cand.d2 = h2.doc_id),
      tj AS (SELECT matches, CASE WHEN n1 + n2 - inter = 0 THEN 1000000
               ELSE (inter * 1000000) // (n1 + n2 - inter) END AS tj FROM p)
      SELECT matches, CAST(count(*) AS BIGINT) AS n_pairs,
        CAST(COALESCE(sum(tj), 0) // count(*) AS BIGINT) AS mean_true_jaccard_micro,
        CAST(COALESCE(sum(CASE WHEN tj >= 500000 THEN 1 ELSE 0 END), 0) AS BIGINT)
          AS n_true_ge_50
      FROM tj GROUP BY 1 ORDER BY 1"""))

  /** Correlated scalar subqueries and their DECORRELATION: orders
    * priced above their own customer's average, counted per customer
    * — written as correlated subqueries (the form analysts write),
    * which Catalyst must rewrite into aggregate + equi-joins (no
    * per-row re-execution; PlanAudit part-9 asserts no nested-loop
    * artifact survives). All math in exact cents: `price·count >
    * sum` avoids the order-sensitive double average entirely. */
  val q66: QueryDef = QueryDef(
    "q66_decorrelated_subquery",
    (s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("q66_orders")
      s.sql("""WITH o AS (SELECT o_custkey,
                 cast(round(o_totalprice * 100) as bigint) AS cents
               FROM q66_orders)
        SELECT o_custkey, count(*) AS n_above FROM o
        WHERE cents * (SELECT count(*) FROM o i WHERE i.o_custkey = o.o_custkey)
            > (SELECT sum(cents) FROM o i WHERE i.o_custkey = o.o_custkey)
        GROUP BY o_custkey ORDER BY o_custkey""")
    },
    Some("""WITH o AS (SELECT o_custkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders)
      SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_above FROM o
      WHERE cents * (SELECT count(*) FROM o i WHERE i.o_custkey = o.o_custkey)
          > (SELECT sum(cents) FROM o i WHERE i.o_custkey = o.o_custkey)
      GROUP BY o_custkey ORDER BY o_custkey"""))
}
