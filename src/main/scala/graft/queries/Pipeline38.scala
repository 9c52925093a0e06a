package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Dedup, Multimodal, TextOps}

/** Round-11 additions, part 3: multimodal near-dup pairs over
  * perceptual hashes, the LSH exact-dup recall invariant, and
  * deterministic per-group mode.
  */
object Pipeline38 {

  def all: Seq[QueryDef] = Seq(m12, d21, q64)

  /** Image near-duplicate pairs
    * ([[graft.operators.Multimodal.aHashNearDupPairs]]): m08's real
    * PPM-decode average-hashes banded into 4×16 bits, candidates
    * through the band equi-join, each verified by exact Hamming
    * distance with the near-dup verdict at <= 3 — recall of flagged
    * pairs is EXACT by pigeonhole (3 bit flips cannot touch all 4
    * bands). The oracle nests m08's generator-arithmetic hash replay
    * and re-verifies every candidate's bit_count. */
  val m12: QueryDef = QueryDef(
    "m12_phash_neardup",
    (s, d) => Multimodal.aHashNearDupPairs(
      Multimodal.imageAHash(
        Multimodal.mediaFromDocuments(Tables.documents(s, d))),
      maxHamming = 3),
    Some(s"""WITH h AS (SELECT media_id, hash_hi, hash_lo
               FROM (${Pipeline16.m08.oracle.get}) AS m08),
      b AS (SELECT media_id, hash_hi, hash_lo, bi,
              CASE bi WHEN 0 THEN hash_lo % 65536
                      WHEN 1 THEN hash_lo // 65536
                      WHEN 2 THEN hash_hi % 65536
                      ELSE hash_hi // 65536 END AS bv
            FROM h, unnest([0, 1, 2, 3]) AS t(bi)),
      cand AS (SELECT DISTINCT a.media_id AS m1, c.media_id AS m2,
                 a.hash_hi AS h1h, a.hash_lo AS h1l,
                 c.hash_hi AS h2h, c.hash_lo AS h2l
               FROM b a JOIN b c ON a.bi = c.bi AND a.bv = c.bv
                 AND a.media_id < c.media_id)
      SELECT m1, m2,
        CAST(bit_count(xor(h1h, h2h)) + bit_count(xor(h1l, h2l)) AS BIGINT)
          AS hamming,
        bit_count(xor(h1h, h2h)) + bit_count(xor(h1l, h2l)) <= 3 AS is_neardup
      FROM cand
      ORDER BY m1, m2"""))

  /** LSH exact-dup recall invariant (the BENCH_SCALE finding-2 claim
    * as a cross-engine-checked query): ground-truth pairs are docs
    * with IDENTICAL text (the d01 fingerprint), eligibility is
    * having >= 1 shingle (>= 3 tokens — shorter docs have no
    * signature by construction), and every eligible truth pair MUST
    * be caught by d03's MinHash-LSH (identical text → identical
    * signature → same band buckets → candidate → jaccard 1 passes
    * any threshold). Output: truth pairs, eligible pairs, caught,
    * and recall over eligible — pinned at exactly 1e6 by the oracle
    * hash at the test SFs, and the number to re-check before trusting
    * signature dedup on a new corpus.
    *
    * 100 TB shape: truth-pair enumeration is a fingerprint-keyed
    * self equi-join (fan-out bounded by dup-group size²); the
    * membership probe is one equi-join onto d03's audited candidate
    * machinery; the fold is one row. */
  val d21: QueryDef = QueryDef(
    "d21_lsh_recall_audit",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val fp = docs.selectExpr("doc_id", s"${TextOps.strHash60("text")} AS fp",
        s"cast(size(${TextOps.tokens("text")}) >= 3 as long) AS eligible")
      val tp = fp.as("a").join(fp.as("b"),
          col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
        .selectExpr("a.doc_id AS d1", "b.doc_id AS d2",
          "a.eligible * b.eligible AS both_eligible")
      val caught = Dedup.minhashLshPairs(docs, "text", 3, 16, 4, 0.5)
        .select(col("d1"), col("d2")).withColumn("hit", lit(1L))
      tp.join(caught, Seq("d1", "d2"), "left")
        .selectExpr("both_eligible", "coalesce(hit, 0L) * both_eligible AS hit")
        .agg(count(lit(1)).as("n_truth_pairs"),
          coalesce(sum(col("both_eligible")), lit(0L)).as("n_eligible_pairs"),
          coalesce(sum(col("hit")), lit(0L)).as("n_caught"))
        .selectExpr("n_truth_pairs", "n_eligible_pairs", "n_caught",
          "if(n_eligible_pairs = 0, 1000000L, " +
            "cast((cast(n_caught as decimal(38,0)) * 1000000)" +
            " div n_eligible_pairs as bigint)) AS recall_micro")
    },
    Some(s"""WITH fp AS (SELECT doc_id, ${DuckOps.strHash60("text")} AS fp,
               CASE WHEN len(${DuckOps.tokens("text")}) >= 3 THEN 1 ELSE 0 END
                 AS eligible
             FROM documents),
      tp AS (SELECT a.doc_id AS d1, b.doc_id AS d2,
               a.eligible * b.eligible AS both_eligible
             FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id),
      caught AS (SELECT d1, d2, 1 AS hit
                 FROM (${Pipeline.d03.oracle.get}) AS d03),
      m AS (SELECT tp.both_eligible,
              COALESCE(c.hit, 0) * tp.both_eligible AS hit
            FROM tp LEFT JOIN caught c ON tp.d1 = c.d1 AND tp.d2 = c.d2),
      a AS (SELECT CAST(count(*) AS BIGINT) AS n_truth_pairs,
              CAST(COALESCE(sum(both_eligible), 0) AS BIGINT) AS n_eligible_pairs,
              CAST(COALESCE(sum(hit), 0) AS BIGINT) AS n_caught
            FROM m)
      SELECT n_truth_pairs, n_eligible_pairs, n_caught,
        CAST(CASE WHEN n_eligible_pairs = 0 THEN 1000000
          ELSE (CAST(n_caught AS HUGEINT) * 1000000) // n_eligible_pairs
          END AS BIGINT) AS recall_micro
      FROM a"""))

  /** Deterministic per-group mode: each l_returnflag group's modal
    * ship MONTH (ties to the smallest month — a strict total order,
    * unlike engine-native mode()), with the mode's count and micro
    * share of the group. One (flag, month) partial agg + a window
    * over the tiny (flags × 12) grid. */
  val q64: QueryDef = QueryDef(
    "q64_group_mode",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val g = Tables.lineitem(s, d)
        .selectExpr("l_returnflag", "cast(month(l_shipdate) as bigint) AS ship_month")
        .groupBy(col("l_returnflag"), col("ship_month"))
        .agg(count(lit(1)).as("n"))
      val tot = g.groupBy(col("l_returnflag")).agg(sum(col("n")).as("n_group"))
      g.withColumn("rn", row_number().over(
          Window.partitionBy(col("l_returnflag"))
            .orderBy(col("n").desc, col("ship_month").asc)))
        .filter(col("rn") === 1)
        .join(tot, Seq("l_returnflag"))
        .selectExpr("l_returnflag", "ship_month AS mode_month",
          "n AS n_mode", "n_group",
          "cast((cast(n as decimal(38,0)) * 1000000) div n_group as bigint)" +
            " AS mode_share_micro")
        .orderBy(col("l_returnflag"))
    },
    Some("""WITH g AS (SELECT l_returnflag,
               CAST(month(l_shipdate) AS BIGINT) AS ship_month,
               CAST(count(*) AS BIGINT) AS n
             FROM lineitem GROUP BY 1, 2),
      tot AS (SELECT l_returnflag, CAST(sum(n) AS BIGINT) AS n_group
              FROM g GROUP BY 1),
      top AS (SELECT l_returnflag, ship_month, n FROM (
          SELECT l_returnflag, ship_month, n,
            row_number() OVER (PARTITION BY l_returnflag
              ORDER BY n DESC, ship_month ASC) AS rn
          FROM g) WHERE rn = 1)
      SELECT t.l_returnflag, t.ship_month AS mode_month, t.n AS n_mode,
        tot.n_group,
        CAST((CAST(t.n AS HUGEINT) * 1000000) // tot.n_group AS BIGINT)
          AS mode_share_micro
      FROM top t JOIN tot ON t.l_returnflag = tot.l_returnflag
      ORDER BY t.l_returnflag"""))
}
