package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Similarity

/** Round-10 additions, part 17: per-class precision/recall/F1 from
  * the language-ID confusion matrix, multiset set operations, and
  * k-means centroid drift.
  */
object Pipeline27 {

  def all: Seq[QueryDef] = Seq(t30, q57, s25)

  /** Per-class precision / recall / F1 in exact micro units, derived
    * from t02's confusion matrix: `F1 = 2·tp·1e6 div (2·tp+fp+fn)` —
    * no float ratios, zero-denominator classes report 0. Classes that
    * are only ever PREDICTED ('unknown') still get a row via the full
    * outer fold. Everything after the matrix is grid arithmetic. */
  val t30: QueryDef = QueryDef(
    "t30_langid_prf",
    (s, d) => {
      val m = Pipeline.t02.run(s, d).selectExpr("lang", "guessed", "n")
      val act = m.groupBy(col("lang").as("cls")).agg(sum(col("n")).as("actual"))
      val prd = m.groupBy(col("guessed").as("cls")).agg(sum(col("n")).as("predicted"))
      val tp = m.filter(col("lang") === col("guessed"))
        .groupBy(col("lang").as("cls")).agg(sum(col("n")).as("tp"))
      act.join(prd, Seq("cls"), "full_outer")
        .join(tp, Seq("cls"), "left")
        .na.fill(0L, Seq("actual", "predicted", "tp"))
        .selectExpr("cls", "actual", "predicted", "tp",
          "if(predicted = 0, 0L, (tp * 1000000) div predicted) AS prec_micro",
          "if(actual = 0, 0L, (tp * 1000000) div actual) AS rec_micro",
          "if(2 * tp + (predicted - tp) + (actual - tp) = 0, 0L," +
            " (2 * tp * 1000000) div (2 * tp + (predicted - tp) + (actual - tp)))" +
            " AS f1_micro")
        .orderBy(col("cls"))
    },
    Some(s"""WITH m AS (SELECT lang, guessed, n
               FROM (${Pipeline.t02.oracle.get}) AS t02),
      act AS (SELECT lang AS cls, CAST(sum(n) AS BIGINT) AS actual
              FROM m GROUP BY 1),
      prd AS (SELECT guessed AS cls, CAST(sum(n) AS BIGINT) AS predicted
              FROM m GROUP BY 1),
      tp AS (SELECT lang AS cls, CAST(sum(n) AS BIGINT) AS tp
             FROM m WHERE lang = guessed GROUP BY 1),
      f AS (SELECT COALESCE(act.cls, prd.cls) AS cls,
              COALESCE(act.actual, 0) AS actual,
              COALESCE(prd.predicted, 0) AS predicted
            FROM act FULL OUTER JOIN prd ON act.cls = prd.cls)
      SELECT f.cls, f.actual, f.predicted, COALESCE(tp.tp, 0) AS tp,
        CASE WHEN f.predicted = 0 THEN 0
          ELSE (COALESCE(tp.tp, 0) * 1000000) // f.predicted END AS prec_micro,
        CASE WHEN f.actual = 0 THEN 0
          ELSE (COALESCE(tp.tp, 0) * 1000000) // f.actual END AS rec_micro,
        CASE WHEN 2 * COALESCE(tp.tp, 0) + (f.predicted - COALESCE(tp.tp, 0))
               + (f.actual - COALESCE(tp.tp, 0)) = 0 THEN 0
          ELSE (2 * COALESCE(tp.tp, 0) * 1000000)
            // (2 * COALESCE(tp.tp, 0) + (f.predicted - COALESCE(tp.tp, 0))
               + (f.actual - COALESCE(tp.tp, 0))) END AS f1_micro
      FROM f LEFT JOIN tp ON f.cls = tp.cls
      ORDER BY f.cls"""))

  /** Multiset set operations — INTERSECT ALL (min multiplicity) and
    * EXCEPT ALL (clamped difference), the duplicate-preserving
    * complements of q09/q10's distinct set ops — folded to per-key
    * multiplicities. */
  val q57: QueryDef = QueryDef(
    "q57_multiset_ops",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val a = li.filter(col("l_returnflag") === "R")
        .selectExpr("cast(l_partkey as bigint) AS pk")
      val b = li.filter(col("l_linestatus") === "F")
        .selectExpr("cast(l_partkey as bigint) AS pk")
      val ia = a.intersectAll(b).groupBy(col("pk"))
        .agg(count(lit(1)).as("n")).withColumn("op", lit("intersect_all"))
      val ea = a.exceptAll(b).groupBy(col("pk"))
        .agg(count(lit(1)).as("n")).withColumn("op", lit("except_all"))
      ia.unionByName(ea).select(col("op"), col("pk"), col("n"))
        .orderBy(col("op"), col("pk"))
    },
    Some("""WITH a AS (SELECT CAST(l_partkey AS BIGINT) AS pk FROM lineitem
               WHERE l_returnflag = 'R'),
      b AS (SELECT CAST(l_partkey AS BIGINT) AS pk FROM lineitem
            WHERE l_linestatus = 'F'),
      ia AS (SELECT pk FROM a INTERSECT ALL SELECT pk FROM b),
      ea AS (SELECT pk FROM a EXCEPT ALL SELECT pk FROM b)
      SELECT op, pk, n FROM (
        SELECT 'intersect_all' AS op, pk, CAST(count(*) AS BIGINT) AS n
        FROM ia GROUP BY 2
        UNION ALL
        SELECT 'except_all', pk, CAST(count(*) AS BIGINT) FROM ea GROUP BY 2)
      ORDER BY op, pk"""))

  /** Centroid drift — the k-means convergence monitor: per centroid
    * the L1 movement (in micro units, summed over dims) between the
    * fixed initial codebook and one Lloyd update (s06's exact
    * integer means). A converged centroid drifts ~0; the monitor a
    * training loop watches to stop early. */
  val s25: QueryDef = QueryDef(
    "s25_centroid_drift",
    (s, d) => {
      val upd = Similarity.kmeansUpdate(Tables.embeddings(s, d), 16)
      val orig = Tables.embeddings(s, d).filter(col("vec_id") < 16)
        .selectExpr("vec_id AS centroid", "posexplode(embedding) AS (p, x)")
        .selectExpr("centroid", "cast(p + 1 as bigint) AS dim",
          "cast(round(cast(x as double) * 1000000) as long) AS orig_micro")
      upd.join(orig, Seq("centroid", "dim"))
        .groupBy(col("centroid"))
        .agg(max(col("n_members")).as("n_members"),
          sum(expr("abs(mean_micro - orig_micro)")).as("drift_micro"))
        .orderBy(col("centroid"))
    },
    Some(s"""WITH upd AS (SELECT centroid, dim, n_members, mean_micro
               FROM (${Pipeline3.s06.oracle.get}) AS s06),
      orig AS (SELECT CAST(vec_id AS BIGINT) AS centroid,
                 CAST(i AS BIGINT) AS dim,
                 CAST(round(embedding[i]::DOUBLE * 1000000) AS BIGINT) AS orig_micro
               FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
               WHERE vec_id < 16)
      SELECT upd.centroid, CAST(max(upd.n_members) AS BIGINT) AS n_members,
        CAST(sum(abs(upd.mean_micro - orig.orig_micro)) AS BIGINT) AS drift_micro
      FROM upd JOIN orig ON upd.centroid = orig.centroid AND upd.dim = orig.dim
      GROUP BY 1 ORDER BY 1"""))
}
