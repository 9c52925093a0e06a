package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Graph, TextOps}

/** Round-11 additions, part 50: source-authority PageRank over the
  * prefix-duplication flow — the c02 exact-integer iteration over
  * c17's edge universe, reversed so rank flows FROM copiers TO the
  * sources they copy.
  */
object Pipeline85 {

  def all: Seq[QueryDef] = Seq(c18)

  /** Source authority by duplication flow: every prefix-fingerprint
    * dup group (the c17/d27/p45 universe) casts a weighted
    * endorsement FROM the copying source TO the keeper source (edge
    * dup → keeper, weight = copied-doc count, same-source flows
    * dropped), and 5 rounds of the exact-integer weighted PageRank
    * ([[graft.operators.Graph.pageRank]], c02's audited machinery)
    * rank the sources everyone copies from. The oracle nests the
    * edge CTE and replays the identical unrolled iteration
    * (Pipeline9.prStep — one definition, two call sites).
    *
    * 100 TB shape: the corpus-sized work is one tokenize+hash pass +
    * the fingerprint agg; the rank iteration lives on the
    * source-vocabulary graph (c02's per-round equi-join + partial
    * agg + O(1) dangling broadcast on ≤S² rows). */
  val c18: QueryDef = QueryDef(
    "c18_source_authority",
    (s, d) => {
      val fp = Tables.documents(s, d)
        .selectExpr("doc_id", "source", s"${TextOps.tokens("text")} AS t")
        .selectExpr("doc_id", "source",
          s"${TextOps.strHash60("concat_ws(' ', slice(t, 1, 40))")} AS fp")
      val keep = fp.groupBy(col("fp")).agg(min(col("doc_id")).as("keeper"))
      val kSrc = keep.join(
        fp.selectExpr("doc_id AS keeper", "source AS keeper_source"),
        Seq("keeper"))
      val edges = fp.join(kSrc, Seq("fp"))
        .filter(col("doc_id") =!= col("keeper") &&
          col("keeper_source") =!= col("source"))
        .groupBy(col("source").as("src"), col("keeper_source").as("dst"))
        .agg(count(lit(1)).as("w"))
      Graph.pageRank(edges, "src", "dst", "w", iterations = 5,
          dampingMicro = Pipeline9.DampingMicro)
        .selectExpr("id AS source", "rank_micro")
        .orderBy(col("source"))
    },
    Some(s"""WITH tk AS (SELECT doc_id, source, ${DuckOps.tokens("text")} AS t
               FROM documents),
      fpt AS (SELECT doc_id, source,
               ${DuckOps.strHash60("array_to_string(t[1:40], ' ')")} AS fp
             FROM tk),
      keep AS (SELECT fp, min(doc_id) AS keeper FROM fpt GROUP BY 1),
      ks AS (SELECT keep.fp, keep.keeper, f.source AS keeper_source
             FROM keep JOIN fpt f ON keep.keeper = f.doc_id),
      e AS (SELECT m.source AS src, ks.keeper_source AS dst,
              CAST(count(*) AS BIGINT) AS w
            FROM fpt m JOIN ks ON m.fp = ks.fp
            WHERE m.doc_id <> ks.keeper AND ks.keeper_source <> m.source
            GROUP BY 1, 2),
      nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
      nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
      outw AS (SELECT src AS id, CAST(sum(w) AS BIGINT) AS ow FROM e GROUP BY 1),
      ew AS (SELECT e.src, e.dst, e.w, o.ow FROM e JOIN outw o ON e.src = o.id),
      dang AS (SELECT n.id FROM nodes n ANTI JOIN outw o ON n.id = o.id),
      r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS r FROM nodes),
      ${(1 to 5).map(Pipeline9.prStep(_, Pipeline9.DampingMicro,
        Pipeline9.TeleportMicro)).mkString(",\n      ")}
      SELECT r5.id AS source, r5.r AS rank_micro
      FROM r5 ORDER BY source"""))
}
