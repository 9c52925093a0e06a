package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Multimodal, TextOps}

/** Round-10 additions, part 22: two-hop reach, incremental ingest
  * dedup, and the media manifest.
  */
object Pipeline32 {

  def all: Seq[QueryDef] = Seq(c08, d17, m11)

  /** Two-hop reach on the undirected trade graph: per node the
    * direct-neighbor count and the count of NEW nodes first reachable
    * at hop two (friend-of-friend reach, self and directs excluded) —
    * the expansion statistic behind graph-sampling fanout estimates.
    * One adjacency self-join keyed by the middle node (fan-out
    * bounded by degree), then distinct + an anti-join against the
    * 1-hop set. */
  val c08: QueryDef = QueryDef(
    "c08_two_hop",
    (s, d) => {
      val und = Pipeline11.tradeEdges(s, d)
        .filter(col("src") =!= col("dst"))
        .selectExpr("least(src, dst) AS a", "greatest(src, dst) AS b").distinct()
      val adj = und.selectExpr("a AS u", "b AS v")
        .unionByName(und.selectExpr("b AS u", "a AS v"))
      val oneHop = adj.groupBy(col("u")).agg(count(lit(1)).as("n_1hop"))
      val twoHop = adj.selectExpr("u", "v AS mid")
        .join(adj.selectExpr("u AS mid", "v AS w"), Seq("mid"))
        .filter(col("u") =!= col("w"))
        .select(col("u"), col("w")).distinct()
        .join(adj.selectExpr("u", "v AS w").withColumn("direct", lit(true)),
          Seq("u", "w"), "left")
        .filter(col("direct").isNull)
        .groupBy(col("u")).agg(count(lit(1)).as("n_2hop_new"))
      oneHop.join(twoHop, Seq("u"), "left")
        .na.fill(0L, Seq("n_2hop_new"))
        .selectExpr("cast(u as bigint) AS node", "n_1hop", "n_2hop_new")
        .orderBy(col("node"))
    },
    Some(s"""WITH ${Pipeline11.tradeEdgesSql},
      und AS (SELECT least(src, dst) AS a, greatest(src, dst) AS b
              FROM e WHERE src <> dst GROUP BY 1, 2),
      adj AS (SELECT a AS u, b AS v FROM und UNION ALL SELECT b, a FROM und),
      oneh AS (SELECT u, CAST(count(*) AS BIGINT) AS n_1hop FROM adj GROUP BY 1),
      twoh AS (SELECT DISTINCT x.u, y.v AS w
               FROM adj x JOIN adj y ON x.v = y.u AND y.v <> x.u),
      fresh AS (SELECT t.u, CAST(count(*) AS BIGINT) AS n_2hop_new
                FROM twoh t LEFT JOIN adj a ON t.u = a.u AND t.w = a.v
                WHERE a.u IS NULL GROUP BY 1)
      SELECT CAST(oneh.u AS BIGINT) AS node, oneh.n_1hop,
        CAST(COALESCE(fresh.n_2hop_new, 0) AS BIGINT) AS n_2hop_new
      FROM oneh LEFT JOIN fresh ON oneh.u = fresh.u
      ORDER BY node"""))

  /** Incremental ingest dedup: the last 10% of doc_ids play the
    * "newly arrived batch"; each new doc is checked against the OLD
    * corpus's exact token fingerprints (broadcast semi-join on the
    * 60-bit hash) — the admit/reject decision an incremental ingest
    * makes without re-deduplicating the whole corpus. */
  val d17: QueryDef = QueryDef(
    "d17_incremental_dedup",
    (s, d) => {
      val fp = Tables.documents(s, d)
        .selectExpr("doc_id",
          s"${TextOps.strHash60(s"concat_ws(' ', ${TextOps.tokens("text")})")} AS fp")
      val cut = fp.agg(expr("percentile(doc_id, 0.9)").as("cut"))
      val marked = fp.crossJoin(broadcast(cut))
        .withColumn("is_new", col("doc_id") > col("cut"))
      val oldFps = marked.filter(!col("is_new")).select(col("fp")).distinct()
      marked.filter(col("is_new"))
        .join(oldFps.withColumn("known", lit(true)), Seq("fp"), "left")
        .selectExpr("doc_id", "coalesce(known, false) AS is_duplicate")
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH fp AS (SELECT doc_id,
               ${DuckOps.strHash60(s"array_to_string(${DuckOps.tokens("text")}, ' ')")} AS fp
             FROM documents),
      cut AS (SELECT quantile_cont(doc_id, 0.9) AS cut FROM fp),
      oldf AS (SELECT DISTINCT f.fp FROM fp f, cut WHERE f.doc_id <= cut.cut)
      SELECT f.doc_id, o.fp IS NOT NULL AS is_duplicate
      FROM fp f CROSS JOIN cut
        LEFT JOIN oldf o ON f.fp = o.fp
      WHERE f.doc_id > cut.cut
      ORDER BY f.doc_id"""))

  /** Media manifest: per kind the record count, payload byte mass,
    * and milli mean size over the synthesized real-codec payloads —
    * the storage-governance inventory row per modality. */
  val m11: QueryDef = QueryDef(
    "m11_media_manifest",
    (s, d) => Multimodal.mediaFromDocuments(Tables.documents(s, d)).toDF()
      .selectExpr("kind", "cast(length(payload) as bigint) AS nb")
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_media"), sum(col("nb")).as("total_bytes"))
      .selectExpr("kind", "n_media", "total_bytes",
        "(total_bytes * 1000) div n_media AS mean_bytes_milli")
      .orderBy(col("kind")),
    Some("""WITH m AS (SELECT doc_id,
          CASE WHEN doc_id % 3 = 0 THEN 'image'
               WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
          CASE WHEN doc_id % 3 = 0 THEN
              CAST(9 + length(CAST(4 + doc_id % 29 AS VARCHAR))
                + length(CAST(4 + doc_id % 23 AS VARCHAR))
                + 3 * (4 + doc_id % 29) * (4 + doc_id % 23) AS BIGINT)
            WHEN doc_id % 3 = 1 THEN CAST(44 + 2 * (16 + doc_id % 240) AS BIGINT)
            ELSE CAST(length('YUV4MPEG2 W' || CAST(2 * (2 + doc_id % 14) AS VARCHAR)
                || ' H' || CAST(2 * (2 + doc_id % 10) AS VARCHAR)
                || ' F25:1 Ip A1:1 C420jpeg' || chr(10))
              + (1 + doc_id % 27) * (6 + (2 * (2 + doc_id % 14) * 2 * (2 + doc_id % 10) * 3) // 2)
              AS BIGINT)
          END AS nb
        FROM documents)
      SELECT kind, CAST(count(*) AS BIGINT) AS n_media,
        CAST(sum(nb) AS BIGINT) AS total_bytes,
        (CAST(sum(nb) AS BIGINT) * 1000) // CAST(count(*) AS BIGINT)
          AS mean_bytes_milli
      FROM m GROUP BY 1 ORDER BY 1"""))
}
