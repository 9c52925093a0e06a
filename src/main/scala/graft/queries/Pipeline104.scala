package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Multimodal

/** Round-15 additions, part 93: the rare-fingerprint (k-anonymity)
  * audit over perceptual image hashes — d37's memorization-risk
  * question asked of the image modality — and the streaming ingest-mix
  * monitor (bounded-state per-source counts over a document stream).
  */
object Pipeline104 {

  def all: Seq[QueryDef] = Seq(m19, st16)

  /** One-row audit of the m08 perceptual-hash population: images
    * whose exact 64-bit aHash occurs once are the visually-unique
    * (memorization-risk) class; big collision groups are the stock
    * assets near-dup passes should be pointed at first. */
  val m19: QueryDef = QueryDef(
    "m19_rare_phash_audit",
    (s, d) => {
      val h = Multimodal.imageAHash(
        Multimodal.mediaFromDocuments(Tables.documents(s, d)))
      h.groupBy(col("hash_hi"), col("hash_lo"))
        .agg(count(lit(1)).as("c"))
        .agg(count(lit(1)).as("n_distinct"),
          sum(col("c")).as("n_images"),
          sum(expr("if(c = 1, 1L, 0L)")).as("n_singleton"),
          max(col("c")).as("max_group"))
        .selectExpr("n_images", "n_distinct", "n_singleton", "max_group",
          "cast((cast(n_singleton as decimal(38,0)) * 1000000)" +
            " div n_images as bigint) AS singleton_share_micro")
    },
    Some(s"""WITH h AS (SELECT hash_hi, hash_lo
               FROM (${Pipeline16.m08.oracle.get}) AS m08),
      g AS (SELECT hash_hi, hash_lo, CAST(count(*) AS BIGINT) AS c
            FROM h GROUP BY 1, 2)
      SELECT CAST(sum(c) AS BIGINT) AS n_images,
        CAST(count(*) AS BIGINT) AS n_distinct,
        CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_singleton,
        CAST(max(c) AS BIGINT) AS max_group,
        CAST((CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS HUGEINT)
          * 1000000) // sum(c) AS BIGINT) AS singleton_share_micro
      FROM g"""))

  /** Streaming ingest-mix monitor: per-source doc counts and token
    * mass over a document stream, complete-mode memory sink — the
    * dashboard a 100 TB ingest keeps open. State is O(sources) rows
    * regardless of stream volume (the st06 algebraic-state argument
    * on the documents table), so the monitor never grows with the
    * corpus. */
  val st16: QueryDef = QueryDef(
    "st16_stream_source_mix",
    (s, d) => {
      val schema = Tables.documents(s, d).schema
      val tbl = "st16_stream_source_mix_sink"
      // a driver sf dir holds documents.parquet as a FILE (glob-filter
      // the dir); a Spark-written slice holds it as a DIRECTORY of
      // parts (stream the directory itself) — without the branch the
      // glob filter matches nothing and the monitor reads a silently
      // EMPTY stream, the failure class this engine never tolerates
      val tableDir = new java.io.File(d, "documents.parquet")
      val stream =
        if (tableDir.isDirectory)
          s.readStream.schema(schema).parquet(tableDir.getPath)
        else s.readStream.schema(schema)
          .option("pathGlobFilter", "documents.parquet").parquet(d)
      val agg = stream
        .selectExpr("source",
          "cast(size(filter(split(text, '[ ]+'), x -> x != '')) as bigint)" +
            " AS nt")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"))
      val q = agg.writeStream.outputMode("complete").format("memory")
        .queryName(tbl).start()
      try q.processAllAvailable() finally q.stop()
      s.table(tbl).orderBy(col("source"))
    },
    Some("""SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(len(list_filter(regexp_split_to_array(text, '[ ]+'),
          x -> x <> ''))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY 1 ORDER BY 1"""))
}
