package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Cluster, Dedup, Similarity}

/** Round-10 additions, part 25: cross-source dup evidence, embedding
  * norm statistics, and the character-class profile.
  */
object Pipeline35 {

  def all: Seq[QueryDef] = Seq(d19, s27, t35)

  /** Cross-source dup evidence: c01's dedup components crossed with
    * the source dimension — per source-spread (how many distinct
    * sources a cluster touches) the cluster count. Spread > 1 is
    * syndication/mirroring, the provenance question behind licensing
    * a dedup pass raises. Oracle nests the recursive-CC chain. */
  val d19: QueryDef = QueryDef(
    "d19_cluster_sources",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = Dedup.minhashLshPairs(docs, "text", 3, 16, 4, 0.5)
        .select(col("d1"), col("d2"))
      val labels = Cluster.connectedComponents(pairs, "d1", "d2")
        .withColumnRenamed("id", "doc_id")
      docs.select(col("doc_id"), col("source"))
        .join(labels, Seq("doc_id"), "left")
        .selectExpr("cast(coalesce(lbl, doc_id) as bigint) AS cluster_id", "source")
        .groupBy(col("cluster_id"))
        .agg(countDistinct(col("source")).as("n_sources"))
        .groupBy(col("n_sources")).agg(count(lit(1)).as("n_clusters"))
        .orderBy(col("n_sources"))
    },
    Some(s"""SELECT n_sources, CAST(count(*) AS BIGINT) AS n_clusters FROM (
        SELECT c01.cluster_id, CAST(count(DISTINCT d.source) AS BIGINT) AS n_sources
        FROM (${Pipeline3.c01.oracle.get}) AS c01
          JOIN documents d ON c01.doc_id = d.doc_id
        GROUP BY 1)
      GROUP BY 1 ORDER BY 1"""))

  /** Embedding norm statistics: per-vector L2 norms micro-quantized
    * ONCE (a single IEEE sqrt then one round), then exact integer
    * min/max and interpolated percentiles — the "are my vectors
    * normalized" sanity row every embedding pipeline needs. */
  val s27: QueryDef = QueryDef(
    "s27_norm_stats",
    (s, d) => Similarity.prepared(Tables.embeddings(s, d))
      .selectExpr("cast(round(sqrt(nrm) * 1000000) as long) AS norm_micro")
      .agg(count(lit(1)).as("n"), min(col("norm_micro")).as("min_micro"),
        expr("percentile(norm_micro, 0.5)").as("p50_micro"),
        expr("percentile(norm_micro, 0.9)").as("p90_micro"),
        max(col("norm_micro")).as("max_micro")),
    Some(s"""WITH e AS (SELECT list_transform(embedding, x -> x::DOUBLE) AS v
               FROM embeddings),
      n AS (SELECT CAST(round(sqrt(${DuckOps.norm2("v")}) * 1000000) AS BIGINT)
              AS norm_micro FROM e)
      SELECT CAST(count(*) AS BIGINT) AS n,
        CAST(min(norm_micro) AS BIGINT) AS min_micro,
        quantile_cont(norm_micro, 0.5) AS p50_micro,
        quantile_cont(norm_micro, 0.9) AS p90_micro,
        CAST(max(norm_micro) AS BIGINT) AS max_micro
      FROM n"""))

  /** Character-class profile: per doc the vowel / consonant / space /
    * other counts and the vowel share of letters in micro units — a
    * cheap gibberish signal (natural language sits near 38–42%
    * vowels). Map-only. */
  val t35: QueryDef = QueryDef(
    "t35_charclass_profile",
    (s, d) => Tables.documents(s, d)
      .selectExpr("doc_id",
        "cast(length(text) as bigint) AS n_chars",
        "cast(length(regexp_replace(lower(text), '[^aeiou]', '')) as bigint) AS vowels",
        "cast(length(regexp_replace(lower(text), '[^b-df-hj-np-tv-z]', '')) as bigint) AS consonants",
        "cast(length(regexp_replace(text, '[^ ]', '')) as bigint) AS spaces")
      .selectExpr("doc_id", "n_chars", "vowels", "consonants", "spaces",
        "if(vowels + consonants = 0, 0L," +
          " (vowels * 1000000) div (vowels + consonants)) AS vowel_share_micro")
      .orderBy(col("doc_id")),
    Some("""WITH b AS (SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n_chars,
               CAST(length(regexp_replace(lower(text), '[^aeiou]', '', 'g'))
                 AS BIGINT) AS vowels,
               CAST(length(regexp_replace(lower(text), '[^b-df-hj-np-tv-z]', '', 'g'))
                 AS BIGINT) AS consonants,
               CAST(length(regexp_replace(text, '[^ ]', '', 'g')) AS BIGINT) AS spaces
             FROM documents)
      SELECT doc_id, n_chars, vowels, consonants, spaces,
        CASE WHEN vowels + consonants = 0 THEN 0
          ELSE (vowels * 1000000) // (vowels + consonants) END AS vowel_share_micro
      FROM b ORDER BY doc_id"""))
}
