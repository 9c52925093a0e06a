package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Round-11 additions, part 24: codec round-trip integrity and the
  * one-row release summary composition.
  */
object Pipeline59 {

  def all: Seq[QueryDef] = Seq(m14, p42)

  /** Codec round-trip integrity per media kind: decode every real
    * payload (PPM / WAV / Y4M) and re-encode it; the bytes must come
    * back IDENTICAL — the lossless-format invariant an ingest
    * pipeline asserts before trusting transcoded shards (the
    * cass_roundtrip discipline applied to media). The verdict is
    * computed in-plan; the oracle pins the per-kind counts with
    * exact == total (the generator/codec contract — any lossy
    * re-encode breaks the hash). Map-only decode+encode; one tiny
    * agg. */
  val m14: QueryDef = QueryDef(
    "m14_codec_roundtrip",
    (s, d) => {
      import s.implicits._
      import graft.operators.{MediaCodec, Multimodal}
      Multimodal.mediaFromDocuments(Tables.documents(s, d))
        .map { m =>
          val re = m.kind match {
            case "image" =>
              val p = MediaCodec.decodePpm(m.payload)
              MediaCodec.encodePpm(p.width, p.height, p.rgb)
            case "audio" =>
              val w = MediaCodec.decodeWav(m.payload)
              MediaCodec.encodeWav(w.sampleRate, w.samples)
            case _ =>
              val v = MediaCodec.decodeY4m(m.payload)
              MediaCodec.encodeY4m(v.width, v.height, v.lumaFrames)
          }
          (m.kind, if (java.util.Arrays.equals(re, m.payload)) 1L else 0L)
        }
        .toDF("kind", "exact")
        .groupBy(col("kind"))
        .agg(count(lit(1)).as("n_items"),
          coalesce(sum(col("exact")), lit(0L)).as("n_exact"))
        .orderBy(col("kind"))
    },
    Some("""SELECT kind,
        CAST(count(*) AS BIGINT) AS n_items,
        CAST(count(*) AS BIGINT) AS n_exact
      FROM (SELECT doc_id,
              CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                ELSE 'video' END AS kind
            FROM documents)
      GROUP BY kind ORDER BY kind"""))

  /** The RELEASE SUMMARY — one row captioning the whole curation
    * pipeline, every number lifted from an already-audited operator:
    * total and post-dedup effective tokens with the savings share
    * (p35), exact-dup doc count (d01's fingerprints), and the count
    * of pinned eval docs contaminated by the corpus (t37). The
    * oracle NESTS those queries' own oracle chains — one source of
    * truth end to end. */
  val p42: QueryDef = QueryDef(
    "p42_release_summary",
    (s, d) => {
      import graft.operators.{Decontaminate, Dedup, TextOps}
      val docs = Tables.documents(s, d)
      val sav = Dedup.segmentDedupSavings(docs, "text", 8)
        .agg(coalesce(sum(col("n_tokens")), lit(0L)).as("total_tokens"),
          coalesce(sum(col("effective_tokens")), lit(0L)).as("effective_tokens"))
      val dup = docs.selectExpr(s"${TextOps.strHash60("text")} AS fp")
        .agg((count(lit(1)) - countDistinct(col("fp"))).as("n_dup_docs"))
      val cont = Decontaminate.ngramOverlapAudit(
          docs.filter(col("doc_id") < 50), docs.filter(col("doc_id") >= 50),
          "text", 5, 500000L)
        .agg(coalesce(sum(expr("cast(contaminated as bigint)")), lit(0L))
          .as("n_contaminated_eval"))
      sav.crossJoin(broadcast(dup)).crossJoin(broadcast(cont))
        .selectExpr("total_tokens", "effective_tokens",
          "cast(((cast(total_tokens as decimal(38,0)) - effective_tokens) * 1000000) div total_tokens as bigint) AS savings_micro",
          "n_dup_docs", "n_contaminated_eval")
    },
    Some(s"""WITH p35 AS (SELECT * FROM (${Pipeline42.p35.oracle.get}) AS x),
      sav AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
                CAST(sum(effective_tokens) AS BIGINT) AS effective_tokens
              FROM p35),
      dup AS (SELECT CAST(count(*) - count(DISTINCT ${DuckOps.strHash60("text")})
                AS BIGINT) AS n_dup_docs FROM documents),
      t37 AS (SELECT * FROM (${Pipeline41.t37.oracle.get}) AS y),
      cont AS (SELECT CAST(COALESCE(sum(CASE WHEN contaminated THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS n_contaminated_eval FROM t37)
      SELECT total_tokens, effective_tokens,
        CAST(((CAST(total_tokens AS HUGEINT) - effective_tokens) * 1000000)
          // total_tokens AS BIGINT) AS savings_micro,
        n_dup_docs, n_contaminated_eval
      FROM sav, dup, cont"""))
}
