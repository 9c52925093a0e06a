package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column processing (builder brief M5): image/audio/video
  * treated as opaque `binary` payload columns with typed metadata.
  *
  * The Spark-side plumbing is real — schema, partition-parallel batch
  * iteration (the JVM analog of `mapInPandas` batch shape), feature
  * schema, deterministic partitioning — while the actual media decode
  * is STUBBED behind [[decodeStub]] (no image/audio libs in this
  * build): it derives deterministic pseudo-features from the payload
  * digest, so pipelines and tests exercise the full dataflow and a
  * real decoder can be swapped in without touching any schema.
  */
object Multimodal {

  final case class MediaRecord(
      media_id: Long,
      kind: String, // image | audio | video
      mime: String,
      source: String,
      payload: Array[Byte])

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      digest: String,
      width: Int,
      height: Int,
      channels: Int,
      n_frames: Int,
      embedding: Array[Float])

  /** Manufacture a deterministic media table from the documents corpus
    * (text bytes standing in for encoded media). */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.selectExpr(
        "doc_id AS media_id",
        "element_at(array('image','audio','video'), cast(doc_id % 3 as int) + 1) AS kind",
        "element_at(array('image/png','audio/wav','video/mp4'), cast(doc_id % 3 as int) + 1) AS mime",
        "source",
        "cast(text AS binary) AS payload")
      .as[MediaRecord]
  }

  /** STUB decode: deterministic pseudo-features from an MD5 digest.
    * Replace the body with a real decoder (javacv/libvips/ffmpeg) —
    * the signature (one batch in, one batch out) is the contract. */
  def decodeStub(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
    batch.map { m =>
      val md = java.security.MessageDigest.getInstance("MD5").digest(m.payload)
      val digest = graft.sstable.CassType.hex(md)
      val width = 1 + ((md(0) & 0x7f) % 64)
      val height = 1 + ((md(1) & 0x7f) % 64)
      val channels = 1 + ((md(2) & 0x7f) % 3)
      val frames = if (m.kind == "video") 1 + ((md(3) & 0x7f) % 30) else 1
      val emb = Array.tabulate(8)(i => ((md(i * 2) & 0xff) - 128) / 128.0f)
      MediaFeatures(m.media_id, m.kind, m.payload.length.toLong, digest,
        width, height, channels, frames, emb)
    }

  /** Partition-parallel batched feature extraction — the batch shape
    * (`Iterator[Seq[T]] => Iterator[U]`) mirrors arrow-batch UDF
    * processing: bounded memory per batch, no per-row dispatch cost. */
  def extractFeatures(media: Dataset[MediaRecord], batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap(batch => decodeStub(batch))
    }
  }

  /** "Resize" transform stub: recompute features at a bounded target
    * size (real impl would transcode payloads; schema is identical). */
  def resize(features: Dataset[MediaFeatures], maxDim: Int): Dataset[MediaFeatures] = {
    val spark = features.sparkSession
    import spark.implicits._
    features.map { f =>
      val scale = math.min(1.0, maxDim.toDouble / math.max(f.width, f.height))
      f.copy(width = math.max(1, (f.width * scale).toInt),
        height = math.max(1, (f.height * scale).toInt))
    }
  }

  /** Frame sampling for video records: one output row per kept frame
    * (generator/flatMap shape), carrying the (possibly resized)
    * frame dimensions the downstream decode step would extract at. */
  def sampleFrames(features: Dataset[MediaFeatures], everyN: Int): DataFrame = {
    require(everyN >= 1, s"sampleFrames needs everyN >= 1, got $everyN")
    val spark = features.sparkSession
    import spark.implicits._
    features.filter(_.kind == "video").flatMap { f =>
      (0 until f.n_frames by everyN)
        .map(i => (f.media_id, i.toLong, f.digest, f.width.toLong, f.height.toLong))
    }.toDF("media_id", "frame_idx", "digest", "width", "height")
  }
}
