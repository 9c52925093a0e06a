package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  private val sfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("media table schema and batch feature extraction") {
    val media = Multimodal.mediaFromDocuments(Tables.documents(spark, sfDir))
    val feats = Multimodal.extractFeatures(media, batchSize = 16)
    val rows = feats.collect()
    assert(rows.length == media.count().toInt)
    assert(rows.forall(f => f.embedding.length == 8))
    assert(rows.forall(f => f.width >= 1 && f.width <= 64 && f.channels >= 1 && f.channels <= 3))
    assert(rows.filter(_.kind != "video").forall(_.n_frames == 1))
    // deterministic across runs
    val again = Multimodal.extractFeatures(media, batchSize = 5).collect()
    assert(rows.sortBy(_.media_id).map(_.digest).toSeq ==
      again.sortBy(_.media_id).map(_.digest).toSeq)
  }

  test("resize bounds dimensions; frame sampling explodes videos") {
    val media = Multimodal.mediaFromDocuments(Tables.documents(spark, sfDir))
    val feats = Multimodal.extractFeatures(media)
    val resized = Multimodal.resize(feats, 16).collect()
    assert(resized.forall(f => f.width <= 16 && f.height <= 16))
    val frames = Multimodal.sampleFrames(feats, everyN = 5)
    val perVideo = frames.groupBy("media_id").count().collect()
    assert(perVideo.nonEmpty)
    assert(perVideo.forall(_.getLong(1) >= 1))
  }
}
