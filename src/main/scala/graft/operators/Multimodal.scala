package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}

/** Multimodal column processing (builder brief M5): image/audio/video
  * as opaque `binary` payload columns with typed metadata, decoded by
  * the REAL in-tree parsers in [[MediaCodec]] (PPM images, WAV PCM16
  * audio, YUV4MPEG2 video — public dependency-free formats, so the
  * decode is an actual parse, not a digest-derived stub).
  *
  * Dataflow shape (the part that must survive 100 TB): payloads stay
  * opaque bytes until a partition-parallel batched decode
  * ([[extractFeatures]] — the JVM analog of an arrow-batch
  * `mapInPandas` pass: bounded memory per batch, no per-row dispatch),
  * frame extraction is a generator (`flatMap`, one row per frame), and
  * the resample is a pure per-frame map. Format DISPATCH is by magic
  * bytes, not by the declared mime — ingest must trust content, not
  * labels.
  *
  * The fixture corpus manufactures real encoded bytes deterministically
  * from each media_id (dimensions, sample counts and pixel/sample
  * values are fixed arithmetic in the id), so the m03/m04 DuckDB
  * oracles replay the decoded dimensions and channel statistics
  * cell-exactly while MultimodalSpec pins encode∘decode identity on
  * hand-built payloads.
  */
object Multimodal {

  final case class MediaRecord(
      media_id: Long,
      kind: String, // image | audio | video
      mime: String,
      source: String,
      payload: Array[Byte])

  /** One decoded record: real parsed dimensions/counts plus exact
    * integer channel statistics.
    *  - image: width/height/channels from the PPM header,
    *    content_sum = sum of all RGB bytes (unsigned);
    *  - audio: sample_rate/n_samples from the WAV header,
    *    content_sum = sum of unsigned 16-bit sample words;
    *  - video: width/height/n_frames from the Y4M stream,
    *    content_sum = frame 0's luma-byte sum, frame_sums = per-frame
    *    luma sums (what frame sampling consumes).
    * The embedding is the content-derived dyadic quantization
    * ((content_sum + i) % 256 - 128) / 128 — exactly representable in
    * FLOAT, so oracles compare the integer quantization. */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      channels: Int,
      n_frames: Int,
      sample_rate: Int,
      content_sum: Long,
      frame_sums: Array[Long],
      embedding: Array[Float])

  /** One video frame's luma plane — the per-frame payload the
    * resample/sample stages transform. */
  final case class MediaFrame(
      media_id: Long,
      frame_idx: Int,
      width: Int,
      height: Int,
      luma: Array[Byte])

  // ------------------------------------------------ fixture generation
  // Deterministic per-id media parameters, shared verbatim by the
  // DuckDB oracles. All derived values are small enough that even the
  // sf0.1 corpus encodes in a few MB per partition.

  private[operators] def imageDims(id: Long): (Int, Int) =
    (4 + (id % 29).toInt, 4 + (id % 23).toInt)
  private[operators] def audioSamples(id: Long): Int = 16 + (id % 240).toInt
  private[operators] def videoDims(id: Long): (Int, Int) =
    (2 * (2 + (id % 14).toInt), 2 * (2 + (id % 10).toInt))
  private[operators] def videoFrames(id: Long): Int = 1 + (id % 27).toInt

  val AudioSampleRate = 8000

  private[operators] def buildPayload(id: Long): (String, String, Array[Byte]) =
    (id % 3) match {
      case 0 =>
        val (w, h) = imageDims(id)
        val rgb = Array.tabulate(3 * w * h)(i => ((id * 31 + i * 7) % 256).toByte)
        ("image", "image/x-portable-pixmap", MediaCodec.encodePpm(w, h, rgb))
      case 1 =>
        val n = audioSamples(id)
        // raw unsigned words (id*131 + i*17) % 65536, stored as the
        // usual signed LE PCM16 — the unsigned word sum is the
        // deterministic channel statistic
        val samples = Array.tabulate(n)(i => ((id * 131 + i * 17) % 65536).toShort)
        ("audio", "audio/vnd.wave", MediaCodec.encodeWav(AudioSampleRate, samples))
      case _ =>
        val (w, h) = videoDims(id)
        val nf = videoFrames(id)
        val frames = Array.tabulate(nf)(f =>
          Array.tabulate(w * h)(j => ((id * 17 + f * 11 + j * 5) % 256).toByte))
        ("video", "video/x-yuv4mpeg2", MediaCodec.encodeY4m(w, h, frames))
    }

  /** Manufacture the deterministic media table: one real encoded
    * payload per document id (PPM / WAV / Y4M round-robin by id). */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.selectExpr("doc_id", "source").as[(Long, String)].map { case (id, src) =>
      val (kind, mime, payload) = buildPayload(id)
      MediaRecord(id, kind, mime, src, payload)
    }
  }

  private def sumUnsigned(bytes: Array[Byte]): Long = {
    var s = 0L
    var i = 0
    while (i < bytes.length) { s += bytes(i) & 0xff; i += 1 }
    s
  }

  private def embedding(contentSum: Long): Array[Float] =
    Array.tabulate(8)(i => (((contentSum + i) % 256) - 128) / 128.0f)

  /** REAL single-record decode: dispatch on magic bytes, parse with
    * [[MediaCodec]], emit parsed dimensions + exact channel sums.
    * Every failure (unrecognized container included) is an
    * IllegalArgumentException — the exception class the absorb path's
    * corrupt policy catches. */
  def decodeOne(m: MediaRecord): MediaFeatures = {
    val p = m.payload
    def magic(n: Int): String =
      new String(p, 0, math.min(n, p.length), java.nio.charset.StandardCharsets.US_ASCII)
    if (magic(2) == "P6") {
      val img = MediaCodec.decodePpm(p)
      val s = sumUnsigned(img.rgb)
      MediaFeatures(m.media_id, "image", p.length.toLong, img.width, img.height,
        3, 1, 0, s, Array(s), embedding(s))
    } else if (magic(4) == "RIFF") {
      val wav = MediaCodec.decodeWav(p)
      var s = 0L
      wav.samples.foreach(x => s += x & 0xffff)
      MediaFeatures(m.media_id, "audio", p.length.toLong, 0, 0, 1, 1,
        wav.sampleRate, s, Array(s), embedding(s))
    } else if (magic(9) == "YUV4MPEG2") {
      val vid = MediaCodec.decodeY4m(p)
      val sums = vid.lumaFrames.map(sumUnsigned)
      MediaFeatures(m.media_id, "video", p.length.toLong, vid.width, vid.height,
        3, vid.lumaFrames.length, 0, sums(0), sums, embedding(sums(0)))
    } else throw new IllegalArgumentException(
      s"media ${m.media_id}: unrecognized container (magic ${magic(9)})")
  }

  /** Batch decode — the batch signature (one Seq in, one Seq out) is
    * the swap-in contract for any other decoder. Strict: the first
    * corrupt payload fails the batch (and the job). */
  def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
    batch.map(decodeOne)

  /** Partition-parallel batched feature extraction — the batch shape
    * (`Iterator[Seq[T]] => Iterator[U]`) mirrors arrow-batch UDF
    * processing: bounded memory per batch, no per-row dispatch cost.
    * Strict: any corrupt payload fails the job. */
  def extractFeatures(media: Dataset[MediaRecord], batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap(batch => decodeBatch(batch))
    }
  }

  /** Corrupt-ABSORB feature extraction — the S7 skipCorrupt policy
    * applied to media ingest: a payload that fails to parse
    * (IllegalArgumentException, the only failure class the codecs are
    * allowed — MediaCodecFuzzSpec) is counted on the returned
    * accumulator and dropped, instead of killing a 100 TB decode job
    * three days in. Anything NOT an IAE still fails the job: absorb
    * is for bad DATA, not for bugs. The accumulator is registered
    * per call, so concurrent absorb scans don't share counts; read it
    * only after an action has materialized the result. */
  def extractFeaturesAbsorb(media: Dataset[MediaRecord], batchSize: Int = 64)
      : (Dataset[MediaFeatures], org.apache.spark.util.LongAccumulator) = {
    val spark = media.sparkSession
    import spark.implicits._
    val acc = spark.sparkContext.longAccumulator("media.corruptPayloads")
    val out = media.mapPartitions { it =>
      it.grouped(batchSize).flatMap(_.flatMap { m =>
        try Some(decodeOne(m))
        catch { case _: IllegalArgumentException => acc.add(1L); None }
      })
    }
    (out, acc)
  }

  /** Per-record silence-trim summary (see [[trimSilence]]). */
  final case class AudioTrim(media_id: Long, n_frames: Long, lead_silent: Long,
      tail_silent: Long, kept_frames: Long)

  /** Audio silence trimming over REAL WAV payloads: split each
    * clip's PCM into `frameSamples`-sample frames (a trailing partial
    * frame is ignored), call a frame silent when its mean |sample|
    * (exact integer floor) is below `thresholdMeanAbs`, and report how
    * many LEADING and TRAILING silent frames a trimmer would cut —
    * interior silent frames are kept (trimming is lead/tail only, the
    * standard preprocessing semantics). An entirely silent clip
    * reports lead_silent = n_frames, tail_silent = 0, kept = 0.
    *
    * Map-only (one decode + one integer pass per record, bounded by
    * clip length); exact integer arithmetic end to end, so the result
    * hash-compares against an oracle that recomputes the frame
    * profile analytically. */
  def trimSilence(media: Dataset[MediaRecord], frameSamples: Int,
      thresholdMeanAbs: Long): Dataset[AudioTrim] = {
    require(frameSamples >= 1, s"frameSamples must be >= 1, got $frameSamples")
    require(thresholdMeanAbs >= 0, s"thresholdMeanAbs must be >= 0, got $thresholdMeanAbs")
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "audio").map { m =>
      val wav = MediaCodec.decodeWav(m.payload)
      val nF = wav.samples.length / frameSamples
      var firstLoud = -1
      var lastLoud = -1
      var f = 0
      while (f < nF) {
        var s = 0L
        var j = f * frameSamples
        val end = j + frameSamples
        while (j < end) { s += math.abs(wav.samples(j).toInt); j += 1 }
        if (s / frameSamples >= thresholdMeanAbs) {
          if (firstLoud < 0) firstLoud = f
          lastLoud = f
        }
        f += 1
      }
      if (firstLoud < 0) AudioTrim(m.media_id, nF, nF, 0, 0)
      else AudioTrim(m.media_id, nF, firstLoud, nF - 1 - lastLoud,
        lastLoud - firstLoud + 1)
    }
  }

  final case class AudioFrameEnergy(media_id: Long, frame_idx: Long,
      energy: Long, mean_abs: Long)

  final case class AudioClipAudit(media_id: Long, n_samples: Long,
      n_clipped: Long, clip_micro: Long, dc_offset: Long)

  final case class AudioZcr(media_id: Long, n_samples: Long,
      n_crossings: Long, zcr_micro: Long)

  final case class AudioQuietRuns(media_id: Long, n_samples: Long,
      n_quiet: Long, n_runs: Long, max_run: Long)

  final case class ImageGradientEnergy(media_id: Long, width: Long,
      height: Long, grad_r: Long, grad_g: Long, grad_b: Long)

  final case class ImageChannelStats(media_id: Long, width: Long, height: Long,
      r_mean: Long, g_mean: Long, b_mean: Long,
      h0: Long, h1: Long, h2: Long, h3: Long)

  /** Per-channel means + a 4-bucket intensity histogram over REAL
    * PPM payloads — the white-balance / exposure sanity audit an
    * image-ingest pipeline gates on (a channel mean pinned at the
    * rails or a histogram massed in one bucket flags synthetic or
    * clipped frames). Channel means are floored over the pixel
    * count; histogram buckets are `byte div 64` over ALL channel
    * bytes. One decode + one integer pass per record; map-only,
    * never shuffles. */
  def channelStats(media: Dataset[MediaRecord]): Dataset[ImageChannelStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "image").map { m =>
      val img = MediaCodec.decodePpm(m.payload)
      val sums = new Array[Long](3)
      val hist = new Array[Long](4)
      var i = 0
      val b = img.rgb
      while (i < b.length) {
        val v = b(i) & 0xff
        sums(i % 3) += v
        hist(v / 64) += 1
        i += 1
      }
      val nPix = (img.width.toLong * img.height).max(1L)
      ImageChannelStats(m.media_id, img.width.toLong, img.height.toLong,
        sums(0) / nPix, sums(1) / nPix, sums(2) / nPix,
        hist(0), hist(1), hist(2), hist(3))
    }
  }

  /** Horizontal gradient energy over REAL PPM payloads: per channel
    * the sum of `|v(x+1, y) − v(x, y)|` across each row — the cheap
    * sharpness/texture statistic (near-zero = flat or blurred,
    * high = detail or noise) an image-ingest pipeline thresholds
    * before spending decode-heavy featurizers. One decode + one
    * integer pass per record; map-only, never shuffles. */
  def gradientEnergy(media: Dataset[MediaRecord]): Dataset[ImageGradientEnergy] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "image").map { m =>
      val img = MediaCodec.decodePpm(m.payload)
      val g = new Array[Long](3)
      val b = img.rgb
      val w = img.width
      var p = 0
      val nPix = w * img.height
      while (p < nPix) {
        if (p % w < w - 1) {
          var ch = 0
          while (ch < 3) {
            g(ch) += math.abs((b((p + 1) * 3 + ch) & 0xff) - (b(p * 3 + ch) & 0xff))
            ch += 1
          }
        }
        p += 1
      }
      ImageGradientEnergy(m.media_id, w.toLong, img.height.toLong,
        g(0), g(1), g(2))
    }
  }

  /** Zero-crossing rate over REAL WAV payloads — the classic cheap
    * voiced/unvoiced + noisiness discriminator (high ZCR ≈ fricatives
    * or hiss, low ≈ tonal/voiced content). A crossing is a STRICT
    * sign flip between adjacent samples (`s[i−1]·s[i] < 0`): exact
    * zeros break a run and count at neither adjacency, so the
    * definition needs no zero-side convention and the `Short×Short`
    * product can never overflow an Int. `zcr_micro` is crossings per
    * adjacent pair, floored micro-units. One decode + one integer
    * pass per record; map-only, never shuffles. */
  def zeroCrossingAudit(media: Dataset[MediaRecord]): Dataset[AudioZcr] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "audio").map { m =>
      val s = MediaCodec.decodeWav(m.payload).samples
      var cross = 0L
      var i = 1
      while (i < s.length) {
        if (s(i - 1).toInt * s(i).toInt < 0) cross += 1
        i += 1
      }
      val n = s.length.toLong
      AudioZcr(m.media_id, n, cross,
        if (n < 2) 0L else cross * 1000000L / (n - 1))
    }
  }

  /** Quiet-run profile over REAL WAV payloads: maximal runs of
    * consecutive samples with `|v| < threshold` — the
    * silence-segmentation statistic (how many pauses, how long the
    * longest) a speech-data pipeline reads before deciding chunk
    * boundaries. One decode + one integer pass per record; map-only,
    * never shuffles. */
  def quietRunAudit(media: Dataset[MediaRecord], threshold: Int): Dataset[AudioQuietRuns] = {
    require(threshold >= 1, s"threshold must be >= 1, got $threshold")
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "audio").map { m =>
      val s = MediaCodec.decodeWav(m.payload).samples
      var quiet = 0L; var runs = 0L; var maxRun = 0L; var cur = 0L
      var i = 0
      while (i < s.length) {
        if (math.abs(s(i).toInt) < threshold) {
          quiet += 1; cur += 1
          if (cur == 1L) runs += 1
          if (cur > maxRun) maxRun = cur
        } else cur = 0L
        i += 1
      }
      AudioQuietRuns(m.media_id, s.length.toLong, quiet, runs, maxRun)
    }
  }

  /** Clipping / DC-offset audit over REAL WAV payloads — the two
    * recording-quality defects an audio-ingest pipeline gates on:
    * samples at-or-beyond the clip threshold (rail hits from
    * over-gain) and a non-zero mean (DC bias that wastes headroom
    * and breaks energy thresholds). One decode + one integer pass
    * per record, exact integer outputs (`div` truncation matches the
    * oracle's `//` — toward zero on both engines, which matters for
    * the signed dc_offset). Map-only; never shuffles. */
  def clippingAudit(media: Dataset[MediaRecord], clipThreshold: Int): Dataset[AudioClipAudit] = {
    require(clipThreshold >= 1, s"clipThreshold must be >= 1, got $clipThreshold")
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "audio").map { m =>
      val wav = MediaCodec.decodeWav(m.payload)
      var n = 0L; var clip = 0L; var s = 0L
      wav.samples.foreach { x =>
        val v = x.toInt
        n += 1; s += v
        if (math.abs(v) >= clipThreshold) clip += 1
      }
      AudioClipAudit(m.media_id, n, clip,
        if (n == 0) 0L else clip * 1000000L / n,
        if (n == 0) 0L else s / n)
    }
  }

  /** Per-frame audio loudness over REAL WAV payloads: split each
    * clip's PCM into `frameSamples`-sample frames (trailing partial
    * frame ignored, the [[trimSilence]] framing) and emit one row per
    * frame with the exact integer energy (`Σ s² div n`) and mean
    * absolute amplitude (`Σ |s| div n`) — the loudness profile a
    * speech/music pipeline gates and windows on. Generator shape:
    * one decode + one integer pass per record, output rows bounded by
    * clip length; everything hash-compares against an analytic
    * oracle. */
  def frameEnergies(media: Dataset[MediaRecord],
      frameSamples: Int): Dataset[AudioFrameEnergy] = {
    require(frameSamples >= 1, s"frameSamples must be >= 1, got $frameSamples")
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "audio").flatMap { m =>
      val wav = MediaCodec.decodeWav(m.payload)
      val nF = wav.samples.length / frameSamples
      (0 until nF).map { f =>
        var sq = 0L
        var ab = 0L
        var j = f * frameSamples
        val end = j + frameSamples
        while (j < end) {
          val v = wav.samples(j).toLong
          sq += v * v
          ab += math.abs(v)
          j += 1
        }
        AudioFrameEnergy(m.media_id, f.toLong, sq / frameSamples, ab / frameSamples)
      }
    }
  }

  /** Video frame extraction: parse each Y4M payload and emit one row
    * per frame (generator shape) carrying the REAL luma plane. */
  def decodeVideoFrames(media: Dataset[MediaRecord]): Dataset[MediaFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      val vid = MediaCodec.decodeY4m(m.payload)
      vid.lumaFrames.iterator.zipWithIndex.map { case (y, f) =>
        MediaFrame(m.media_id, f, vid.width, vid.height, y)
      }
    }
  }

  /** REAL nearest-neighbor resample of each frame's luma plane to fit
    * `maxDim` (downscale only; already-small frames pass through).
    * dst(x, y) = src(x*sw div dw, y*sh div dh) — integer source
    * indexing, so the DuckDB oracle replays every output pixel (and
    * therefore the channel sums) exactly. Pure map, zero shuffle. */
  def resizeFrames(frames: Dataset[MediaFrame], maxDim: Int): Dataset[MediaFrame] = {
    require(maxDim >= 1, s"resizeFrames needs maxDim >= 1, got $maxDim")
    val spark = frames.sparkSession
    import spark.implicits._
    frames.map { fr =>
      val scale = math.min(1.0, maxDim.toDouble / math.max(fr.width, fr.height))
      val dw = math.max(1, math.floor(fr.width * scale).toInt)
      val dh = math.max(1, math.floor(fr.height * scale).toInt)
      if (dw == fr.width && dh == fr.height) fr
      else {
        val out = new Array[Byte](dw * dh)
        var y = 0
        while (y < dh) {
          val sy = y * fr.height / dh
          var x = 0
          while (x < dw) {
            out(y * dw + x) = fr.luma(sy * fr.width + x * fr.width / dw)
            x += 1
          }
          y += 1
        }
        MediaFrame(fr.media_id, fr.frame_idx, dw, dh, out)
      }
    }
  }

  /** Keep every `everyN`-th frame (stride sampling). Run BEFORE
    * [[resizeFrames]] — resampling a frame the stride then discards
    * is pure waste, and at video scale the stride drops most rows. */
  def sampleEveryNth(frames: Dataset[MediaFrame], everyN: Int): Dataset[MediaFrame] = {
    require(everyN >= 1, s"sampleEveryNth needs everyN >= 1, got $everyN")
    frames.filter(fr => fr.frame_idx % everyN == 0)
  }

  /** Perceptual image hash (the classic average-hash / aHash, public
    * method) over the REAL PPM decode: integer luma
    * `(299·R + 587·G + 114·B) div 1000` sampled on an 8×8
    * nearest-neighbor grid (`sx = x·w div 8` — the m04 resize index
    * arithmetic), thresholded STRICTLY above the floor mean, packed
    * into two 32-bit halves (hash_hi/hash_lo — never a sign-bit-
    * ambiguous single 64-bit shift). All integer arithmetic, so the
    * oracle replays every sampled pixel.
    *
    * 100 TB shape: pure per-record map (decode + 64 samples), zero
    * shuffle — the hash column is what an image-dedup pass would then
    * group or band exactly like [[Dedup]]'s text hashes. */
  def imageAHash(media: Dataset[MediaRecord]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "image").map { m =>
      val img = MediaCodec.decodePpm(m.payload)
      val luma = Array.tabulate(64) { b =>
        val sx = (b % 8) * img.width / 8
        val sy = (b / 8) * img.height / 8
        val p = (sy * img.width + sx) * 3
        (299 * (img.rgb(p) & 0xff) + 587 * (img.rgb(p + 1) & 0xff) +
          114 * (img.rgb(p + 2) & 0xff)) / 1000
      }
      val mean = luma.sum / 64
      var hi = 0L
      var lo = 0L
      var b = 0
      while (b < 64) {
        if (luma(b) > mean) {
          if (b < 32) lo |= 1L << b else hi |= 1L << (b - 32)
        }
        b += 1
      }
      (m.media_id, img.width.toLong, img.height.toLong, mean.toLong, hi, lo)
    }.toDF("media_id", "width", "height", "mean_luma", "hash_hi", "hash_lo")
  }

  /** Banded near-duplicate pairs over 64-bit perceptual hashes (the
    * [[imageAHash]] output): the hash splits into four 16-bit bands,
    * candidates meet through a (band index, band value) equi-join,
    * and every candidate is verified by the EXACT Hamming distance
    * (`bit_count(xor)` on both 32-bit halves) and carries the
    * `is_neardup` verdict (hamming <= `maxHamming`) — callers filter
    * on the verdict; the full candidate table is the dedup evidence.
    * Pigeonhole guarantee:
    * any pair within `maxHamming <= 3` differs in at most 3 bits, so
    * at least one of the 4 bands is untouched and the pair is
    * ALWAYS a candidate — banding here is exact-recall, not
    * probabilistic. The image-dedup face of the d03 signature
    * discipline.
    *
    * 100 TB shape: one band explode (4 rows per image), a band-keyed
    * self equi-join (fan-out bounded per band bucket by how many
    * images share 16 exact bits — the d03 bucket argument), a
    * distinct pair projection, and an O(1)-per-row Hamming verify.
    * No N² anywhere; hash tables this narrow broadcast or bucket
    * cleanly. */
  def aHashNearDupPairs(hashes: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"the 4-band pigeonhole guarantee holds only for maxHamming <= 3, " +
        s"got $maxHamming")
    val bands = hashes
      .selectExpr("media_id", "hash_hi", "hash_lo",
        "explode(array(" +
          "named_struct('bi', 0L, 'bv', hash_lo % 65536L), " +
          "named_struct('bi', 1L, 'bv', hash_lo div 65536L), " +
          "named_struct('bi', 2L, 'bv', hash_hi % 65536L), " +
          "named_struct('bi', 3L, 'bv', hash_hi div 65536L))) AS band")
      .selectExpr("media_id", "hash_hi", "hash_lo",
        "band.bi AS bi", "band.bv AS bv")
    import org.apache.spark.sql.functions.col
    bands.as("a").join(bands.as("b"),
        col("a.bi") === col("b.bi") && col("a.bv") === col("b.bv") &&
          col("a.media_id") < col("b.media_id"))
      .selectExpr("a.media_id AS m1", "b.media_id AS m2",
        "a.hash_hi AS h1_hi", "a.hash_lo AS h1_lo",
        "b.hash_hi AS h2_hi", "b.hash_lo AS h2_lo")
      .distinct()
      .selectExpr("m1", "m2",
        "cast(bit_count(h1_hi ^ h2_hi) + bit_count(h1_lo ^ h2_lo) as bigint)" +
          " AS hamming")
      .selectExpr("m1", "m2", "hamming",
        s"hamming <= $maxHamming AS is_neardup")
      .orderBy(col("m1"), col("m2"))
  }

  /** Scene-change (keyframe) detection over decoded video frames: per
    * frame the EXACT sum of absolute luma differences vs the previous
    * frame, the mean abs diff in micro units (`diff · 1e6 div pixels`),
    * and the keyframe verdict — frame 0 of every video, or
    * `mad_micro > threshMicro`. All integer arithmetic.
    *
    * 100 TB shape: consecutive frames pair by ONE
    * (media_id, frame_idx)-keyed equi-join (frame f against f−1) —
    * never a per-video sort or a whole-video group buffer; the pixel
    * diff is a typed map over the joined pair (the codec layer's
    * Dataset discipline), O(pixels) per row. */
  def keyframes(frames: Dataset[MediaFrame], threshMicro: Long): DataFrame = {
    require(threshMicro >= 0L, s"threshMicro must be >= 0, got $threshMicro")
    val spark = frames.sparkSession
    import spark.implicits._
    val cur = frames
      .map(f => (f.media_id, f.frame_idx, f.width.toLong * f.height, f.luma))
      .toDF("media_id", "frame_idx", "np", "luma")
    val prev = frames
      .map(f => (f.media_id, f.frame_idx + 1, f.luma))
      .toDF("media_id", "frame_idx", "prev_luma")
    cur.join(prev, Seq("media_id", "frame_idx"), "left")
      .as[(Long, Int, Long, Array[Byte], Array[Byte])]
      .map { case (mid, f, np, luma, prevLuma) =>
        val diff =
          if (prevLuma == null) None
          else {
            var s = 0L
            var i = 0
            val n = math.min(luma.length, prevLuma.length)
            while (i < n) { s += math.abs((luma(i) & 0xff) - (prevLuma(i) & 0xff)); i += 1 }
            Some(s)
          }
        val mad = diff.map(d => d * 1000000L / np)
        (mid, f.toLong, diff, mad, diff.isEmpty || mad.exists(_ > threshMicro))
      }
      .toDF("media_id", "frame_idx", "diff_sum", "mad_micro", "is_key")
  }

  /** Reduce each frame's luma plane to its exact unsigned byte sum —
    * the hash-checkable channel statistic. Pure map, zero shuffle. */
  def frameSums(frames: Dataset[MediaFrame]): DataFrame = {
    val spark = frames.sparkSession
    import spark.implicits._
    frames.map(fr => (fr.media_id, fr.frame_idx.toLong, fr.width.toLong, fr.height.toLong,
        sumUnsigned(fr.luma)))
      .toDF("media_id", "frame_idx", "width", "height", "luma_sum")
  }
}
