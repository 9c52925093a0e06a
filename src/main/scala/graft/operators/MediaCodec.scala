package graft.operators

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Pure-JVM codecs for three PUBLIC, dependency-free media container
  * formats — the real (non-stub) decode layer behind
  * [[Multimodal]]:
  *
  *  - PPM "P6" binary images (Netpbm format: ASCII header
  *    `P6\n<w> <h>\n255\n` followed by w·h interleaved RGB bytes);
  *  - WAV PCM16 mono audio (RIFF container, canonical 44-byte
  *    header, little-endian 16-bit samples);
  *  - YUV4MPEG2 ("Y4M") 4:2:0 video (plain-text stream header, then
  *    `FRAME\n` + planar Y/U/V bytes per frame — the uncompressed
  *    interchange format of the mjpegtools family).
  *
  * All three are fully specified public formats parseable without
  * codec libraries, which is what makes a REAL decode possible in
  * this zero-egress build. Encoders exist so fixtures round-trip:
  * MultimodalSpec pins encode∘decode identity on hand-built bytes,
  * and the m03/m04 oracles replay the parsed dimensions and channel
  * statistics cell-exactly.
  *
  * Every parser validates magic bytes and length bounds and fails
  * with a diagnosable IllegalArgumentException — a truncated or
  * mislabeled payload in a 100 TB ingest must surface as a per-record
  * error the pipeline's corrupt-absorb policy can count, never as an
  * index-out-of-bounds three operators later.
  */
object MediaCodec {

  final case class PpmImage(width: Int, height: Int, rgb: Array[Byte])
  final case class WavAudio(sampleRate: Int, samples: Array[Short])
  /** 4:2:0 planar frames; only the luma (Y) planes carry per-frame
    * content here — chroma is parsed (and length-validated) but not
    * retained, matching what the feature extractors consume. */
  final case class Y4mVideo(width: Int, height: Int, lumaFrames: Array[Array[Byte]])

  private def fail(fmt: String, msg: String): Nothing =
    throw new IllegalArgumentException(s"MediaCodec/$fmt: $msg")

  // ------------------------------------------------------------- PPM (P6)

  def encodePpm(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(rgb.length == 3 * width * height,
      s"rgb length ${rgb.length} != 3*$width*$height")
    val header = s"P6\n$width $height\n255\n".getBytes(StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(rgb, 0, out, header.length, rgb.length)
    out
  }

  def decodePpm(bytes: Array[Byte]): PpmImage = {
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6')
      fail("ppm", "missing P6 magic")
    var pos = 2
    // header tokens are whitespace-separated ASCII integers; '#'
    // starts a comment running to end-of-line (part of the Netpbm
    // spec — a parser that can't skip comments isn't a PPM parser)
    def skipSpace(): Unit = {
      var in = true
      while (in && pos < bytes.length) {
        val b = bytes(pos)
        if (b == '#') { while (pos < bytes.length && bytes(pos) != '\n') pos += 1 }
        else if (b == ' ' || b == '\t' || b == '\r' || b == '\n') pos += 1
        else in = false
      }
    }
    def readInt(name: String): Int = {
      skipSpace()
      val start = pos
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') pos += 1
      if (pos == start) fail("ppm", s"missing $name in header")
      val s = new String(bytes, start, pos - start, StandardCharsets.US_ASCII)
      val v = java.lang.Long.parseLong(s)
      if (v <= 0 || v > Int.MaxValue) fail("ppm", s"$name $s out of range")
      v.toInt
    }
    val w = readInt("width")
    val h = readInt("height")
    val maxval = readInt("maxval")
    if (maxval != 255) fail("ppm", s"unsupported maxval $maxval (8-bit only)")
    // exactly ONE whitespace byte separates the header from the raster
    if (pos >= bytes.length) fail("ppm", "truncated before raster")
    val sep = bytes(pos)
    if (sep != ' ' && sep != '\t' && sep != '\r' && sep != '\n')
      fail("ppm", "missing raster separator")
    pos += 1
    val need = 3L * w * h
    if (bytes.length - pos < need)
      fail("ppm", s"raster truncated: need $need bytes, have ${bytes.length - pos}")
    val rgb = java.util.Arrays.copyOfRange(bytes, pos, pos + need.toInt)
    PpmImage(w, h, rgb)
  }

  // --------------------------------------------------- WAV (PCM16 mono)

  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0, s"bad sampleRate $sampleRate")
    val dataLen = 2 * samples.length
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes(StandardCharsets.US_ASCII))
    buf.putInt(36 + dataLen) // RIFF chunk size
    buf.put("WAVE".getBytes(StandardCharsets.US_ASCII))
    buf.put("fmt ".getBytes(StandardCharsets.US_ASCII))
    buf.putInt(16) // PCM fmt chunk size
    buf.putShort(1) // audio format: PCM
    buf.putShort(1) // channels: mono
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * 2) // byte rate
    buf.putShort(2) // block align
    buf.putShort(16) // bits per sample
    buf.put("data".getBytes(StandardCharsets.US_ASCII))
    buf.putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  def decodeWav(bytes: Array[Byte]): WavAudio = {
    if (bytes.length < 44) fail("wav", s"header truncated (${bytes.length} < 44 bytes)")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def ascii(n: Int): String = {
      val a = new Array[Byte](n); buf.get(a)
      new String(a, StandardCharsets.US_ASCII)
    }
    if (ascii(4) != "RIFF") fail("wav", "missing RIFF magic")
    buf.getInt // riff size (trust data chunk length instead)
    if (ascii(4) != "WAVE") fail("wav", "missing WAVE form type")
    if (ascii(4) != "fmt ") fail("wav", "missing fmt chunk")
    val fmtLen = buf.getInt
    if (fmtLen != 16) fail("wav", s"non-canonical fmt chunk length $fmtLen")
    val audioFormat = buf.getShort
    if (audioFormat != 1) fail("wav", s"unsupported audio format $audioFormat (PCM only)")
    val channels = buf.getShort
    if (channels != 1) fail("wav", s"unsupported channel count $channels (mono only)")
    val sampleRate = buf.getInt
    buf.getInt // byte rate
    buf.getShort // block align
    val bits = buf.getShort
    if (bits != 16) fail("wav", s"unsupported bit depth $bits (16-bit only)")
    if (ascii(4) != "data") fail("wav", "missing data chunk")
    val dataLen = buf.getInt
    if (dataLen < 0 || dataLen % 2 != 0) fail("wav", s"bad data chunk length $dataLen")
    if (bytes.length - 44 < dataLen)
      fail("wav", s"data truncated: need $dataLen bytes, have ${bytes.length - 44}")
    val samples = new Array[Short](dataLen / 2)
    var i = 0
    while (i < samples.length) { samples(i) = buf.getShort; i += 1 }
    WavAudio(sampleRate, samples)
  }

  // ------------------------------------------------- YUV4MPEG2 (4:2:0)

  private val Y4mMagic = "YUV4MPEG2"
  private val FrameMagic = "FRAME\n".getBytes(StandardCharsets.US_ASCII)

  def encodeY4m(width: Int, height: Int, lumaFrames: Array[Array[Byte]],
      chromaFill: Byte = 128.toByte): Array[Byte] = {
    require(width > 0 && width % 2 == 0 && height > 0 && height % 2 == 0,
      s"4:2:0 needs even dimensions, got ${width}x$height")
    lumaFrames.foreach(f => require(f.length == width * height,
      s"luma plane length ${f.length} != $width*$height"))
    val header =
      s"$Y4mMagic W$width H$height F25:1 Ip A1:1 C420jpeg\n"
        .getBytes(StandardCharsets.US_ASCII)
    val chromaLen = (width / 2) * (height / 2)
    val frameLen = FrameMagic.length + width * height + 2 * chromaLen
    val out = new Array[Byte](header.length + lumaFrames.length * frameLen)
    System.arraycopy(header, 0, out, 0, header.length)
    var pos = header.length
    lumaFrames.foreach { y =>
      System.arraycopy(FrameMagic, 0, out, pos, FrameMagic.length)
      pos += FrameMagic.length
      System.arraycopy(y, 0, out, pos, y.length)
      pos += y.length
      java.util.Arrays.fill(out, pos, pos + 2 * chromaLen, chromaFill)
      pos += 2 * chromaLen
    }
    out
  }

  def decodeY4m(bytes: Array[Byte]): Y4mVideo = {
    val headEnd = bytes.indexOf('\n'.toByte)
    if (headEnd < 0) fail("y4m", "missing stream-header newline")
    val header = new String(bytes, 0, headEnd, StandardCharsets.US_ASCII)
    val parts = header.split(' ')
    if (parts.isEmpty || parts(0) != Y4mMagic) fail("y4m", "missing YUV4MPEG2 magic")
    var w = -1
    var h = -1
    parts.iterator.drop(1).foreach { p =>
      if (p.startsWith("W")) w = p.drop(1).toInt
      else if (p.startsWith("H")) h = p.drop(1).toInt
      else if (p.startsWith("C") && p != "C420jpeg" && p != "C420mpeg2" && p != "C420")
        fail("y4m", s"unsupported colourspace $p (4:2:0 only)")
    }
    if (w <= 0 || h <= 0) fail("y4m", s"missing/invalid W/H in header '$header'")
    if (w % 2 != 0 || h % 2 != 0) fail("y4m", s"4:2:0 needs even dimensions, got ${w}x$h")
    // ALL size arithmetic in Long: a crafted header like W65536 H65536
    // overflows w*h to 0 (and the frame length to negative) in Int,
    // which would slide the cursor backwards past every bound check —
    // the fuzz spec pins this exact payload
    val lumaLen = w.toLong * h
    val frameLen = lumaLen + 2L * ((w / 2).toLong * (h / 2))
    val frames = Array.newBuilder[Array[Byte]]
    var pos = headEnd + 1
    while (pos < bytes.length) {
      if (pos + FrameMagic.length > bytes.length ||
          !java.util.Arrays.equals(
            java.util.Arrays.copyOfRange(bytes, pos, pos + FrameMagic.length), FrameMagic))
        fail("y4m", s"missing FRAME marker at offset $pos")
      pos += FrameMagic.length
      if (bytes.length - pos < frameLen)
        fail("y4m", s"frame truncated at offset $pos: need $frameLen bytes, " +
          s"have ${bytes.length - pos}")
      frames += java.util.Arrays.copyOfRange(bytes, pos, pos + lumaLen.toInt)
      pos += frameLen.toInt // chroma validated by the bound above, not retained
    }
    val fs = frames.result()
    if (fs.isEmpty) fail("y4m", "stream carries no frames")
    Y4mVideo(w, h, fs)
  }
}
