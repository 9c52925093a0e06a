package graft.sstable

import java.io.{DataInputStream, EOFException, InputStream}

/** CompressionInfo.db sidecar: compressor name, options, chunk length,
  * uncompressed data length, per-chunk compressed lengths (derived
  * from chunk offsets and total compressed size). Reference:
  * `io/sstable/compression/CompressionMetadata.java:37-65,94-107`. */
final case class CompressionMeta(
    compressorName: String,
    chunkLength: Int,
    dataLength: Long,
    chunkCompressedLengths: Array[Int],
    chunkOffsets: Array[Long])

object CompressionMeta {
  def read(in: InputStream, compressedFileLength: Long): CompressionMeta = {
    val d = new DataInputStream(in)
    try {
      val name = d.readUTF()
      val optionCount = d.readInt()
      var i = 0
      while (i < optionCount) { d.readUTF(); d.readUTF(); i += 1 }
      val chunkLength = d.readInt()
      val dataLength = d.readLong()
      val chunkCount = d.readInt()
      val lengths = new Array[Int](chunkCount)
      val offsets = new Array[Long](chunkCount)
      if (chunkCount > 0) {
        var prev = d.readLong()
        offsets(0) = prev
        var j = 1
        while (j < chunkCount) {
          val cur = d.readLong()
          offsets(j) = cur
          lengths(j - 1) = (cur - prev - 4).toInt // 4-byte checksum trails each chunk
          prev = cur
          j += 1
        }
        lengths(chunkCount - 1) = (compressedFileLength - prev - 4).toInt
      }
      CompressionMeta(name, chunkLength, dataLength, lengths, offsets)
    } finally d.close()
  }
}

/** Write-side inverse of [[CompressionInputStream]]: buffers
  * `chunkLength` uncompressed bytes, emits each chunk in Cassandra's
  * per-codec layout — LZ4 `[i32 LE decompressed len][lz4 block]`,
  * Snappy/Deflate the bare compressed block — followed by the adler32
  * of the chunk payload, and records the chunk offsets for the
  * CompressionInfo.db sidecar. Call [[finish]] (not just close) to
  * flush the tail chunk and collect the metadata. */
final class CompressionOutputStream(out: java.io.OutputStream, chunkLength: Int = 65536,
    codec: String = "LZ4Compressor")
    extends java.io.OutputStream {
  // >= 64: guarantees header + worst-case LZ4 expansion fits in the
  // reader's chunkLength*2 buffers even for incompressible chunks
  require(chunkLength >= 64 && (chunkLength & (chunkLength - 1)) == 0,
    s"chunkLength must be a power of two >= 64, got $chunkLength")

  private lazy val compressor = net.jpountz.lz4.LZ4Factory.fastestInstance().fastCompressor()
  private val buf = new Array[Byte](chunkLength)
  private var filled = 0
  private var written = 0L // compressed-file position
  private var total = 0L // uncompressed bytes
  private val offsets = scala.collection.mutable.ArrayBuffer[Long]()

  override def write(b: Int): Unit = {
    buf(filled) = b.toByte
    filled += 1
    total += 1
    if (filled == chunkLength) flushChunk()
  }

  override def write(b: Array[Byte], off: Int, len: Int): Unit = {
    var o = off
    var left = len
    while (left > 0) {
      val n = math.min(left, chunkLength - filled)
      System.arraycopy(b, o, buf, filled, n)
      filled += n; o += n; left -= n; total += n
      if (filled == chunkLength) flushChunk()
    }
  }

  private val adler = new java.util.zip.Adler32()
  private val header = new Array[Byte](4)

  private def flushChunk(): Unit = {
    if (filled == 0) return
    offsets += written
    val payload: Array[Byte] = codec match {
      case c if c.contains("Snappy") =>
        val dst = new Array[Byte](org.xerial.snappy.Snappy.maxCompressedLength(filled))
        val n = org.xerial.snappy.Snappy.compress(buf, 0, filled, dst, 0)
        java.util.Arrays.copyOf(dst, n)
      case c if c.contains("Deflate") =>
        val d = new java.util.zip.Deflater()
        d.setInput(buf, 0, filled)
        d.finish()
        val bos = new java.io.ByteArrayOutputStream(filled / 2 + 64)
        val tmp = new Array[Byte](8192)
        while (!d.finished()) bos.write(tmp, 0, d.deflate(tmp))
        d.end()
        bos.toByteArray
      case c if c.contains("LZ4") =>
        val block = compressor.compress(buf, 0, filled)
        header(0) = filled.toByte
        header(1) = (filled >>> 8).toByte
        header(2) = (filled >>> 16).toByte
        header(3) = (filled >>> 24).toByte
        val p = new Array[Byte](4 + block.length)
        System.arraycopy(header, 0, p, 0, 4)
        System.arraycopy(block, 0, p, 4, block.length)
        p
      case other => throw new IllegalArgumentException(s"unsupported write codec: $other")
    }
    out.write(payload)
    adler.reset()
    adler.update(payload)
    val ck = adler.getValue.toInt
    out.write(Array((ck >>> 24).toByte, (ck >>> 16).toByte, (ck >>> 8).toByte, ck.toByte))
    written += payload.length.toLong + 4
    filled = 0
  }

  /** flush the tail chunk; returns (uncompressedLength, chunkOffsets). */
  def finish(): (Long, Seq[Long]) = {
    flushChunk()
    out.flush()
    (total, offsets.toSeq)
  }

  override def close(): Unit = { finish(); out.close() }
}

object CompressionOutputStream {
  /** Serialize a CompressionInfo.db sidecar (inverse of
    * [[CompressionMeta.read]]). */
  def writeCompressionInfo(
      out: java.io.DataOutputStream,
      compressorName: String,
      chunkLength: Int,
      dataLength: Long,
      offsets: Seq[Long]): Unit = {
    out.writeUTF(compressorName)
    out.writeInt(0) // no options
    out.writeInt(chunkLength)
    out.writeLong(dataLength)
    out.writeInt(offsets.size)
    offsets.foreach(out.writeLong)
  }
}

/** Chunk-at-a-time decompressing stream over a compressed Data.db
  * (reference `io/sstable/compression/CompressionInputStream.java`).
  * Supports the three pre-3.0 Cassandra table compressors; the 4-byte
  * per-chunk checksum is read and ignored, like the reference. */
final class CompressionInputStream(in: InputStream, meta: CompressionMeta, startChunk: Int = 0)
    extends InputStream {

  private val input = new Array[Byte](meta.chunkLength * 2)
  private val buffer = new Array[Byte](meta.chunkLength * 2)
  private var position = 0
  private var valid = 0
  private var chunk = startChunk

  private val decompress: (Array[Byte], Int, Array[Byte]) => Int =
    meta.compressorName match {
      case n if n.contains("Snappy") =>
        (src, len, dst) => org.xerial.snappy.Snappy.uncompress(src, 0, len, dst, 0)
      case n if n.contains("LZ4") =>
        // Cassandra LZ4 chunk = [i32 LE decompressed length][lz4 block]
        val dec = net.jpountz.lz4.LZ4Factory.fastestInstance().fastDecompressor()
        (src, len, dst) => {
          val dLen = (src(0) & 0xff) | ((src(1) & 0xff) << 8) |
            ((src(2) & 0xff) << 16) | ((src(3) & 0xff) << 24)
          dec.decompress(src, 4, dst, 0, dLen)
          dLen
        }
      case n if n.contains("Deflate") =>
        (src, len, dst) => {
          val inf = new java.util.zip.Inflater()
          inf.setInput(src, 0, len)
          val n = inf.inflate(dst)
          inf.end()
          n
        }
      case other => throw new java.io.IOException(s"Unsupported sstable compressor: $other")
    }

  override def available(): Int = {
    if (valid > position) return valid - position
    if (chunk >= meta.chunkCompressedLengths.length) return 0
    val compLen = meta.chunkCompressedLengths(chunk)
    readFully(input, compLen)
    skipChecksum()
    valid = decompress(input, compLen, buffer)
    position = 0
    chunk += 1
    valid
  }

  override def read(): Int =
    if (available() <= 0) -1 else { val b = buffer(position) & 0xff; position += 1; b }

  override def read(out: Array[Byte], off: Int, len: Int): Int = {
    if (len == 0) return 0
    if (available() <= 0) return -1
    val n = math.min(len, valid - position)
    System.arraycopy(buffer, position, out, off, n)
    position += n
    n
  }

  override def close(): Unit = in.close()

  private def readFully(dst: Array[Byte], len: Int): Unit = {
    var off = 0
    while (off < len) {
      val n = in.read(dst, off, len - off)
      if (n == -1) throw new EOFException("EOF inside compressed chunk")
      off += n
    }
  }

  private def skipChecksum(): Unit = {
    var left = 4
    val tmp = new Array[Byte](4)
    while (left > 0) {
      val n = in.read(tmp, 4 - left, left)
      if (n == -1) throw new EOFException("EOF inside chunk checksum")
      left -= n
    }
  }
}
