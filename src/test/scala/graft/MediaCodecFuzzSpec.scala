package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.MediaCodec

/** Robustness fuzz for the three real media parsers — the
  * CompressionFuzzSpec discipline applied to [[MediaCodec]]. The
  * class contract is "a truncated or mislabeled payload must surface
  * as a diagnosable IllegalArgumentException, never as an
  * index-out-of-bounds three operators later"; these tests
  * machine-check that contract under inputs the hand-built
  * MultimodalSpec fixtures don't reach:
  *
  *  - arbitrary random garbage (seeded, many shapes);
  *  - every truncation prefix of a valid payload;
  *  - single-byte mutations of valid payloads;
  *  - adversarial headers that declare huge or overflowing sizes (a
  *    50-byte payload must not be able to provoke a multi-GB
  *    allocation in a 100 TB ingest).
  */
class MediaCodecFuzzSpec extends AnyFunSuite {

  /** A decode attempt may succeed or reject; any throwable other than
    * IllegalArgumentException (NumberFormatException included — it IS
    * an IAE subclass, which is what makes the contract hold for
    * non-numeric header tokens) is a parser bug. */
  private def safe[A](what: String)(body: => A): Option[A] =
    try Some(body)
    catch {
      case _: IllegalArgumentException => None
      case t: Throwable =>
        fail(s"$what must only fail with IllegalArgumentException, got " +
          s"${t.getClass.getName}: ${t.getMessage}")
    }

  private val decoders: Seq[(String, Array[Byte] => Any)] = Seq(
    ("ppm", MediaCodec.decodePpm(_)),
    ("wav", MediaCodec.decodeWav(_)),
    ("y4m", MediaCodec.decodeY4m(_)))

  private def validPayloads(rnd: scala.util.Random): Seq[(String, Array[Byte])] = {
    val w = 2 + 2 * rnd.nextInt(4) // even, for y4m
    val h = 2 + 2 * rnd.nextInt(3)
    val rgb = Array.fill(3 * w * h)(rnd.nextInt(256).toByte)
    val samples = Array.fill(1 + rnd.nextInt(40))(rnd.nextInt(65536).toShort)
    val frames = Array.fill(1 + rnd.nextInt(4))(Array.fill(w * h)(rnd.nextInt(256).toByte))
    Seq(
      ("ppm", MediaCodec.encodePpm(w, h, rgb)),
      ("wav", MediaCodec.encodeWav(8000, samples)),
      ("y4m", MediaCodec.encodeY4m(w, h, frames)))
  }

  test("random garbage never escapes as a non-IAE throwable") {
    val rnd = new scala.util.Random(20260813L)
    (1 to 400).foreach { i =>
      val bytes = Array.fill(rnd.nextInt(300))(rnd.nextInt(256).toByte)
      decoders.foreach { case (name, dec) => safe(s"$name garbage #$i")(dec(bytes)) }
    }
    // garbage behind each REAL magic exercises the header parsers past
    // the cheap first-bytes rejection
    val magics = Seq("P6\n", "RIFF", "YUV4MPEG2 ")
    (1 to 400).foreach { i =>
      val m = magics(rnd.nextInt(magics.length)).getBytes("US-ASCII")
      val bytes = m ++ Array.fill(rnd.nextInt(200))(rnd.nextInt(256).toByte)
      decoders.foreach { case (name, dec) => safe(s"$name magic-garbage #$i")(dec(bytes)) }
    }
  }

  test("every truncation prefix of a valid payload decodes or rejects cleanly") {
    val rnd = new scala.util.Random(7L)
    validPayloads(rnd).foreach { case (name, full) =>
      val dec = decoders.find(_._1 == name).get._2
      (0 until full.length).foreach { n =>
        safe(s"$name prefix $n/${full.length}")(dec(java.util.Arrays.copyOf(full, n)))
      }
      // the full payload must of course still parse
      assert(safe(s"$name full")(dec(full)).isDefined)
    }
    // y4m is the one format where a frame-boundary prefix is VALID
    // (fewer frames) — pin that the survivors are an exact prefix
    val w = 4; val h = 2
    val frames = Array.tabulate(3)(f => Array.tabulate(w * h)(j => (f * 50 + j).toByte))
    val full = MediaCodec.encodeY4m(w, h, frames)
    val headerLen = full.indexOf('\n'.toByte) + 1
    val frameLen = "FRAME\n".length + w * h + 2 * ((w / 2) * (h / 2))
    (1 to 3).foreach { k =>
      val vid = MediaCodec.decodeY4m(java.util.Arrays.copyOf(full, headerLen + k * frameLen))
      assert(vid.lumaFrames.length == k)
      (0 until k).foreach(f => assert(vid.lumaFrames(f).sameElements(frames(f))))
    }
  }

  test("single-byte mutations decode or reject cleanly; raster mutations still parse") {
    val rnd = new scala.util.Random(99L)
    (1 to 40).foreach { _ =>
      validPayloads(rnd).foreach { case (name, full) =>
        val dec = decoders.find(_._1 == name).get._2
        (1 to 25).foreach { i =>
          val mut = full.clone()
          val at = rnd.nextInt(mut.length)
          mut(at) = (mut(at) ^ (1 << rnd.nextInt(8))).toByte
          safe(s"$name mutation #$i @$at")(dec(mut))
        }
      }
    }
    // a mutation strictly inside the raster/sample payload can never
    // invalidate the container: it must still PARSE (content changes,
    // structure doesn't)
    val rgb = Array.fill(3 * 4 * 4)(7.toByte)
    val ppm = MediaCodec.encodePpm(4, 4, rgb)
    val rasterStart = ppm.length - rgb.length
    val mut = ppm.clone(); mut(rasterStart + 5) = 99.toByte
    val img = MediaCodec.decodePpm(mut)
    assert(img.width == 4 && img.height == 4 && img.rgb(5) == 99.toByte)
  }

  test("adversarial headers reject fast without huge allocations") {
    // PPM declaring a 3-TB raster: must fail on the length BOUND (a
    // long-arithmetic check), not attempt the allocation
    val hugePpm = "P6\n1000000 1000000\n255\n".getBytes("US-ASCII") ++ Array[Byte](1, 2, 3)
    val e1 = intercept[IllegalArgumentException](MediaCodec.decodePpm(hugePpm))
    assert(e1.getMessage.contains("truncated"))

    // PPM header int overflow (> Int.MaxValue dims)
    val overPpm = "P6\n99999999999 2\n255\n".getBytes("US-ASCII") ++ Array[Byte](1)
    val e2 = intercept[IllegalArgumentException](MediaCodec.decodePpm(overPpm))
    assert(e2.getMessage.contains("out of range"))

    // WAV declaring more data than the file carries
    val wav = MediaCodec.encodeWav(8000, Array.tabulate(8)(_.toShort))
    val lied = wav.clone()
    // dataLen little-endian at offset 40: claim 1 GB
    lied(40) = 0; lied(41) = 0; lied(42) = 0; lied(43) = 0x40
    val e3 = intercept[IllegalArgumentException](MediaCodec.decodeWav(lied))
    assert(e3.getMessage.contains("truncated"))

    // Y4M dims whose product overflows Int: W65536 H65536 makes w*h
    // wrap to 0 and the Int frame length go NEGATIVE — under Int
    // arithmetic the bound check passes, the cursor slides backwards,
    // and the FRAME probe dies with ArrayIndexOutOfBoundsException
    // (the pre-fix behavior). The Long-arithmetic bound must reject.
    val overY4m = "YUV4MPEG2 W65536 H65536 F25:1\n".getBytes("US-ASCII") ++
      "FRAME\n".getBytes("US-ASCII") ++ Array.fill(64)(0.toByte)
    val e4 = intercept[IllegalArgumentException](MediaCodec.decodeY4m(overY4m))
    assert(e4.getMessage.contains("truncated"))
    // and the odd-dims overflow variant rejects on the parity guard
    val oddY4m = "YUV4MPEG2 W46341 H46341 F25:1\n".getBytes("US-ASCII") ++
      "FRAME\n".getBytes("US-ASCII") ++ Array.fill(64)(0.toByte)
    safe("y4m overflow odd dims")(MediaCodec.decodeY4m(oddY4m)) match {
      case Some(_) => fail("overflowing dims must not parse")
      case None    => () // rejected with IAE — the contract
    }

    // Y4M non-numeric dimension token: NumberFormatException IS the
    // promised IllegalArgumentException
    val badTok = "YUV4MPEG2 Wabc H2\nFRAME\n".getBytes("US-ASCII")
    intercept[IllegalArgumentException](MediaCodec.decodeY4m(badTok))
  }
}
