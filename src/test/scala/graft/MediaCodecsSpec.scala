package graft

import graft.functions.MediaCodecs
import org.scalatest.funsuite.AnyFunSuite

/** The media codecs are REAL container codecs, so they are tested
  * against independent implementations and hand-computed bytes:
  * encodePngGray's output must be readable by the JDK's own ImageIO PNG
  * plugin (pixel-exact), headers must parse from hand-assembled byte
  * fixtures, and corrupt inputs must quarantine as "unknown" instead of
  * throwing.
  */
class MediaCodecsSpec extends AnyFunSuite {

  test("encodePngGray produces a spec-conformant PNG (ImageIO round trip)") {
    val w = 37; val h = 23 // odd dims, > one deflate block of variety
    val px = Array.tabulate(w * h)(i => ((i * 31 + 7) % 256).toByte)
    val png = MediaCodecs.encodePngGray(w, h, px)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img != null, "ImageIO could not read our PNG")
    assert(img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val got = img.getRaster.getSample(x, y, 0)
      assert(got == (px(y * w + x) & 0xff), s"pixel ($x,$y)")
    }
  }

  test("decodePngGray inverts encodePngGray across filter rows") {
    for ((w, h) <- Seq((1, 1), (1, 5), (8, 3), (32, 24), (640, 2))) {
      val px = Array.tabulate(w * h)(i => ((i * 73 + w) % 256).toByte)
      val (dw, dh, dec) = MediaCodecs.decodePngGray(
        MediaCodecs.encodePngGray(w, h, px))
      assert((dw, dh) == ((w, h)))
      assert(dec.toSeq == px.toSeq, s"${w}x$h pixels")
    }
  }

  test("decodePngGray handles Average and Paeth filters (foreign PNG)") {
    // Build a gray/8 PNG through ImageIO (the JDK encoder chooses its
    // own filters, typically Paeth/adaptive) and decode it with ours.
    val w = 41; val h = 17
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, (x * 7 + y * 13) % 256)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val (dw, dh, dec) = MediaCodecs.decodePngGray(bos.toByteArray)
    assert((dw, dh) == ((w, h)))
    for (y <- 0 until h; x <- 0 until w)
      assert((dec(y * w + x) & 0xff) == (x * 7 + y * 13) % 256, s"($x,$y)")
  }

  test("parseHeader reads PNG IHDR fields") {
    val png = MediaCodecs.wrapPng(513, 258, 6, "body".getBytes)
    val hdr = MediaCodecs.parseHeader(png)
    assert(hdr == MediaCodecs.MediaHeader("png", 513, 258, 4, 8))
    assert(png.length == 61 + 4)
    // big-endian check with a hand-read: width bytes at offset 16
    assert(((png(16) & 0xff) << 24 | (png(17) & 0xff) << 16 |
      (png(18) & 0xff) << 8 | (png(19) & 0xff)) == 513)
  }

  test("parseHeader walks JPEG markers to SOF0") {
    val jp = MediaCodecs.wrapJpeg(1024, 769, 3, "x".getBytes)
    val hdr = MediaCodecs.parseHeader(jp)
    assert(hdr == MediaCodecs.MediaHeader("jpeg", 1024, 769, 3, 8))
    assert(jp.length == 36 + 9 + 1)
    assert((jp(0) & 0xff) == 0xff && (jp(1) & 0xff) == 0xd8)
    assert((jp.last & 0xff) == 0xd9)
    // hand-read SOF0 dimensions: APP0 is 18 bytes after SOI, so SOF0's
    // payload starts at offset 24; height at 25, width at 27 (BE16)
    assert(((jp(25) & 0xff) << 8 | (jp(26) & 0xff)) == 769)
    assert(((jp(27) & 0xff) << 8 | (jp(28) & 0xff)) == 1024)
  }

  test("encodeWavPcm16 produces a spec-conformant WAV (AudioSystem check)") {
    val samples = Array.tabulate(500)(i => ((i * 37) % 2048 - 1024).toShort)
    val wav = MediaCodecs.encodeWavPcm16(8000, samples)
    // the JDK's own sampled-audio stack must parse our container
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    val fmt = ais.getFormat
    assert(fmt.getSampleRate == 8000f)
    assert(fmt.getChannels == 1)
    assert(fmt.getSampleSizeInBits == 16)
    assert(ais.getFrameLength == 500L)
    // and the PCM payload round-trips bit-exact through OUR decoder
    val (hdr, dec) = MediaCodecs.decodeWavPcm16(wav)
    assert(hdr == MediaCodecs.WavHeader(8000, 1, 16, 500))
    assert(dec.toSeq == samples.toSeq)
  }

  test("decodeWavPcm16 skips unknown chunks and rejects junk") {
    // splice a LIST chunk between fmt and data: parser must skip it
    val samples = Array[Short](1, -2, 3)
    val wav = MediaCodecs.encodeWavPcm16(44100, samples)
    val headerEnd = 36 // RIFF(12) + fmt(8+16)
    val list = "LIST".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
    val spliced = wav.take(headerEnd) ++ list ++ wav.drop(headerEnd)
    // patch the RIFF size (not validated by our parser, but keep honest)
    val (hdr, dec) = MediaCodecs.decodeWavPcm16(spliced)
    assert(hdr.sampleRate == 44100 && dec.toSeq == samples.toSeq)
    intercept[IllegalArgumentException] {
      MediaCodecs.decodeWavPcm16("not audio at all".getBytes)
    }
  }

  test("resizeNearestGray maps sources with exact floor arithmetic") {
    // 4x2 -> 2x1: dst(x) takes src(x*4/2, 0*2/1) = src(2x, 0)
    val src = Array[Byte](10, 20, 30, 40, 50, 60, 70, 80)
    val out = MediaCodecs.resizeNearestGray(src, 4, 2, 2, 1)
    assert(out.toSeq == Seq[Byte](10, 30))
    // identity resize is a no-op
    assert(MediaCodecs.resizeNearestGray(src, 4, 2, 4, 2).toSeq == src.toSeq)
  }

  test("corrupt and foreign payloads quarantine as unknown") {
    val cases = Seq(
      Array.emptyByteArray,
      "plain text".getBytes,
      Array.fill(40)(0x89.toByte),                       // PNG-ish first byte only
      MediaCodecs.wrapPng(5, 5, 2, "b".getBytes).take(20), // truncated
      Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xd9.toByte)) // JPEG, no SOF
    cases.foreach { b =>
      assert(MediaCodecs.parseHeader(b).format == "unknown", b.length.toString)
    }
  }
}
