package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.MediaCodecs

/** Baseline JPEG codec (encoder + decoder) cross-checked against
  * ImageIO in BOTH directions — the same discipline MediaCodecsSpec
  * applies to PNG. JPEG is lossy with implementation-defined IDCT
  * rounding, so pixel agreement between independent decoders carries a
  * small tolerance; flat even-offset blocks must round-trip EXACTLY
  * (the q429 oracle contract).
  */
class JpegCodecSpec extends AnyFunSuite {

  private def gradient(w: Int, h: Int): Array[Byte] =
    Array.tabulate(w * h)(i => ((i * 31 + (i / w) * 7) % 256).toByte)

  private def imageIoDecode(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO failed to read the JPEG")
    val w = img.getWidth; val h = img.getHeight
    val px = new Array[Byte](w * h)
    val raster = img.getRaster
    for (y <- 0 until h; x <- 0 until w)
      px(y * w + x) = raster.getSample(x, y, 0).toByte
    (w, h, px)
  }

  private def maxDiff(a: Array[Byte], b: Array[Byte]): Int =
    a.zip(b).map { case (x, y) => math.abs((x & 0xff) - (y & 0xff)) }.max

  test("our encoder's output is a valid JPEG ImageIO can read") {
    for ((w, h) <- Seq((32, 24), (17, 9), (8, 8), (1, 1), (64, 48))) {
      val px = gradient(w, h)
      val jpg = MediaCodecs.encodeJpegGray(w, h, px)
      val (dw, dh, dec) = imageIoDecode(jpg)
      assert((dw, dh) == (w, h))
      // lossy: ImageIO's decode of our bytes vs our own decode of the
      // same bytes may differ only by IDCT rounding
      val (_, _, ours) = MediaCodecs.decodeJpegGray(jpg)
      assert(maxDiff(dec, ours) <= 2,
        s"decoders disagree by ${maxDiff(dec, ours)} at ${w}x$h")
    }
  }

  test("our decoder reads ImageIO-encoded grayscale JPEGs") {
    val (w, h) = (40, 25)
    val px = gradient(w, h)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, px(y * w + x) & 0xff)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val bytes = bos.toByteArray
    val (dw, dh, ours) = MediaCodecs.decodeJpegGray(bytes)
    assert((dw, dh) == (w, h))
    val (_, _, ref) = imageIoDecode(bytes)
    assert(maxDiff(ours, ref) <= 2,
      s"our decode of ImageIO bytes off by ${maxDiff(ours, ref)}")
  }

  test("flat even-offset 8x8 blocks round-trip exactly (q429 contract)") {
    val (w, h) = (32, 24)
    val px = Array.tabulate(w * h) { i =>
      val bx = (i % w) / 8; val by = (i / w) / 8
      (128 + 2 * ((bx * 3 + by * 5 + 1) % 51 - 25)).toByte
    }
    val jpg = MediaCodecs.encodeJpegGray(w, h, px)
    val (dw, dh, dec) = MediaCodecs.decodeJpegGray(jpg)
    assert((dw, dh) == (w, h))
    assert(dec.toSeq == px.toSeq, "flat-block image must round-trip exactly")
  }

  test("lossy round trip stays close on smooth images") {
    val (w, h) = (48, 32)
    // genuinely smooth ramp (the mod-256 sawtooth `gradient` is full of
    // hard edges and legitimately compresses badly at quality 50)
    val px = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      (20 + (x + y) * 215 / (w + h - 2)).toByte
    }
    val jpg = MediaCodecs.encodeJpegGray(w, h, px)
    val (_, _, dec) = MediaCodecs.decodeJpegGray(jpg)
    // Annex-K quality-50 tables on a smooth gradient: small error
    val err = px.zip(dec).map { case (a, b) =>
      math.abs((a & 0xff) - (b & 0xff)) }.sum.toDouble / (w * h)
    assert(err < 12.0, s"mean abs error $err too high")
  }

  test("corrupt input fails loudly (quarantine contract)") {
    val jpg = MediaCodecs.encodeJpegGray(16, 16, gradient(16, 16))
    intercept[Exception] {
      MediaCodecs.decodeJpegGray(jpg.take(jpg.length / 2))
    }
    intercept[Exception] {
      MediaCodecs.decodeJpegGray(Array[Byte](1, 2, 3, 4))
    }
    // progressive refused, not mis-decoded
    val prog = jpg.clone()
    // flip SOF0 (0xffc0) to SOF2 (0xffc2) wherever it appears
    var i = 0
    var flipped = false
    while (i + 1 < prog.length && !flipped) {
      if ((prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0) {
        prog(i + 1) = 0xc2.toByte; flipped = true
      }
      i += 1
    }
    assert(flipped)
    val e = intercept[IllegalArgumentException] {
      MediaCodecs.decodeJpegGray(prog)
    }
    assert(e.getMessage.contains("progressive"))
  }
}
