package graft.functions

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater, Inflater}

/** REAL container codecs for the multimodal surface (no external image
  * libraries — everything here is the container format itself, built on
  * `java.util.zip`):
  *
  *  - PNG: full encoder/decoder for 8-bit grayscale images — signature,
  *    IHDR/IDAT/IEND chunks with real CRC32s, zlib-deflated scanlines,
  *    per-row filter types 0/1/2 (None/Sub/Up) applied on encode and
  *    reversed on decode. `decodePngGray` round-trips any image
  *    `encodePngGray` produces and any spec-conformant gray/8 PNG that
  *    sticks to those filters.
  *  - PNG container writer for arbitrary payloads: signature + IHDR +
  *    a `tEXt` chunk carrying the payload + IEND (headers real, pixel
  *    data absent — the "opaque media blob with typed metadata" shape).
  *  - JPEG/JFIF header writer + marker-walking parser: SOI, APP0(JFIF),
  *    SOF0 with real big-endian dimensions/components, COM payload, EOI.
  *  - `parseHeader`: sniffs magic bytes and extracts
  *    (format, width, height, channels, bit_depth) by actually parsing
  *    IHDR / walking JPEG markers to SOF0–SOF3 — offsets, big-endian
  *    fields and chunk layout per the public specs (PNG RFC 2083 §3,
  *    ITU T.81 §B.2.2). A truncated or foreign payload yields format
  *    "unknown" rather than throwing — decode pipelines at 100 TB meet
  *    corrupt blobs and must quarantine, not crash.
  */
object MediaCodecs {

  final case class MediaHeader(
      format: String, width: Int, height: Int, channels: Int, bitDepth: Int)

  private val PngSig =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def be32(v: Int): Array[Byte] =
    Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

  private def readBe32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def readBe16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  /** One PNG chunk: 4-byte length, 4-byte type, data, CRC32 over
    * type+data — the real chunk layout, real CRC. */
  private def chunk(chunkType: String, data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(be32(data.length))
    val t = chunkType.getBytes("US-ASCII")
    out.write(t)
    out.write(data)
    val crc = new CRC32()
    crc.update(t)
    crc.update(data)
    out.write(be32(crc.getValue.toInt))
    out.toByteArray
  }

  private def ihdrData(
      width: Int, height: Int, bitDepth: Int, colorType: Int): Array[Byte] = {
    val d = new ByteArrayOutputStream()
    d.write(be32(width)); d.write(be32(height))
    d.write(bitDepth); d.write(colorType)
    d.write(0); d.write(0); d.write(0) // compression, filter, interlace
    d.toByteArray
  }

  /** PNG colour type → samples per pixel (PNG spec §6.1). */
  def pngChannels(colorType: Int): Int = colorType match {
    case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
    case _ => 0
  }

  // ---------------------------------------------------------- container

  /** Real PNG container around an opaque payload: signature, IHDR
    * declaring the logical dimensions, the payload in a `tEXt` chunk
    * (keyword "doc", NUL, payload — spec layout), IEND. Total size is
    * deterministic: 61 + 4 + payload.length. */
  def wrapPng(width: Int, height: Int, colorType: Int,
      payload: Array[Byte]): Array[Byte] = {
    // PNG chunk length is a 31-bit field (spec caps it at 2^31 - 1);
    // the tEXt data is keyword "doc" + NUL (4 bytes) + payload
    require(payload.length.toLong + 4 <= Int.MaxValue.toLong,
      s"wrapPng: tEXt payload ${payload.length} bytes exceeds the " +
        "2^31-1 PNG chunk limit")
    val out = new ByteArrayOutputStream()
    out.write(PngSig)
    out.write(chunk("IHDR", ihdrData(width, height, 8, colorType)))
    val text = new ByteArrayOutputStream()
    text.write("doc".getBytes("US-ASCII")); text.write(0)
    text.write(payload)
    out.write(chunk("tEXt", text.toByteArray))
    out.write(chunk("IEND", Array.emptyByteArray))
    out.toByteArray
  }

  /** Real JFIF skeleton around an opaque payload: SOI, APP0 ("JFIF",
    * v1.01, no thumbnail), SOF0 (baseline DCT: precision 8, height,
    * width, nComp with standard sampling/table bytes), the payload in a
    * COM segment, EOI. Total size: 36 + 3*nComp + payload.length. */
  def wrapJpeg(width: Int, height: Int, nComp: Int,
      payload: Array[Byte]): Array[Byte] = {
    // COM segment length is a 16-bit field that includes its own 2
    // bytes — a larger payload would silently overflow it and produce
    // a container whose marker walk no longer matches the layout
    require(payload.length <= 65533,
      s"wrapJpeg: COM payload ${payload.length} bytes exceeds the " +
        "65533-byte JPEG segment limit")
    val out = new ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8) // SOI
    out.write(0xff); out.write(0xe0) // APP0
    out.write(0); out.write(16)      // segment length (incl. itself)
    out.write("JFIF".getBytes("US-ASCII")); out.write(0)
    out.write(1); out.write(1)       // version 1.01
    out.write(0)                     // units: none
    out.write(0); out.write(1); out.write(0); out.write(1) // aspect 1:1
    out.write(0); out.write(0)       // no thumbnail
    out.write(0xff); out.write(0xc0) // SOF0
    val sofLen = 8 + 3 * nComp
    out.write(sofLen >>> 8); out.write(sofLen & 0xff)
    out.write(8)                     // precision
    out.write(height >>> 8); out.write(height & 0xff)
    out.write(width >>> 8); out.write(width & 0xff)
    out.write(nComp)
    var c = 1
    while (c <= nComp) {             // id, sampling 1x1, quant table 0
      out.write(c); out.write(0x11); out.write(0); c += 1
    }
    out.write(0xff); out.write(0xfe) // COM
    val comLen = 2 + payload.length
    out.write(comLen >>> 8); out.write(comLen & 0xff)
    out.write(payload)
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  // ------------------------------------------------------------ parsing

  /** Sniff + parse (format, width, height, channels, bitDepth) from the
    * leading container structure. Anything unparseable → "unknown". */
  def parseHeader(bytes: Array[Byte]): MediaHeader = {
    if (bytes.length >= 33 && PngSig.indices.forall(i => bytes(i) == PngSig(i))) {
      // first chunk must be IHDR (len 13): length at 8, type at 12
      if (readBe32(bytes, 8) == 13 &&
        bytes(12) == 'I' && bytes(13) == 'H' && bytes(14) == 'D' && bytes(15) == 'R') {
        val w = readBe32(bytes, 16); val h = readBe32(bytes, 20)
        val depth = bytes(24) & 0xff; val colorType = bytes(25) & 0xff
        val ch = pngChannels(colorType)
        if (w > 0 && h > 0 && ch > 0)
          return MediaHeader("png", w, h, ch, depth)
      }
      MediaHeader("unknown", 0, 0, 0, 0)
    } else if (bytes.length >= 4 &&
      (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) {
      // walk JPEG markers to a start-of-frame (SOF0..SOF3)
      var i = 2
      while (i + 3 < bytes.length) {
        if ((bytes(i) & 0xff) != 0xff) return MediaHeader("unknown", 0, 0, 0, 0)
        val marker = bytes(i + 1) & 0xff
        if (marker == 0xd9 || marker == 0xda) // EOI / SOS: no SOF seen
          return MediaHeader("unknown", 0, 0, 0, 0)
        val segLen = readBe16(bytes, i + 2)
        if (marker >= 0xc0 && marker <= 0xc3) {
          if (i + 9 >= bytes.length) return MediaHeader("unknown", 0, 0, 0, 0)
          val depth = bytes(i + 4) & 0xff
          val h = readBe16(bytes, i + 5); val w = readBe16(bytes, i + 7)
          val nComp = bytes(i + 9) & 0xff
          return MediaHeader("jpeg", w, h, nComp, depth)
        }
        i += 2 + segLen
      }
      MediaHeader("unknown", 0, 0, 0, 0)
    } else MediaHeader("unknown", 0, 0, 0, 0)
  }

  // --------------------------------------------- real pixel codec (gray/8)

  /** Encode an 8-bit grayscale image as a REAL, spec-conformant PNG:
    * scanlines get per-row filter types cycling 0/1/2 (None/Sub/Up — so
    * the decoder's defiltering is genuinely exercised), the filtered
    * stream is zlib-deflated into one IDAT. Any standard viewer opens
    * the output. `pixels` is row-major, length width*height. */
  def encodePngGray(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
    require(pixels.length == width * height, "pixels != width*height")
    val raw = new Array[Byte]((width + 1) * height)
    var y = 0
    while (y < height) {
      val fty = y % 3
      raw(y * (width + 1)) = fty.toByte
      var x = 0
      while (x < width) {
        val cur = pixels(y * width + x) & 0xff
        val pred = fty match {
          case 0 => 0
          case 1 => if (x == 0) 0 else pixels(y * width + x - 1) & 0xff // Sub
          case 2 => if (y == 0) 0 else pixels((y - 1) * width + x) & 0xff // Up
        }
        raw(y * (width + 1) + 1 + x) = ((cur - pred) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val deflater = new Deflater(Deflater.BEST_SPEED)
    deflater.setInput(raw); deflater.finish()
    val zout = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) zout.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val out = new ByteArrayOutputStream()
    out.write(PngSig)
    out.write(chunk("IHDR", ihdrData(width, height, 8, 0)))
    out.write(chunk("IDAT", zout.toByteArray))
    out.write(chunk("IEND", Array.emptyByteArray))
    out.toByteArray
  }

  // ------------------------------------------------- WAV (RIFF/PCM16)

  /** Encode 16-bit mono PCM samples as a REAL RIFF/WAVE file —
    * canonical 44-byte header (RIFF size, fmt chunk with PCM tag,
    * channel count, sample rate, byte rate, block align, bits) and a
    * little-endian data chunk. Any standard audio tool plays it. */
  def encodeWavPcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >>> 16) & 0xffff) }
    out.write("RIFF".getBytes("US-ASCII")); le32(36 + dataLen)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); le32(16)
    le16(1)                 // PCM
    le16(1)                 // mono
    le32(sampleRate)
    le32(sampleRate * 2)    // byte rate
    le16(2)                 // block align
    le16(16)                // bits per sample
    out.write("data".getBytes("US-ASCII")); le32(dataLen)
    samples.foreach(s => le16(s & 0xffff))
    out.toByteArray
  }

  final case class WavHeader(
      sampleRate: Int, channels: Int, bitsPerSample: Int, nSamples: Int)

  private def readLe16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def readLe32(b: Array[Byte], off: Int): Int =
    readLe16(b, off) | (readLe16(b, off + 2) << 16)

  /** Parse a RIFF/WAVE container by ACTUALLY walking its chunks
    * (little-endian sizes, word-aligned) to fmt and data; returns the
    * header and the decoded 16-bit samples. Rejects non-RIFF,
    * non-PCM, and truncated payloads loudly. */
  def decodeWavPcm16(bytes: Array[Byte]): (WavHeader, Array[Short]) = {
    require(bytes.length >= 12 &&
      new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "US-ASCII") == "WAVE", "not a RIFF/WAVE file")
    var rate = 0; var channels = 0; var bits = 0
    var samples: Array[Short] = null
    var i = 12
    while (i + 8 <= bytes.length) {
      val id = new String(bytes, i, 4, "US-ASCII")
      val len = readLe32(bytes, i + 4)
      id match {
        case "fmt " =>
          require(readLe16(bytes, i + 8) == 1, "not PCM")
          channels = readLe16(bytes, i + 10)
          rate = readLe32(bytes, i + 12)
          bits = readLe16(bytes, i + 22)
          require(bits == 16, s"unsupported bit depth $bits")
        case "data" =>
          require(i + 8 + len <= bytes.length, "truncated data chunk")
          samples = Array.tabulate(len / 2)(j =>
            readLe16(bytes, i + 8 + 2 * j).toShort)
        case _ => // skip unknown chunks (LIST, fact, ...)
      }
      i += 8 + len + (len & 1) // chunks are word-aligned
    }
    require(samples != null && rate > 0, "missing fmt or data chunk")
    (WavHeader(rate, channels, bits, samples.length), samples)
  }

  // -------------------------------------------------- pixel transforms

  /** Nearest-neighbor downscale of a row-major gray image — exact
    * integer source mapping (srcX = dstX*srcW/dstW, floor), so the
    * result is bit-deterministic and oracle-replayable. */
  def resizeNearestGray(
      src: Array[Byte], srcW: Int, srcH: Int,
      dstW: Int, dstH: Int): Array[Byte] = {
    val dst = new Array[Byte](dstW * dstH)
    var y = 0
    while (y < dstH) {
      val sy = y * srcH / dstH
      var x = 0
      while (x < dstW) {
        dst(y * dstW + x) = src(sy * srcW + x * srcW / dstW)
        x += 1
      }
      y += 1
    }
    dst
  }

  /** Decode a gray/8 PNG produced by [[encodePngGray]] (or any
    * conformant gray/8 PNG using filters 0–2): walks chunks, inflates
    * the concatenated IDAT stream, reverses per-row filters. Returns
    * (width, height, row-major pixels). */
  def decodePngGray(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    val hdr = parseHeader(bytes)
    require(hdr.format == "png" && hdr.channels == 1 && hdr.bitDepth == 8,
      s"not a gray/8 PNG: $hdr")
    val w = hdr.width; val h = hdr.height
    // gather IDAT payloads in chunk order
    val z = new ByteArrayOutputStream()
    var i = 8
    while (i + 8 <= bytes.length) {
      val len = readBe32(bytes, i)
      val t = new String(bytes, i + 4, 4, "US-ASCII")
      if (t == "IDAT") z.write(bytes, i + 8, len)
      if (t == "IEND") i = bytes.length
      else i += 12 + len
    }
    val inflater = new Inflater()
    inflater.setInput(z.toByteArray)
    val raw = new Array[Byte]((w + 1) * h)
    var off = 0
    var stalled = false
    while (!stalled && !inflater.finished() && off < raw.length) {
      val n = inflater.inflate(raw, off, raw.length - off)
      // a truncated/corrupt IDAT exhausts the input without finishing:
      // inflate() then returns 0 forever — break and fail loudly below
      // instead of busy-looping (a hung executor task)
      if (n == 0) stalled = true else off += n
    }
    inflater.end()
    require(off == raw.length, s"short IDAT stream: $off of ${raw.length}")
    val px = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      val ft = raw(y * (w + 1)) & 0xff
      var x = 0
      while (x < w) {
        val v = raw(y * (w + 1) + 1 + x) & 0xff
        val pred = ft match {
          case 0 => 0
          case 1 => if (x == 0) 0 else px(y * w + x - 1) & 0xff
          case 2 => if (y == 0) 0 else px((y - 1) * w + x) & 0xff
          case 3 => // Average
            val a = if (x == 0) 0 else px(y * w + x - 1) & 0xff
            val b = if (y == 0) 0 else px((y - 1) * w + x) & 0xff
            (a + b) / 2
          case 4 => // Paeth
            val a = if (x == 0) 0 else px(y * w + x - 1) & 0xff
            val b = if (y == 0) 0 else px((y - 1) * w + x) & 0xff
            val c = if (x == 0 || y == 0) 0 else px((y - 1) * w + x - 1) & 0xff
            val p = a + b - c
            val (pa, pb, pc) = (math.abs(p - a), math.abs(p - b), math.abs(p - c))
            if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
          case other => throw new IllegalArgumentException(s"filter $other")
        }
        px(y * w + x) = ((v + pred) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    (w, h, px)
  }
}
