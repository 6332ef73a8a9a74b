package graft.llmops

import java.io.ByteArrayInputStream

/** Real image decoding for multimodal columns — no stub, no dependency:
  * container sniffing (PNG/JPEG/GIF/BMP magic + header dimension parse,
  * straight from the public format specs) is pure JVM byte arithmetic,
  * and pixel decoding delegates to `javax.imageio` (part of the JDK's
  * `java.desktop` module, headless-safe for file decoding).
  *
  * `sniff` gates `decodeLuma`: arbitrary binary (e.g. a utf-8 text
  * payload lifted into the media shape) never reaches ImageIO, so
  * non-image payloads stay on the cheap opaque path deterministically
  * instead of depending on which ImageIO plugins happen to reject them.
  */
object ImageCodec {

  // ImageIO must never try to touch a display from an executor
  System.setProperty("java.awt.headless", "true")

  /** Parsed container header: mime + pixel dimensions. */
  final case class ImageInfo(mime: String, width: Int, height: Int)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)

  private val PngMagic =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** SOF0-SOF15 carry dimensions, except DHT (C4), JPG (C8), DAC (CC). */
  private def isJpegSof(m: Int): Boolean =
    m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc

  /** Identify a payload's image container and dimensions from its header
    * bytes alone — O(header) per row, no decode. Returns None for
    * anything that is not a recognized image. */
  def sniff(p: Array[Byte]): Option[ImageInfo] = {
    if (p.length >= 24 && p.take(8).sameElements(PngMagic) &&
      p(12) == 'I' && p(13) == 'H' && p(14) == 'D' && p(15) == 'R')
      // PNG: 8-byte magic, IHDR chunk is always first — length(4) +
      // "IHDR"(4) then width/height as big-endian u32 at offsets 16/20.
      // The tag bytes ARE checked: a payload sharing the magic prefix
      // with junk after it must not report garbage dimensions
      Some(ImageInfo("image/png", be32(p, 16), be32(p, 20)))
    else if (p.length >= 10 && u8(p, 0) == 0x47 && u8(p, 1) == 0x49 &&
      u8(p, 2) == 0x46 && u8(p, 3) == 0x38 &&
      (u8(p, 4) == 0x37 || u8(p, 4) == 0x39) && u8(p, 5) == 0x61)
      // GIF87a/GIF89a: logical-screen width/height, little-endian u16
      Some(ImageInfo("image/gif", le16(p, 6), le16(p, 8)))
    else if (p.length >= 26 && u8(p, 0) == 0x42 && u8(p, 1) == 0x4d)
      // BMP "BM": BITMAPINFOHEADER width/height at 18/22, little-endian
      // i32; negative height encodes top-down row order
      Some(ImageInfo("image/bmp", le32(p, 18), math.abs(le32(p, 22))))
    else if (p.length >= 4 && u8(p, 0) == 0xff && u8(p, 1) == 0xd8)
      sniffJpeg(p)
    else None
  }

  // ------------------------------------------------------ audio (WAV)

  /** Parsed RIFF/WAVE header: mime + PCM shape. `nSamples` counts
    * sample FRAMES (all channels at one instant = one frame), i.e.
    * data-chunk bytes / blockAlign. */
  final case class AudioInfo(mime: String, channels: Int, sampleRate: Int,
                             bitsPerSample: Int, nSamples: Int)

  /** RIFF/WAVE header sniff — pure byte parsing from the public WAV
    * spec, the audio sibling of [[sniff]]: "RIFF"<u32 size>"WAVE", then
    * a chunk walk ("fmt " carries channels/rate/bits/blockAlign as
    * little-endian fields; "data"'s length gives the sample count,
    * clamped to the bytes actually present). Odd chunk sizes pad to
    * even per spec. Returns None for anything that is not a
    * well-formed WAV — arbitrary binary stays on the opaque path. */
  def sniffWav(p: Array[Byte]): Option[AudioInfo] = {
    if (p.length < 44 ||
      !(p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F') ||
      !(p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E')) return None
    // LONG cursor: a hostile chunk size near Int.MaxValue passes the
    // sz < 0 check but would overflow an Int advance NEGATIVE — the next
    // iteration then reads p(i<0) and throws out of the sniff instead of
    // returning None (arbitrary binary must stay on the opaque path)
    var i = 12L
    var fmt: Option[(Int, Int, Int, Int)] = None // channels, rate, blockAlign, bits
    var dataSize = -1
    while (i + 8 <= p.length && (fmt.isEmpty || dataSize < 0)) {
      val at = i.toInt // i + 8 <= p.length, so the cursor fits an Int
      val id = new String(p, at, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val sz = le32(p, at + 4)
      if (sz < 0) return None // a 2GB+ chunk claim in a header is junk
      if (id == "fmt " && i + 8 + 16 <= p.length && sz >= 16)
        fmt = Some((le16(p, at + 10), le32(p, at + 12), le16(p, at + 20),
          le16(p, at + 22)))
      else if (id == "data")
        dataSize = math.min(sz.toLong, (p.length - (i + 8))).toInt
      i += 8L + sz + (sz & 1)
    }
    fmt.collect {
      case (ch, rate, blockAlign, bits) if ch > 0 && blockAlign > 0 && dataSize >= 0 =>
        AudioInfo("audio/wav", ch, rate, bits, dataSize / blockAlign)
    }
  }

  /** Canonical 8-bit PCM WAV writer (the synthesis half of the WAV
    * round-trip): 44-byte RIFF header + the sample bytes, data truncated
    * to whole frames (blockAlign = channels at 8 bits). Deterministic —
    * byte-for-byte a function of (samples, channels, sampleRate). */
  def wavEncode(samples: Array[Byte], channels: Int, sampleRate: Int): Array[Byte] = {
    require(channels >= 1, s"channels must be >= 1, got $channels")
    val blockAlign = channels // 8-bit PCM: one byte per channel-sample
    val dataLen = samples.length - (samples.length % blockAlign)
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * blockAlign) // byte rate
      .putShort(blockAlign.toShort)
      .putShort(8.toShort) // bits per sample
    out.put("data".getBytes("US-ASCII")).putInt(dataLen)
      .put(samples, 0, dataLen)
    out.array()
  }

  /** Walk the JPEG marker stream to the first SOF segment: each marker is
    * FF xx with a big-endian self-inclusive length, standalone markers
    * (RSTn/TEM/SOI) have none; SOF payload is precision(1) height(2)
    * width(2). */
  private def sniffJpeg(p: Array[Byte]): Option[ImageInfo] = {
    var i = 2
    while (i + 9 < p.length) {
      if (u8(p, i) != 0xff) return None
      var j = i
      while (j + 1 < p.length && u8(p, j + 1) == 0xff) j += 1 // fill bytes
      val m = u8(p, j + 1)
      if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) i = j + 2
      else {
        if (j + 3 >= p.length) return None
        val len = be16(p, j + 2)
        if (len < 2) return None
        if (isJpegSof(m)) {
          if (j + 9 >= p.length) return None
          return Some(ImageInfo("image/jpeg", be16(p, j + 7), be16(p, j + 5)))
        }
        if (m == 0xda) return None // scan data reached without a SOF
        i = j + 2 + len
      }
    }
    None
  }

  /** Full pixel decode to a row-major luma plane (ITU-R BT.601 integer
    * weights, deterministic across platforms). Returns
    * (width, height, bytes) or None when the payload is not an image
    * ImageIO can decode. */
  def decodeLuma(p: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    sniff(p).flatMap { _ =>
      Option(javax.imageio.ImageIO.read(new ByteArrayInputStream(p)))
        .map { img =>
          val (w, h) = (img.getWidth, img.getHeight)
          val out = new Array[Byte](w * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val lum = (((rgb >> 16) & 0xff) * 299 +
                ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
              out(y * w + x) = lum.toByte
              x += 1
            }
            y += 1
          }
          (w, h, out)
        }
    }
}
