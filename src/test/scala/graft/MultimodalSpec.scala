package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.llmops.{ImageCodec, Multimodal}

/** Real-image decoding through the multimodal column family: container
  * sniffing, pixel decode, and the frame pipeline on payloads produced by
  * the JDK's own encoders (so the fixture bytes are genuine PNG/JPEG/GIF/
  * BMP containers, not hand-faked headers). */
class MultimodalSpec extends AnyFunSuite {
  import TestSession._

  /** A real encoded image: 6x4, deterministic per-pixel RGB gradient. */
  private def encodedImage(format: String, w: Int = 6, h: Int = 4): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 40) << 16) | ((y * 60) << 8) | (x * 10 + y))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, format, bos), s"no $format writer")
    bos.toByteArray
  }

  test("sniff reads mime and dimensions from real container headers") {
    assert(ImageCodec.sniff(encodedImage("png")) ===
      Some(ImageCodec.ImageInfo("image/png", 6, 4)))
    assert(ImageCodec.sniff(encodedImage("jpg")) ===
      Some(ImageCodec.ImageInfo("image/jpeg", 6, 4)))
    assert(ImageCodec.sniff(encodedImage("gif")) ===
      Some(ImageCodec.ImageInfo("image/gif", 6, 4)))
    assert(ImageCodec.sniff(encodedImage("bmp")) ===
      Some(ImageCodec.ImageInfo("image/bmp", 6, 4)))
    assert(ImageCodec.sniff("plain text payload".getBytes("utf-8")) === None)
    assert(ImageCodec.sniff(Array[Byte]()) === None)
  }

  test("decodeLuma recovers the exact pixels from a lossless container") {
    val Some((w, h, luma)) = ImageCodec.decodeLuma(encodedImage("png"))
    assert((w, h) === (6, 4))
    assert(luma.length === 24)
    // luma of pixel (x, y) from the gradient, BT.601 integer weights
    def expected(x: Int, y: Int): Byte =
      (((x * 40) * 299 + (y * 60) * 587 + (x * 10 + y) * 114) / 1000).toByte
    for (y <- 0 until h; x <- 0 until w)
      assert(luma(y * w + x) === expected(x, y), s"pixel ($x, $y)")
    // text payloads must NOT decode (they take the opaque path)
    assert(ImageCodec.decodeLuma("not an image".getBytes("utf-8")).isEmpty)
  }

  test("frame pipeline decodes a real image into per-scanline features") {
    import spark.implicits._
    val png = encodedImage("png")
    val media = Seq((7L, png)).toDF("media_id", "payload")
    val frames = Multimodal.extractFrameFeatures(media)
      .orderBy("frame_no").collect()
    assert(frames.length === 4) // one frame per scanline, not byte-slices
    val Some((w, _, luma)) = ImageCodec.decodeLuma(png)
    frames.zipWithIndex.foreach { case (r, y) =>
      val row = luma.slice(y * w, (y + 1) * w).map(_ & 0xff)
      assert(r.getLong(2) === row.map(_.toLong).sum, s"checksum row $y")
      assert(r.getInt(3) === row.min && r.getInt(4) === row.max)
    }
  }

  test("describeMedia inventories mixed image and opaque payloads") {
    import spark.implicits._
    val media = Seq(
      (1L, encodedImage("png", 9, 5)),
      (2L, encodedImage("gif", 3, 7)),
      (3L, ("x" * 600).getBytes("utf-8"))).toDF("media_id", "payload")
    val got = Multimodal.describeMedia(media).orderBy("media_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4)))
    assert(got.toSeq === Seq(
      (1L, "image/png", 9, 5, 5),
      (2L, "image/gif", 3, 7, 7),
      (3L, "application/octet-stream", 0, 0, 3))) // ceil(600/256) slices
  }

  test("opaque fallback is unchanged: text payloads still byte-slice") {
    import spark.implicits._
    val media = Multimodal.toMediaTable(
      Seq((1L, "a" * 300)).toDF("doc_id", "text"))
    val frames = Multimodal.extractFrameFeatures(media)
      .orderBy("frame_no").collect()
    assert(frames.length === 2) // 300 bytes -> 256 + 44
    assert(frames(0).getLong(2) === 97L * 256) // 'a' checksum, slice 1
    assert(frames(1).getLong(2) === 97L * 44)
  }

  test("perceptualHash: monotone ramps pin all/zero gradient bits; tiny payloads pin to 0") {
    import spark.implicits._
    val up = Array.tabulate(122)(i => (i * 2).toByte)     // strictly rising
    val down = Array.tabulate(122)(i => (244 - i * 2).toByte) // strictly falling
    val one = Array[Byte](7)
    val media = Seq((1L, up), (2L, down), (3L, one))
      .toDF("media_id", "payload")
    val got = Multimodal.perceptualHash(media).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got(1L) === (1L << 60) - 1) // every adjacent bucket mean rises
    assert(got(2L) === 0L)             // every gradient falls
    assert(got(3L) === 0L)             // single bucket: no adjacent pair
  }

  test("perceptualHash is invariant under uniform brightness shift") {
    import spark.implicits._
    // (s2+c·n2)·n1 > (s1+c·n1)·n2  ⟺  s2·n1 > s1·n2 — the cross-multiplied
    // gradient is EXACTLY invariant under adding a constant to every byte
    val rnd = new scala.util.Random(11)
    val base = Array.fill(200)((rnd.nextInt(180) + 10).toByte)
    val shifted = base.map(b => ((b & 0xff) + 40).toByte)
    val media = Seq((1L, base), (2L, shifted)).toDF("media_id", "payload")
    val got = Multimodal.perceptualHash(media).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got(1L) === got(2L))
  }

  test("phashNearDups pairs a perturbed re-encode of an image, not an unrelated one") {
    import spark.implicits._
    // base: 64x64 smooth gradient; near: same scene at ~1% pixel noise
    // (deterministic); far: the transposed gradient (different structure)
    def scene(w: Int, h: Int, f: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = f(x, y) & 0xff
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", bos))
      bos.toByteArray
    }
    val base = scene(64, 64, (x, y) => x * 3 + y)
    val near = scene(64, 64, (x, y) => x * 3 + y + (if ((x * 7 + y) % 97 == 0) 4 else 0))
    val far = scene(64, 64, (x, y) => 255 - (y * 3 + x))
    val media = Seq((1L, base), (2L, near), (3L, far))
      .toDF("media_id", "payload")
    val pairs = Multimodal.phashNearDups(media).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"near-identical pair missed: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      s"unrelated image spuriously paired: $pairs")
  }

  test("WAV codec: encode/sniff round-trip, stereo frame truncation, malformed rejection") {
    import graft.llmops.ImageCodec
    val mono = ImageCodec.wavEncode(Array[Byte](1, 2, 3, 4, 5), 1, 8000)
    val mi = ImageCodec.sniffWav(mono).get
    assert(mi === ImageCodec.AudioInfo("audio/wav", 1, 8000, 8, 5))
    assert(mono.length === 44 + 5)
    // stereo: 5 bytes truncate to 2 whole frames (4 bytes)
    val stereo = ImageCodec.wavEncode(Array[Byte](1, 2, 3, 4, 5), 2, 16000)
    val si = ImageCodec.sniffWav(stereo).get
    assert(si === ImageCodec.AudioInfo("audio/wav", 2, 16000, 8, 2))
    assert(stereo.length === 44 + 4)
    // a data chunk CLAIMING more bytes than present clamps, never overreads
    val lying = mono.clone()
    lying(40) = 100 // data size field (LE u32 at offset 40)
    assert(ImageCodec.sniffWav(lying).get.nSamples === 5)
    // non-WAV binary and truncated headers reject
    assert(ImageCodec.sniffWav("not a wav at all, just text bytes ...x".getBytes).isEmpty)
    assert(ImageCodec.sniffWav(mono.take(20)).isEmpty)
    // a RIFF container that is not WAVE rejects
    val avi = mono.clone(); avi(8) = 'A'; avi(9) = 'V'; avi(10) = 'I'; avi(11) = ' '
    assert(ImageCodec.sniffWav(avi).isEmpty)
    // a hostile near-Int.MaxValue chunk size must return None, not
    // overflow the cursor negative and throw out of the sniff
    val hostile = ImageCodec.wavEncode(Array[Byte](1, 2, 3, 4), 1, 8000)
    // first chunk id -> "junk", size -> 0x7ffffff0 (LE u32 at offset 16)
    hostile(12) = 'j'; hostile(13) = 'u'; hostile(14) = 'n'; hostile(15) = 'k'
    hostile(16) = 0xf0.toByte; hostile(17) = 0xff.toByte
    hostile(18) = 0xff.toByte; hostile(19) = 0x7f.toByte
    assert(ImageCodec.sniffWav(hostile).isEmpty)
    // images stay images: the WAV sniffer must not claim a PNG
    val png = {
      val img = new java.awt.image.BufferedImage(
        4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    assert(ImageCodec.sniffWav(png).isEmpty && ImageCodec.sniff(mono).isEmpty)
  }

  test("describeMedia inventories WAV payloads as audio, not opaque bytes") {
    import spark.implicits._
    val wav = graft.llmops.ImageCodec.wavEncode(Array.fill(100)(7.toByte), 2, 8000)
    val media = Seq((1L, wav), (2L, "plain text".getBytes)).toDF("media_id", "payload")
    val got = Multimodal.describeMedia(media).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4)))
      .toMap
    assert(got(1L) === (("audio/wav", 2, 8000, 50)))
    assert(got(2L)._1 === "application/octet-stream")
  }
}
