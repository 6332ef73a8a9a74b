package graft.llmops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables

/** Multimodal-column plumbing: image/audio/video as opaque `binary` payloads
  * with a typed metadata struct, plus decode / feature-extract / frame-sample
  * operators.
  *
  * The decode step is REAL for images: [[MediaCodec]] sniffs PNG/JPEG/GIF/
  * BMP containers and decodes pixels through [[ImageCodec]] (JDK
  * `javax.imageio`, no extra dependency); an image payload's frames are its
  * decoded luma rows. Payloads that are not a recognized image — audio,
  * video, or the utf-8 text fixtures the oracle replays — take the
  * documented opaque fallback (fixed-size byte slices), so the whole
  * pipeline stays deterministic and oracle-checkable while real images get
  * real decoding. The execution shape is the part that matters at scale:
  * one decoder scope per PARTITION (how a JNI/FFmpeg handle would be
  * held), frame explosion inside the partition, no shuffle, no driver
  * collect.
  */
object Multimodal {

  /** Metadata contract for a media column. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("mime", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false)))

  val FrameBytes = 256

  /** Payload → frames codec. Real images ([[ImageCodec.sniff]] hit)
    * decode to pixel rows: one frame per luma scanline. Everything else
    * falls back to fixed-size byte slices — the deterministic opaque
    * contract the oracle replays. `features` is the same byte math on
    * both paths (a stand-in for an embedding/logits vector; audio/video
    * codecs would slot in beside the image branch). */
  object MediaCodec {
    def frames(payload: Array[Byte]): Iterator[Array[Byte]] =
      ImageCodec.decodeLuma(payload) match {
        case Some((w, _, luma)) => luma.grouped(w)
        case None               => payload.grouped(FrameBytes)
      }

    /** Feature-extract a frame: (checksum, min, max, mean) over bytes. */
    def features(frame: Array[Byte]): (Long, Int, Int, Double) = {
      var sum = 0L; var mn = 255; var mx = 0
      frame.foreach { b =>
        val u = b & 0xff
        sum += u; if (u < mn) mn = u; if (u > mx) mx = u
      }
      (sum, mn, mx, sum.toDouble / frame.length)
    }
  }

  /** Lift a text table into the media-table shape: payload as binary +
    * typed metadata. (Fixture stand-in for reading real image/audio files;
    * the schema is the contract downstream operators program against.) */
  def toMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "utf-8").as("payload"),
      struct(
        lit("application/octet-stream").as("mime"),
        lit(16).as("width"),
        lit(16).as("height"),
        ceil(length(col("text")).cast("double") / FrameBytes).cast("int").as("n_frames")
      ).as("meta"))

  private val frameSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_no", IntegerType, nullable = false),
    StructField("checksum", LongType, nullable = false),
    StructField("b_min", IntegerType, nullable = false),
    StructField("b_max", IntegerType, nullable = false),
    StructField("b_mean", DoubleType, nullable = false)))

  /** Frame-sample + feature-extract: mapPartitions so a real decoder would
    * be initialized once per partition (not per row). Emits one row per
    * sampled frame. Partition-parallel; no shuffle, no driver collect. */
  def extractFrameFeatures(media: DataFrame, everyN: Int = 1): DataFrame = {
    val spark = media.sparkSession
    // NULL media_id/payload cannot decode (getLong/frames would NPE) —
    // excluded, mirrored by the oracle's WHERE
    val rdd = media.filter(col("media_id").isNotNull && col("payload").isNotNull)
      .select(col("media_id"), col("payload")).rdd
      .mapPartitions { rows =>
        // Stateful codecs (FFmpeg handles etc.) would open here, close on
        // iterator end; ImageIO is stateless so nothing to hold.
        rows.flatMap { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          MediaCodec.frames(payload).zipWithIndex.collect {
            case (frame, i) if i % everyN == 0 =>
              val (sum, mn, mx, mean) = MediaCodec.features(frame)
              Row(id, i, sum, mn, mx, math.rint(mean * 10000) / 10000)
          }
        }
      }
    spark.createDataFrame(rdd, frameSchema)
  }

  /** Attach REAL container metadata sniffed from each payload's header:
    * mime + pixel dimensions for recognized images (n_frames = scanline
    * count), the opaque byte-slice shape otherwise. Narrow map pass — at
    * scale this is the cheap metadata-inventory scan run before deciding
    * what to decode.
    *
    * `n_frames` is the HEADER-DECLARED plan, by design — this scan never
    * decodes. A corrupt body (valid header, undecodable pixels) will
    * decode to the byte-slice fallback instead ([[MediaCodec.frames]]),
    * so header-vs-actual frame-count disagreement is itself the corrupt-
    * payload signal: join this inventory against the decode output's
    * per-media frame counts to flag them. */
  def describeMedia(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("media_id").isNotNull && col("payload").isNotNull)
      .select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .map { case (id, p) =>
        ImageCodec.sniff(p) match {
          case Some(info) => (id, info.mime, info.width, info.height, info.height)
          case None => ImageCodec.sniffWav(p) match {
            // audio rides the same inventory shape: (channels, sample
            // rate) in the spatial slots, sample frames as n_frames
            case Some(a) => (id, a.mime, a.channels, a.sampleRate, a.nSamples)
            case None => (id, "application/octet-stream", 0, 0,
              (p.length + FrameBytes - 1) / FrameBytes)
          }
        }
      }.toDF("media_id", "mime", "width", "height", "n_frames")
  }

  /** "Resize" stub: re-chunk payloads to a target frame size — the real op
    * would transcode; the plumbing (binary→binary, metadata update) is real. */
  def resize(media: DataFrame, targetFrames: Int): DataFrame =
    media.withColumn("meta", struct(
      col("meta.mime").as("mime"),
      col("meta.width").as("width"),
      col("meta.height").as("height"),
      least(col("meta.n_frames"), lit(targetFrames)).as("n_frames")))

  // ------------------------------------------------- perceptual hashing

  /** Gradient buckets for [[perceptualHash]]: 61 buckets → 60 comparison
    * bits, the repo's 60-bit hash discipline (fits a positive Long, and
    * the 4×15-bit band split of the SimHash machinery applies as-is). */
  val PhashBuckets = 61

  /** Band Hamming cutoff for [[phashNearDups]]. */
  val PhashMaxHamming = 6

  /** 60-bit perceptual hash — the dHash idea in 1-D: resample the
    * media's SIGNAL BYTES into [[PhashBuckets]] equal spans and set bit
    * j iff bucket j+1's mean exceeds bucket j's. Gradient signs survive
    * uniform brightness/volume shifts and re-encoding jitter that
    * destroy exact byte hashes — the standard near-dup signal for
    * images (dHash) and audio fingerprints. For recognized images the
    * signal is the DECODED luma plane ([[ImageCodec.decodeLuma]] —
    * resolution-independent up to resampling error); other payloads use
    * raw bytes, the deterministic opaque contract the oracle replays.
    *
    * Exactness: bucket means compare CROSS-MULTIPLIED
    * (`s2·n1 > s1·n2`, all integers) so no division ever happens — the
    * hash is bit-identical on any engine; a bit is set only when BOTH
    * buckets are populated (short payloads leave high buckets empty on
    * both engines alike). One narrow kernel pass, zero shuffle. */
  def perceptualHash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("media_id").isNotNull && col("payload").isNotNull &&
        length(col("payload")) >= 1)
      .select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          val bytes = ImageCodec.decodeLuma(payload) match {
            case Some((_, _, luma)) => luma
            case None               => payload
          }
          val nb = PhashBuckets
          val s = new Array[Long](nb)
          val n = new Array[Long](nb)
          val len = bytes.length
          var i = 0
          while (i < len) {
            val b = ((i.toLong * nb) / len).toInt
            s(b) += (bytes(i) & 0xff)
            n(b) += 1
            i += 1
          }
          var h = 0L
          var j = 0
          while (j < nb - 1) {
            if (n(j) > 0 && n(j + 1) > 0 && s(j + 1) * n(j) > s(j) * n(j + 1))
              h |= (1L << j)
            j += 1
          }
          (id, h)
        }
      }.toDF("media_id", "phash")
  }

  /** Banded perceptual near-dup pairs — [[Dedup.fingerprintPairs]] over
    * the phash frame (ONE banding arithmetic and pair contract shared
    * with text SimHash; never an all-pairs product). The hash frame
    * localCheckpoints first: the band union + self-join would otherwise
    * re-execute the kernel — and its real image DECODE — up to 8×,
    * where the checkpoint is two longs per media. Emits
    * (media_a, media_b, hamming), a < b, hamming ≤ `maxHamming`. */
  def phashNearDups(media: DataFrame,
                    maxHamming: Int = PhashMaxHamming): DataFrame =
    Dedup.fingerprintPairs(
      perceptualHash(media)
        .select(col("media_id").as("doc_id"), col("phash").as("simhash"))
        .localCheckpoint(),
      maxHamming)
      .select(col("doc_a").as("media_a"), col("doc_b").as("media_b"),
        col("hamming"))

  // ----------------------------------------------------------------- queries

  /** Per-media aggregate of frame features — the oracle replicates the stub
    * byte-math in SQL (payload == utf-8 text bytes, frames == 256-byte
    * slices), proving the binary plumbing end to end. */
  def qMultimodalStats(spark: SparkSession, dir: String): DataFrame = {
    val media = toMediaTable(Tables.load(spark, dir, "documents"))
    extractFrameFeatures(media)
      .groupBy(col("media_id"))
      .agg(
        count(lit(1)).as("n_frames"),
        sum(col("checksum")).as("total_checksum"),
        min(col("b_min")).as("b_min"),
        max(col("b_max")).as("b_max"))
  }

  /** Fixture text is ASCII, so the utf-8 payload's byte values equal the
    * text's code points — the oracle recomputes the stub's byte math from
    * the characters directly. */
  val qMultimodalStatsSql: String =
    s"""WITH c AS (SELECT doc_id AS media_id, text,
       |                  unnest(generate_series(1, length(text))) AS i
       |           FROM documents
       |           WHERE doc_id IS NOT NULL AND text IS NOT NULL),
       |b AS (SELECT media_id, (i - 1) // $FrameBytes AS frame_no,
       |             ascii(substring(text, CAST(i AS INT), 1)) AS v
       |      FROM c),
       |fr AS (SELECT media_id, frame_no, CAST(sum(v) AS BIGINT) AS checksum,
       |              min(v) AS b_min, max(v) AS b_max
       |       FROM b GROUP BY 1, 2)
       |SELECT media_id, count(*) AS n_frames,
       |       CAST(sum(checksum) AS BIGINT) AS total_checksum,
       |       min(b_min) AS b_min, max(b_max) AS b_max
       |FROM fr GROUP BY 1""".stripMargin

  /** Frame SAMPLING through the same decode path — the video-pipeline
    * shape (take every Nth frame for feature extraction; decoding every
    * frame of 100 TB of video is the cost bug): `everyN = 3` keeps
    * frames 0, 3, 6, … per media. The oracle recomputes the kept-frame
    * set from the byte math, so a sampling regression (off-by-one,
    * wrong modulus base) breaks the hash, not just a count. */
  def qMultimodalFrameSample(spark: SparkSession, dir: String): DataFrame = {
    val media = toMediaTable(Tables.load(spark, dir, "documents"))
    extractFrameFeatures(media, everyN = 3)
      .groupBy(col("media_id"))
      .agg(
        count(lit(1)).as("n_frames"),
        sum(col("checksum")).as("total_checksum"),
        min(col("b_min")).as("b_min"),
        max(col("b_max")).as("b_max"))
  }

  val qMultimodalFrameSampleSql: String =
    s"""WITH c AS (SELECT doc_id AS media_id, text,
       |                  unnest(generate_series(1, length(text))) AS i
       |           FROM documents
       |           WHERE doc_id IS NOT NULL AND text IS NOT NULL),
       |b AS (SELECT media_id, (i - 1) // $FrameBytes AS frame_no,
       |             ascii(substring(text, CAST(i AS INT), 1)) AS v
       |      FROM c),
       |fr AS (SELECT media_id, frame_no, CAST(sum(v) AS BIGINT) AS checksum,
       |              min(v) AS b_min, max(v) AS b_max
       |       FROM b WHERE frame_no % 3 = 0 GROUP BY 1, 2)
       |SELECT media_id, count(*) AS n_frames,
       |       CAST(sum(checksum) AS BIGINT) AS total_checksum,
       |       min(b_min) AS b_min, max(b_max) AS b_max
       |FROM fr GROUP BY 1""".stripMargin

  /** Resize buckets: the fixed output width of [[resizeSignal]]. */
  val ResizeBuckets = 16

  /** Signal RESIZE — the fixed-width downsample every vision pipeline
    * runs before featurization (224×224-style normalization; here the
    * 1-D analog over the decoded/opaque signal bytes): the signal
    * box-averages into [[ResizeBuckets]] equal spans, each value the
    * exact integer mean `Σv div n`. Same bucket arithmetic and byte
    * domain as [[perceptualHash]] (which IS this downsample followed by
    * gradient signs); one narrow kernel pass, zero shuffle. Output one
    * row per (media, bucket) so the thumbnail hash-compares as scalars. */
  def resizeSignal(media: DataFrame, buckets: Int = ResizeBuckets): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("media_id").isNotNull && col("payload").isNotNull &&
        length(col("payload")) >= 1)
      .select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          val bytes = ImageCodec.decodeLuma(payload) match {
            case Some((_, _, luma)) => luma
            case None               => payload
          }
          val s = new Array[Long](buckets)
          val n = new Array[Long](buckets)
          val len = bytes.length
          var i = 0
          while (i < len) {
            val b = ((i.toLong * buckets) / len).toInt
            s(b) += (bytes(i) & 0xff)
            n(b) += 1
            i += 1
          }
          (0 until buckets).iterator.filter(n(_) > 0)
            .map(b => (id, b, s(b) / n(b), n(b)))
        }
      }.toDF("media_id", "bkt", "mean_v", "n_bytes")
  }

  def qMultimodalResize(spark: SparkSession, dir: String): DataFrame =
    resizeSignal(toMediaTable(Tables.load(spark, dir, "documents")))

  /** Same bucket spans and integer means replayed over the ASCII
    * payload bytes. */
  val qMultimodalResizeSql: String =
    s"""WITH c AS (SELECT doc_id AS media_id, text,
       |                  unnest(generate_series(1, length(text))) AS i
       |           FROM documents
       |           WHERE doc_id IS NOT NULL AND text IS NOT NULL
       |             AND length(text) >= 1)
       |SELECT media_id,
       |       ((i - 1) * $ResizeBuckets) // length(text) AS bkt,
       |       CAST(sum(ascii(substring(text, CAST(i AS INT), 1))) AS BIGINT)
       |         // CAST(count(*) AS BIGINT) AS mean_v,
       |       CAST(count(*) AS BIGINT) AS n_bytes
       |FROM c GROUP BY 1, 2""".stripMargin

  /** Perceptual-hash inventory over the fixture media table (opaque
    * fallback path: payload bytes = the ASCII text's code points, so the
    * oracle replays the exact bucket/gradient algebra in SQL). The
    * banded pair search ([[phashNearDups]]) is spec-gated on constructed
    * near-identical images through the REAL decode path — the fixture
    * corpus has no byte-near-identical payloads (measured min pairwise
    * Hamming 11), so an inventory is the honest oracle artifact. */
  def qMultimodalPhash(spark: SparkSession, dir: String): DataFrame =
    perceptualHash(toMediaTable(Tables.load(spark, dir, "documents")))

  val qMultimodalPhashSql: String =
    s"""WITH c AS (SELECT doc_id AS media_id, text,
       |                  unnest(generate_series(1, length(text))) AS i
       |           FROM documents
       |           WHERE doc_id IS NOT NULL AND text IS NOT NULL
       |             AND length(text) >= 1),
       |b AS (SELECT media_id,
       |             ((i - 1) * $PhashBuckets) // length(text) AS bkt,
       |             ascii(substring(text, CAST(i AS INT), 1)) AS v
       |      FROM c),
       |g AS (SELECT media_id, bkt, CAST(sum(v) AS BIGINT) AS s,
       |             CAST(count(*) AS BIGINT) AS n
       |      FROM b GROUP BY 1, 2),
       |p AS (SELECT a.media_id,
       |             CAST(sum(CASE WHEN b.s * a.n > a.s * b.n
       |                      THEN 1::BIGINT << CAST(a.bkt AS INT)
       |                      ELSE 0 END) AS BIGINT) AS phash
       |      FROM g a JOIN g b ON b.media_id = a.media_id
       |                       AND b.bkt = a.bkt + 1
       |      WHERE a.bkt < ${PhashBuckets - 1}
       |      GROUP BY 1),
       |m AS (SELECT DISTINCT media_id FROM c)
       |-- sub-2-bucket payloads have no adjacent pair: phash pins to 0
       |-- on both engines (the kernel's empty-bucket guard)
       |SELECT m.media_id, coalesce(p.phash, 0) AS phash
       |FROM m LEFT JOIN p USING (media_id)""".stripMargin

  // ------------------------------------------------------- audio (WAV)

  /** Audio leg of the multimodal quartet: synthesize a REAL 8-bit PCM
    * WAV per document (text bytes as samples; channels/rate vary by
    * doc_id so header fields are data-dependent, not constants), then
    * sniff the header BACK with [[ImageCodec.sniffWav]] and report the
    * parsed fields. The oracle predicts every field from the text
    * length alone, so any synthesis/parse disagreement — an endianness
    * slip, a chunk-offset error, a blockAlign mix-up — breaks the hash.
    * One narrow kernel pass; at scale this is the audio-inventory scan
    * (headers only, bodies untouched) run before deciding what to
    * transcode. */
  def qMultimodalAudio(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val samples = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val channels = 1 + (id % 2).toInt
        val rate = 8000 + (id % 3).toInt * 4000
        val wav = ImageCodec.wavEncode(samples, channels, rate)
        val info = ImageCodec.sniffWav(wav).getOrElse(
          throw new IllegalStateException(s"own WAV failed to sniff: media $id"))
        (id, info.mime, info.channels, info.sampleRate, info.bitsPerSample,
          info.nSamples, wav.length.toLong)
      }
      .toDF("media_id", "mime", "channels", "sample_rate", "bits_per_sample",
        "n_samples", "n_bytes")
  }

  /** Fixture text is ASCII (byte length = char length), so every header
    * field is a pure function of (doc_id, length(text)). */
  val qMultimodalAudioSql: String =
    """SELECT doc_id AS media_id,
      |       'audio/wav' AS mime,
      |       CAST(1 + doc_id % 2 AS INT) AS channels,
      |       CAST(8000 + (doc_id % 3) * 4000 AS INT) AS sample_rate,
      |       CAST(8 AS INT) AS bits_per_sample,
      |       CAST(length(text) // (1 + doc_id % 2) AS INT) AS n_samples,
      |       44 + length(text) - (length(text) % (1 + doc_id % 2)) AS n_bytes
      |FROM documents
      |WHERE doc_id IS NOT NULL AND text IS NOT NULL""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_stats" -> (qMultimodalStats _),
    "multimodal_phash" -> (qMultimodalPhash _),
    "multimodal_framesample" -> (qMultimodalFrameSample _),
    "multimodal_resize" -> (qMultimodalResize _),
    "multimodal_audio" -> (qMultimodalAudio _))

  val oracleSql: Map[String, String] = Map(
    "multimodal_stats" -> qMultimodalStatsSql,
    "multimodal_phash" -> qMultimodalPhashSql,
    "multimodal_framesample" -> qMultimodalFrameSampleSql,
    "multimodal_resize" -> qMultimodalResizeSql,
    "multimodal_audio" -> qMultimodalAudioSql)
}
