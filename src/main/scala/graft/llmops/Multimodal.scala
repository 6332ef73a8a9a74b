package graft.llmops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables

/** Multimodal-column plumbing: image/audio/video as opaque `binary` payloads
  * with a typed metadata struct, plus decode / feature-extract / frame-sample
  * operators.
  *
  * The actual codecs are NOT available in this environment, so the decode
  * step is a clearly-marked deterministic STUB ([[StubCodec]]). Everything
  * around it — the schema contract, the per-partition batch iteration shape
  * (one decoder instance per partition, amortized across rows, exactly how a
  * JNI/FFmpeg handle would be held), the frame-explosion layout, and the
  * partition-parallel execution — is real and tested. Swapping StubCodec for
  * a real decoder changes no plan shape.
  */
object Multimodal {

  /** Metadata contract for a media column. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("mime", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false)))

  val FrameBytes = 256

  /** STUB decoder: deterministic fake in place of an image/audio codec.
    * A real implementation would wrap e.g. javax.imageio / ffmpeg here;
    * the function signature (bytes → frames of fixed-size feature rows)
    * is the real contract. */
  object StubCodec {
    /** "Decode" a payload into frames: fixed-size byte slices. */
    def frames(payload: Array[Byte]): Iterator[Array[Byte]] =
      payload.grouped(FrameBytes)

    /** "Feature-extract" a frame: (checksum, min, max, mean) over bytes —
      * deterministic stand-ins for an embedding/logits vector. */
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
    val rdd = media.select(col("media_id"), col("payload")).rdd
      .mapPartitions { rows =>
        // Real codec: open decoder handle here, close on iterator end.
        rows.flatMap { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          StubCodec.frames(payload).zipWithIndex.collect {
            case (frame, i) if i % everyN == 0 =>
              val (sum, mn, mx, mean) = StubCodec.features(frame)
              Row(id, i, sum, mn, mx, math.rint(mean * 10000) / 10000)
          }
        }
      }
    spark.createDataFrame(rdd, frameSchema)
  }

  /** "Resize" stub: re-chunk payloads to a target frame size — the real op
    * would transcode; the plumbing (binary→binary, metadata update) is real. */
  def resize(media: DataFrame, targetFrames: Int): DataFrame =
    media.withColumn("meta", struct(
      col("meta.mime").as("mime"),
      col("meta.width").as("width"),
      col("meta.height").as("height"),
      least(col("meta.n_frames"), lit(targetFrames)).as("n_frames")))

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
       |           FROM documents),
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_stats" -> (qMultimodalStats _))

  val oracleSql: Map[String, String] = Map(
    "multimodal_stats" -> qMultimodalStatsSql)
}
