package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured-Streaming expression of the reference's scheduled
  * incremental refresh (SURVEY §2.8): the reference has no true streaming
  * operators — its `hourly`/`daily` tags (core/project.py:308-317) and
  * `insert_overwrite` incremental strategy (model/create.py:456-465) are
  * batch refreshes on a schedule. `Trigger.AvailableNow` is the faithful
  * Spark-native mapping: each invocation processes exactly the data that
  * has arrived, with watermarked event-time windows, then stops — a
  * micro-batch "catch-up" run that scales to a continuous stream by
  * changing only the trigger.
  */
object StreamingIncremental {

  /** Watermarked tumbling-window aggregate over an event stream read from
    * parquet, delivered via foreachBatch into `sink` (complete mode — the
    * run is bounded, AvailableNow). Returns after the stream drains.
    *
    * At scale: the same pipeline with a kafka source + `Trigger
    * .ProcessingTime` and `foreachBatch` doing insertOverwrite of the
    * touched date partitions is the continuous form; nothing else changes.
    */
  def runHourlyCounts(spark: SparkSession, eventsDir: String,
                      checkpointDir: String)(sink: DataFrame => Unit): Unit = {
    val statics = spark.read.parquet(eventsDir)
    // The file-stream source monitors a DIRECTORY (a landing zone). The
    // fixture is a single parquet file, so stage it into a scratch landing
    // dir — exactly how arriving micro-batch files would land in practice.
    val src = new java.io.File(eventsDir)
    val landing = java.nio.file.Files.createTempDirectory("graft_landing")
    java.nio.file.Files.copy(src.toPath, landing.resolve(src.getName))
    val stream = spark.readStream
      .schema(statics.schema)
      .parquet(landing.toString)
    val withTs =
      if (stream.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        stream.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else stream
    val agg = withTs
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("hour"), col("event_type"), col("n"), col("sum_value"))
    val q = agg.writeStream
      .outputMode("complete")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) => sink(batch) }
      .start()
    q.awaitTermination()
  }
}
