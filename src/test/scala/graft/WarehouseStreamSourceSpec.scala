package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.core.Warehouse

/** The commit-log streaming source (`format("graft-table")`): initial
  * snapshot + append-only tailing, WAP-staged data invisible, MoR masks
  * applied, non-append-only spans fail loudly, checkpoint restarts
  * resume at the consumed version. */
class WarehouseStreamSourceSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private def fresh(): Warehouse =
    new Warehouse(spark, Files.createTempDirectory("whstream").toString)

  private def startStream(wh: Warehouse, name: String, ckpt: String) =
    spark.readStream.format("graft-table")
      .option("root", wh.root).option("dataset", "d").option("table", "t")
      .load()
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(0))
      .start()

  test("initial snapshot, append tailing, and WAP invisibility") {
    val wh = fresh()
    wh.overwrite("d", "t", Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    val ckpt = Files.createTempDirectory("whstream_ck").toString
    val q = startStream(wh, "wss_tail", ckpt)
    try {
      q.processAllAvailable()
      def drained: Seq[(Long, String)] =
        spark.table("wss_tail").orderBy("id").collect()
          .map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(drained === Seq((1L, "a"), (2L, "b")), "initial snapshot")
      // append flows through as exactly the delta
      wh.append("d", "t", Seq((3L, "c")).toDF("id", "s"))
      q.processAllAvailable()
      assert(drained === Seq((1L, "a"), (2L, "b"), (3L, "c")))
      // WAP-staged rows are INVISIBLE until published
      wh.stageAppend("d", "t", Seq((4L, "staged")).toDF("id", "s"))
      q.processAllAvailable()
      assert(drained === Seq((1L, "a"), (2L, "b"), (3L, "c")),
        "staged rows must not leak into the stream")
      wh.publishStaged("d", "t")
      q.processAllAvailable()
      assert(drained === Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "staged")))
      // drained stream ≡ batch read, the headline identity
      assert(drained === wh.read("d", "t").orderBy("id").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq)
    } finally q.stop()
  }

  private def startForeach(wh: Warehouse, ckpt: String,
                           sink: java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]) =
    spark.readStream.format("graft-table")
      .option("root", wh.root).option("dataset", "d").option("table", "t")
      .load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach(r => sink.add((r.getLong(0), r.getString(1))))
      }.start()

  test("checkpoint restart resumes at the consumed version (no replay)") {
    val wh = fresh()
    wh.overwrite("d", "t", Seq((1L, "a")).toDF("id", "s"))
    val ckpt = Files.createTempDirectory("whstream_ck2").toString
    val sink = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    val q1 = startForeach(wh, ckpt, sink)
    try { q1.processAllAvailable() } finally q1.stop()
    assert(sink.size === 1)
    sink.clear()
    wh.append("d", "t", Seq((2L, "b")).toDF("id", "s"))
    val q2 = startForeach(wh, ckpt, sink)
    try {
      q2.processAllAvailable()
      // only the appended delta arrives after restart: no snapshot replay
      assert(sink.toArray.toSeq === Seq((2L, "b")),
        s"restart must replay only the delta, got ${sink.toArray.toSeq}")
    } finally q2.stop()
  }

  test("a MoR-deleted table streams its MASKED initial snapshot") {
    val wh = fresh()
    wh.overwrite("d", "t", Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s"))
    wh.deleteWhereMor("d", "t", col("id") === 2L)
    val ckpt = Files.createTempDirectory("whstream_ck3").toString
    val q = startStream(wh, "wss_mor", ckpt)
    try {
      q.processAllAvailable()
      assert(spark.table("wss_mor").orderBy("id").select("id").as[Long]
        .collect().toSeq === Seq(1L, 3L))
    } finally q.stop()
  }

  test("sink: a file stream lands in the warehouse exactly once, restart-safe") {
    val wh = fresh()
    wh.overwrite("d", "t", Seq((0L, "seed")).toDF("id", "s"))
    val srcDir = Files.createTempDirectory("whsink_src")
    Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .write.mode("overwrite").parquet(srcDir.toString)
    val schema = spark.read.parquet(srcDir.toString).schema
    val ckpt = Files.createTempDirectory("whsink_ck").toString
    def run(): Unit = {
      val q = spark.readStream.schema(schema).parquet(srcDir.toString)
        .writeStream.format("graft-table")
        .option("root", wh.root).option("dataset", "d").option("table", "t")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.ProcessingTime(0))
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    assert(wh.read("d", "t").count() === 3L)
    // restart on the same checkpoint with one NEW source file: only the
    // new rows land, nothing replays
    Seq((3L, "c")).toDF("id", "s").write.mode("append").parquet(srcDir.toString)
    run()
    assert(wh.read("d", "t").orderBy("id").select("id").as[Long].collect().toSeq
      === Seq(0L, 1L, 2L, 3L))
  }

  test("sink: a replayed batch id commits exactly once (zombie-safe CAS tag)") {
    val wh = fresh()
    wh.overwrite("d", "t", Seq((0L, "seed")).toDF("id", "s"))
    val tag = Some("append stream=spec batch=7")
    assert(wh.append("d", "t", Seq((1L, "a")).toDF("id", "s"), tag) === true)
    // an unrelated append in between must not unblock the replay
    wh.append("d", "t", Seq((2L, "b")).toDF("id", "s"))
    assert(wh.append("d", "t", Seq((1L, "dup")).toDF("id", "s"), tag) === false,
      "replayed tag must be skipped")
    assert(wh.read("d", "t").count() === 3L)
    assert(wh.read("d", "t").filter(col("s") === "dup").count() === 0L)
    assert(wh.orphanFiles("d", "t", graceMillis = 0L).isEmpty,
      "the skipped replay must not leave its fragment behind")
  }

  test("sink: PARTITIONED target takes the hive-fragment append path") {
    import graft.core.TableMeta
    val wh = fresh()
    val mkDay = (d: String, ids: Seq[Long]) => ids.map(i => (i, d)).toDF("id", "day")
      .select(col("id"), to_date(col("day")).as("day"))
    wh.overwrite("d", "t", mkDay("2024-01-01", Seq(1L)),
      TableMeta(partitionField = Some("day"), partitionType = "date"))
    val srcDir = Files.createTempDirectory("whsink_psrc")
    mkDay("2024-01-01", Seq(2L)).unionAll(mkDay("2024-01-02", Seq(3L, 4L)))
      .write.mode("overwrite").parquet(srcDir.toString)
    val schema = spark.read.parquet(srcDir.toString).schema
    val ckpt = Files.createTempDirectory("whsink_pck").toString
    val q = spark.readStream.schema(schema).parquet(srcDir.toString)
      .writeStream.format("graft-table")
      .option("root", wh.root).option("dataset", "d").option("table", "t")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(wh.read("d", "t").count() === 4L)
    val parts = wh.log("d", "t").latest.get.entries.map(_.partition)
    // day 01 now has TWO entries (seed + streamed batch) — the
    // partitioned-append layout; compact folds them back to one
    assert(parts.count(_ == "2024-01-01") === 2)
    assert(parts.contains("2024-01-02"))
    wh.compact("d", "t")
    val after = wh.log("d", "t").latest.get.entries.map(_.partition)
    assert(after.count(_ == "2024-01-01") === 1, s"compact must fold: $after")
    assert(wh.read("d", "t").count() === 4L)
    // partition pruning still works across the multi-entry layout
    assert(wh.readPartitions("d", "t", Seq("2024-01-02")).count() === 2L)
  }

  test("appendPartitioned: idempotency tag + UNIQUE key enforcement") {
    import graft.core.TableMeta
    val wh = fresh()
    val mk = (ids: Seq[Long]) => ids.map(i => (i, "2024-01-01")).toDF("id", "day")
      .select(col("id"), to_date(col("day")).as("day"))
    wh.overwrite("d", "t", mk(Seq(1L)),
      TableMeta(partitionField = Some("day"), partitionType = "date",
        uniqueKey = Seq("id", "day")))
    val tag = Some("append stream=ps batch=1")
    assert(wh.appendPartitioned("d", "t", mk(Seq(2L)), tag) === true)
    assert(wh.appendPartitioned("d", "t", mk(Seq(2L)), tag) === false,
      "replayed tag must skip")
    assert(wh.read("d", "t").count() === 2L)
    // duplicate key rejects loudly through the standing probe
    intercept[IllegalArgumentException] {
      wh.appendPartitioned("d", "t", mk(Seq(2L)))
    }
    assert(wh.orphanFiles("d", "t", graceMillis = 0L).isEmpty)
  }

  test("source tails a PARTITIONED table across partitioned appends") {
    import graft.core.TableMeta
    val wh = fresh()
    val mk = (d: String, ids: Seq[Long]) => ids.map(i => (i, d)).toDF("id", "day")
      .select(col("id"), to_date(col("day")).as("day"))
    wh.overwrite("d", "t", mk("2024-01-01", Seq(1L)),
      TableMeta(partitionField = Some("day"), partitionType = "date"))
    val ckpt = Files.createTempDirectory("whstream_pck").toString
    val q = startStream(wh, "wss_part", ckpt)
    try {
      q.processAllAvailable()
      wh.appendPartitioned("d", "t",
        mk("2024-01-01", Seq(2L)).unionAll(mk("2024-01-02", Seq(3L))))
      q.processAllAvailable()
      val got = spark.table("wss_part").orderBy("id")
        .collect().map(r => (r.getLong(0), r.getDate(1).toString))
      assert(got.toSeq === Seq((1L, "2024-01-01"), (2L, "2024-01-01"),
        (3L, "2024-01-02")), s"got ${got.mkString}")
    } finally q.stop()
  }

  test("sink: refuses non-append modes and demands a stream identity") {
    val wh = fresh()
    wh.overwrite("d", "t", Seq((0L, "seed")).toDF("id", "s"))
    val provider = new graft.streaming.WarehouseSourceProvider
    val params = Map("root" -> wh.root, "dataset" -> "d", "table" -> "t",
      "checkpointLocation" -> "/tmp/ck")
    intercept[IllegalArgumentException] {
      provider.createSink(spark.sqlContext, params, Seq.empty,
        org.apache.spark.sql.streaming.OutputMode.Complete())
    }
    intercept[IllegalArgumentException] {
      provider.createSink(spark.sqlContext, params - "checkpointLocation",
        Seq.empty, org.apache.spark.sql.streaming.OutputMode.Append())
    }
  }

  test("a non-append-only span fails the stream loudly") {
    val wh = fresh()
    wh.overwrite("d", "t", Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    val ckpt = Files.createTempDirectory("whstream_ck4").toString
    val sink = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    val q1 = startForeach(wh, ckpt, sink)
    try { q1.processAllAvailable() } finally q1.stop()
    wh.deleteWhere("d", "t", col("id") === 1L) // rewrite commit mid-stream
    wh.append("d", "t", Seq((5L, "e")).toDF("id", "s"))
    val q2 = startForeach(wh, ckpt, sink)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.processAllAvailable(); q2.awaitTermination(10000)
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    assert(causes(e).exists(c => Option(c.getMessage)
      .exists(_.contains("not append-only"))), e.getMessage)
  }

  test("a column RENAMED mid-stream keeps serving under the declared name") {
    val wh = fresh()
    wh.overwrite("d", "t", Seq((1L, "a")).toDF("id", "s"))
    val ckpt = Files.createTempDirectory("whstream_ck5").toString
    val q = startStream(wh, "wss_rename", ckpt)
    try {
      q.processAllAvailable()
      wh.renameColumn("d", "t", "s", "s2")
      wh.append("d", "t", Seq((2L, "b")).toDF("id", "s2"))
      q.processAllAvailable()
      // the stream declared (id, s) at start: the renamed column's DATA
      // must keep flowing under the declared name, not pad to null
      val got = spark.table("wss_rename").orderBy("id").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(got === Seq((1L, "a"), (2L, "b")),
        s"renamed column's data was dropped from the stream: $got")
    } finally q.stop()
  }

  test("a mid-stream DROP TABLE fails the query loudly, never idles") {
    val wh = fresh()
    wh.overwrite("d", "t", Seq((1L, "a")).toDF("id", "s"))
    val ckpt = Files.createTempDirectory("whstream_ck6").toString
    val q = startStream(wh, "wss_drop", ckpt)
    try {
      q.processAllAvailable()
      wh.drop("d", "t")
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable(); q.awaitTermination(10000)
      }
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Seq.empty else t +: causes(t.getCause)
      assert(causes(e).exists(c => Option(c.getMessage)
        .exists(_.contains("DROPPED"))), e.getMessage)
    } finally q.stop()
  }
}
