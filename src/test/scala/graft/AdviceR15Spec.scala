package graft

import java.nio.file.{Files, Path}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{SnapshotLog, TableMeta, Warehouse}

/** Round-15 advisory fixes, spec-gated:
  *
  *  1. schema-evolution commits (addColumn / widenColumn) RECOMPUTE their
  *     pinned schema from the current commit inside the CAS closure — a
  *     concurrent append's additive column survives a lost-race rebase
  *     instead of being dropped from every subsequent read;
  *  2. the idempotency-tag probe is a manifest-HEADER scan
  *     ([[SnapshotLog.hasAction]]), not a full commit replay — linear,
  *     not quadratic, over a stream's lifetime;
  *  3. the partition-zone write guard compares NORMALIZED zones, so
  *     'UTC' vs 'Etc/UTC' (same rules, same day dirs) no longer refuses
  *     a safe write, while genuinely different zones still do;
  *  4. lost UNIQUE races clean up their zone-map sidecar alongside the
  *     aborted fragment (no orphaned stats files).
  */
class AdviceR15Spec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private def freshRoot(): Path = Files.createTempDirectory("advice_r15")

  test("hasAction: header-only probe sees committed tags and nothing else") {
    val root = freshRoot()
    val wh = new Warehouse(spark, root.toString)
    wh.overwrite("d", "t", Seq((1L, "a")).toDF("k", "v"))
    assert(wh.append("d", "t", Seq((2L, "b")).toDF("k", "v"),
      Some("stream1#0")))
    val lg = wh.log("d", "t")
    assert(lg.hasAction("stream1#0"))
    assert(!lg.hasAction("stream1#1"))
    assert(!lg.hasAction("stream1")) // exact match, not prefix
    // replay of the same tag is a no-op (exactly-once contract intact)
    assert(!wh.append("d", "t", Seq((2L, "b")).toDF("k", "v"),
      Some("stream1#0")))
    assert(wh.read("d", "t").count() === 2L)
  }

  test("schema race: concurrent append(new col) and widenColumn both survive") {
    val root = freshRoot()
    val wh = new Warehouse(spark, root.toString)
    for (round <- 1 to 6) {
      val tbl = s"race$round"
      wh.overwrite("d", tbl, Seq((1L, 10)).toDF("a", "b"))
      val barrier = new java.util.concurrent.CyclicBarrier(2)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val appender = new Thread(() => {
        try {
          val df = Seq((2L, 20, "x")).toDF("a", "b", "c")
          barrier.await()
          wh.append("d", tbl, df)
        } catch { case t: Throwable => errs.add(t) }
      })
      val widener = new Thread(() => {
        try { barrier.await(); wh.widenColumn("d", tbl, "b", "BIGINT") }
        catch { case t: Throwable => errs.add(t) }
      })
      appender.start(); widener.start(); appender.join(); widener.join()
      assert(errs.isEmpty, s"round $round: ${errs.peek()}")
      // whichever commit lost the race and rebased, BOTH evolutions are
      // in the final pinned schema — the exact hazard of pinning a
      // schema computed once from the pre-read base
      val pinned = org.apache.spark.sql.types.StructType.fromDDL(
        wh.log("d", tbl).latest.get.schemaDdl.get)
      assert(pinned.fieldNames.contains("c"),
        s"round $round: concurrent append's column dropped from pin")
      assert(pinned.fields.find(_.name == "b").get.dataType ===
        org.apache.spark.sql.types.LongType,
        s"round $round: widen dropped from pin")
      val got = wh.read("d", tbl).orderBy("a").collect()
      assert(got.map(_.getLong(0)).toSeq === Seq(1L, 2L))
      assert(got.map(_.getLong(1)).toSeq === Seq(10L, 20L))
    }
  }

  test("addColumn recomputes from the current commit (duplicate stays loud)") {
    val root = freshRoot()
    val wh = new Warehouse(spark, root.toString)
    wh.overwrite("d", "t", Seq((1L, "a")).toDF("k", "v"))
    wh.addColumn("d", "t", "n", "INT", Some("7"))
    intercept[IllegalArgumentException] {
      wh.addColumn("d", "t", "n", "INT")
    }
    assert(wh.read("d", "t").select("n").head.getInt(0) === 7)
  }

  test("widenColumn refuses a narrowing request loudly") {
    val root = freshRoot()
    val wh = new Warehouse(spark, root.toString)
    wh.overwrite("d", "t", Seq((1L, 10L)).toDF("k", "v"))
    val e = intercept[IllegalArgumentException] {
      wh.widenColumn("d", "t", "v", "INT")
    }
    assert(e.getMessage.contains("cannot widen"), e.getMessage)
  }

  test("partition-zone guard accepts an EQUIVALENT zone spelling") {
    val root = freshRoot()
    val wh = new Warehouse(spark, root.toString) // UTC session declares
    val meta = TableMeta(
      partitionField = Some("p_day"), partitionType = "date",
      partitionTransform = Some("days"), partitionSource = Some("ts"))
    def ev(s: SparkSession, ts: String, uid: Long): DataFrame = {
      import s.implicits._
      Seq((ts, uid)).toDF("tss", "uid")
        .select(to_timestamp(col("tss")).as("ts"), col("uid"))
    }
    wh.overwrite("d", "ev", ev(spark, "2024-01-05 08:00:00", 1L), meta)
    val stamped = wh.meta("d", "ev").partitionZone.get

    // same rules, different spelling: must write (was refused pre-fix)
    val equiv = spark.newSession()
    equiv.conf.set("spark.sql.session.timeZone",
      if (stamped == "UTC") "Etc/UTC" else "UTC")
    val whEquiv = new Warehouse(equiv, root.toString)
    whEquiv.insertOverwrite("d", "ev", ev(equiv, "2024-01-06 02:00:00", 2L))
    assert(wh.read("d", "ev").count() === 2L)

    // genuinely different rules: still refused loudly
    val ny = spark.newSession()
    ny.conf.set("spark.sql.session.timeZone", "America/New_York")
    val whNy = new Warehouse(ny, root.toString)
    val e = intercept[IllegalArgumentException] {
      whNy.insertOverwrite("d", "ev", ev(ny, "2024-01-07 02:00:00", 3L))
    }
    assert(e.getMessage.contains("declared its"), e.getMessage)
  }

  test("lost UNIQUE race leaves no orphaned zone-map sidecar") {
    val root = freshRoot()
    val wh = new Warehouse(spark, root.toString)
    wh.overwrite("d", "u", Seq((0L, "seed")).toDF("k", "v"),
      TableMeta(uniqueKey = Seq("k")))
    for (round <- 1 to 4) {
      val key = round.toLong
      val barrier = new java.util.concurrent.CyclicBarrier(2)
      val threads = (1 to 2).map { i =>
        new Thread(() => {
          try {
            val df = Seq((key, s"writer$i")).toDF("k", "v")
            barrier.await()
            wh.append("d", "u", df)
          } catch { case _: Throwable => () }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
    }
    // every surviving stats sidecar must belong to a LIVE fragment —
    // an aborted appender's sidecar would dangle here forever otherwise
    val td = root.resolve("d").resolve("u")
    val liveSidecars = wh.log("d", "u").latest.get.entries
      .map(e => graft.core.ZoneMaps.statsPath(td, e.path).getFileName.toString)
      .toSet
    val statsDir = td.resolve("_stats")
    if (Files.isDirectory(statsDir)) {
      import scala.jdk.CollectionConverters._
      val orphans = Files.list(statsDir).iterator().asScala
        .map(_.getFileName.toString).filterNot(liveSidecars).toSeq
      assert(orphans.isEmpty, s"orphaned sidecars: $orphans")
    }
  }
}
