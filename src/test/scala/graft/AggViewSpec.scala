package graft

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.{AggView, Warehouse}
import graft.core.AggView.AggSpec

/** Incrementally-maintained materialized aggregate views: the
  * incremental ≡ full-rebuild identity, the O(new data) refresh contract
  * (proved by deleting the old source fragments from disk), and the
  * loud fallback to full rebuild whenever the span is not append-only. */
class AggViewSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private def freshWh(): (Warehouse, Path) = {
    val root = Files.createTempDirectory("aggview_spec")
    (new Warehouse(spark, root.toString), root)
  }

  private val specs = Seq(
    AggSpec("n", "count"),
    AggSpec("total", "sum", "v"),
    AggSpec("lo", "min", "v"),
    AggSpec("hi", "max", "v"))

  private def rows(df: DataFrame): Set[(String, Long, Long, Long, Long)] =
    df.select(col("k"), col("n").cast("long"), col("total").cast("long"),
      col("lo").cast("long"), col("hi").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet

  private def mkDf(kv: (String, Long)*): DataFrame =
    kv.toDF("k", "v")

  test("incremental refresh equals a one-shot build (merge across groups, negatives)") {
    val (wh, _) = freshWh()
    // phase 1: groups a (2 rows, negative values) and b
    wh.overwrite("d", "src", mkDf("a" -> -5L, "a" -> 2L, "b" -> 10L))
    AggView.create(wh, "d", "mv", "d", "src", Seq("k"), specs)
    // phase 2: extends a, adds c — a must MERGE, b pass through, c appear
    wh.append("d", "src", mkDf("a" -> -9L, "c" -> 7L))
    val r = AggView.refresh(wh, "d", "mv")
    assert(r.mode == "incremental", r)
    assert(rows(wh.read("d", "mv")) == Set(
      ("a", 3L, -12L, -9L, 2L), ("b", 1L, 10L, 10L, 10L),
      ("c", 1L, 7L, 7L, 7L)))
    // identity vs a from-scratch view over the same source
    AggView.create(wh, "d", "mv2", "d", "src", Seq("k"), specs)
    assert(rows(wh.read("d", "mv")) == rows(wh.read("d", "mv2")))
  }

  test("incremental refresh never reads pre-existing source fragments") {
    val (wh, root) = freshWh()
    wh.overwrite("d", "src", mkDf("a" -> 1L, "b" -> 2L))
    AggView.create(wh, "d", "mv", "d", "src", Seq("k"), specs)
    val oldEntries = wh.log("d", "src").latest.get.entries
    wh.append("d", "src", mkDf("a" -> 3L, "c" -> 4L))
    // destroy the phase-1 fragment files on disk: at 100 TB they would be
    // cold storage the refresh must not touch — if the refresh scans
    // anything but the delta, it now fails loudly instead
    oldEntries.foreach { e =>
      val f = root.resolve("d/src").resolve(e.path)
      val w = Files.walk(f.getParent)
      try w.iterator().asScala.toSeq.reverse
        .filter(p => p.startsWith(f) || p == f).foreach(Files.deleteIfExists(_))
      finally w.close()
    }
    val r = AggView.refresh(wh, "d", "mv")
    assert(r.mode == "incremental", r)
    assert(rows(wh.read("d", "mv")) == Set(
      ("a", 2L, 4L, 1L, 3L), ("b", 1L, 2L, 2L, 2L), ("c", 1L, 4L, 4L, 4L)))
  }

  test("noop when source unchanged; watermark advances per refresh") {
    val (wh, _) = freshWh()
    wh.overwrite("d", "src", mkDf("a" -> 1L))
    AggView.create(wh, "d", "mv", "d", "src", Seq("k"), specs)
    assert(AggView.refresh(wh, "d", "mv").mode == "noop")
    wh.append("d", "src", mkDf("a" -> 2L))
    assert(AggView.refresh(wh, "d", "mv").mode == "incremental")
    assert(AggView.refresh(wh, "d", "mv").mode == "noop")
  }

  test("CoW delete in the span forces a full rebuild, values exact") {
    val (wh, _) = freshWh()
    wh.overwrite("d", "src", mkDf("a" -> 1L, "a" -> 5L, "b" -> 2L))
    AggView.create(wh, "d", "mv", "d", "src", Seq("k"), specs)
    wh.append("d", "src", mkDf("b" -> 9L))
    wh.deleteWhere("d", "src", col("v") === 5L)
    val r = AggView.refresh(wh, "d", "mv")
    assert(r.mode == "full", r)
    assert(rows(wh.read("d", "mv")) == Set(
      ("a", 1L, 1L, 1L, 1L), ("b", 2L, 11L, 2L, 9L)))
  }

  test("compaction in the span forces a full rebuild") {
    val (wh, _) = freshWh()
    wh.overwrite("d", "src", mkDf("a" -> 1L))
    AggView.create(wh, "d", "mv", "d", "src", Seq("k"), specs)
    wh.append("d", "src", mkDf("a" -> 2L))
    wh.append("d", "src", mkDf("a" -> 3L))
    assert(wh.compact("d", "src").nonEmpty)
    val r = AggView.refresh(wh, "d", "mv")
    assert(r.mode == "full", r)
    assert(rows(wh.read("d", "mv")) == Set(("a", 3L, 6L, 1L, 3L)))
  }

  test("MoR delete of PRE-EXISTING rows forces full; of in-span rows stays incremental") {
    val (wh, _) = freshWh()
    wh.overwrite("d", "src", mkDf("a" -> 1L, "b" -> 2L))
    AggView.create(wh, "d", "mv", "d", "src", Seq("k"), specs)
    // span: append then MoR-delete only a row APPENDED in the span — the
    // old entries keep (path, dv), the delta's masked read IS the net
    // contribution, so the fast path remains sound
    wh.append("d", "src", mkDf("a" -> 3L, "c" -> 4L))
    wh.deleteWhereMor("d", "src", col("v") === 3L)
    val r1 = AggView.refresh(wh, "d", "mv")
    assert(r1.mode == "incremental", r1)
    assert(rows(wh.read("d", "mv")) == Set(
      ("a", 1L, 1L, 1L, 1L), ("b", 1L, 2L, 2L, 2L), ("c", 1L, 4L, 4L, 4L)))
    // next span: MoR-delete a PRE-EXISTING row — the old entry's dv
    // pointer moves, identity broken, must rebuild
    wh.deleteWhereMor("d", "src", col("v") === 2L)
    val r2 = AggView.refresh(wh, "d", "mv")
    assert(r2.mode == "full", r2)
    assert(rows(wh.read("d", "mv")) == Set(
      ("a", 1L, 1L, 1L, 1L), ("c", 1L, 4L, 4L, 4L)))
  }

  test("MV states are snapshot-logged: pre-refresh state stays time-travelable") {
    val (wh, _) = freshWh()
    wh.overwrite("d", "src", mkDf("a" -> 1L))
    AggView.create(wh, "d", "mv", "d", "src", Seq("k"), specs)
    wh.append("d", "src", mkDf("a" -> 10L))
    AggView.refresh(wh, "d", "mv")
    assert(rows(wh.readVersion("d", "mv", 1)) == Set(("a", 1L, 1L, 1L, 1L)))
    assert(rows(wh.read("d", "mv")) == Set(("a", 2L, 11L, 1L, 10L)))
  }

  test("config validation: bad func, duplicate outputs, non-view table") {
    val (wh, _) = freshWh()
    wh.overwrite("d", "src", mkDf("a" -> 1L))
    intercept[IllegalArgumentException] { AggSpec("x", "avg", "v") }
    intercept[IllegalArgumentException] {
      AggView.create(wh, "d", "mv", "d", "src", Seq("k"),
        Seq(AggSpec("n", "count"), AggSpec("n", "sum", "v")))
    }
    intercept[IllegalArgumentException] { AggView.config(wh, "d", "src") }
  }

  private val retractSpecs = Seq(AggSpec("n", "count"), AggSpec("total", "sum", "v"))

  private def retractRows(df: DataFrame): Set[(String, Long, Long)] =
    df.select(col("k"), col("n").cast("long"), col("total").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  test("retractable view: CoW delete refreshes via retraction, emptied group drops") {
    val (wh, _) = freshWh()
    wh.overwrite("d", "src", mkDf("a" -> 1L, "a" -> 5L, "b" -> 2L, "c" -> 8L))
    AggView.create(wh, "d", "mv", "d", "src", Seq("k"), retractSpecs)
    wh.append("d", "src", mkDf("b" -> 9L))
    // deletes ALL of group c and one of a — c must vanish from the view
    wh.deleteWhere("d", "src", col("v") === 5L || col("k") === "c")
    val r = AggView.refresh(wh, "d", "mv")
    assert(r.mode == "incremental_retract", r)
    assert(retractRows(wh.read("d", "mv")) == Set(
      ("a", 1L, 1L), ("b", 2L, 11L)))
  }

  test("retractable view: MoR delete of pre-existing rows retracts, not rebuilds") {
    val (wh, _) = freshWh()
    wh.overwrite("d", "src", mkDf("a" -> 1L, "a" -> 5L, "b" -> 2L))
    AggView.create(wh, "d", "mv", "d", "src", Seq("k"), retractSpecs)
    wh.deleteWhereMor("d", "src", col("v") === 5L)
    val r = AggView.refresh(wh, "d", "mv")
    assert(r.mode == "incremental_retract", r)
    assert(retractRows(wh.read("d", "mv")) == Set(
      ("a", 1L, 1L), ("b", 1L, 2L)))
  }

  test("retractable view: compaction nets to zero exactly") {
    val (wh, _) = freshWh()
    wh.overwrite("d", "src", mkDf("a" -> 1L))
    AggView.create(wh, "d", "mv", "d", "src", Seq("k"), retractSpecs)
    wh.append("d", "src", mkDf("a" -> 2L))
    wh.append("d", "src", mkDf("b" -> 3L))
    AggView.refresh(wh, "d", "mv")
    assert(wh.compact("d", "src").nonEmpty)
    val r = AggView.refresh(wh, "d", "mv")
    assert(r.mode == "incremental_retract", r)
    assert(retractRows(wh.read("d", "mv")) == Set(
      ("a", 2L, 3L), ("b", 1L, 3L)))
  }

  test("sum-only view (no count) cannot drop emptied groups: falls back to full") {
    val (wh, _) = freshWh()
    wh.overwrite("d", "src", mkDf("a" -> 1L, "b" -> 2L))
    AggView.create(wh, "d", "mv", "d", "src", Seq("k"),
      Seq(AggSpec("total", "sum", "v")))
    wh.deleteWhere("d", "src", col("k") === "b")
    val r = AggView.refresh(wh, "d", "mv")
    assert(r.mode == "full", r)
    assert(wh.read("d", "mv").select("k", "total").as[(String, Long)]
      .collect().toSet == Set(("a", 1L)))
  }

  test("appendedBetween: append-only spans return exactly the delta; rewrites return None") {
    val (wh, _) = freshWh()
    wh.overwrite("d", "t", mkDf("a" -> 1L))
    wh.append("d", "t", mkDf("b" -> 2L))
    wh.append("d", "t", mkDf("c" -> 3L))
    val d = wh.appendedBetween("d", "t", 1, 3)
    assert(d.isDefined)
    assert(d.get.select("k", "v").as[(String, Long)].collect().toSet ==
      Set(("b", 2L), ("c", 3L)))
    assert(wh.appendedBetween("d", "t", 2, 2).get.count() == 0L)
    wh.overwrite("d", "t", mkDf("z" -> 9L))
    assert(wh.appendedBetween("d", "t", 1, 4).isEmpty)
  }
}
