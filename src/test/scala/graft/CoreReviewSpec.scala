package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.{BloomIndex, SnapshotLog, TableMeta, Warehouse, ZoneMaps}

/** Regression gates for the round-16 core review pass (SnapshotLog /
  * ZoneMaps / BloomIndex sidecar plumbing). */
class CoreReviewSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  test("fragment dirs use the FULL uuid — a 32-bit prefix reaches 50% " +
    "birthday-collision odds near 65k fragments and a colliding writer " +
    "overwrites live data") {
    val lg = new SnapshotLog(Files.createTempDirectory("frag_names"))
    val names = (1 to 20).map(_ => lg.newFragmentDir().getFileName.toString)
    assert(names.forall(_.length == 36), s"truncated fragment name: $names")
    assert(names.distinct.size == names.size)
  }

  test("sidecar names are injective: partition values that flatten alike " +
    "must not share (and silently overwrite) one zone-map sidecar") {
    val td = Paths.get("/tmp")
    // the old lossy scheme mapped both of these to `..._day_x_y.json`
    assert(ZoneMaps.statsPath(td, "frag/day=x y") !==
      ZoneMaps.statsPath(td, "frag/day=x+y"))
    assert(BloomIndex.bloomPath(td, "frag/day=x y") !==
      BloomIndex.bloomPath(td, "frag/day=x+y"))
  }

  test("time travel keeps serving a default declared before a rename " +
    "(meta is unversioned; the rename chain is the version map)") {
    import spark.implicits._
    val wh = new Warehouse(spark, Files.createTempDirectory("tt_default").toString)
    wh.overwrite("d", "t", Seq((1L, 10L)).toDF("k", "a")) // fragment lacks v
    wh.addColumn("d", "t", "v", "BIGINT", Some("5"))
    val pinned = wh.log("d", "t").latest.get.version
    wh.renameColumn("d", "t", "v", "w")
    // current read serves the default under the NEW name...
    assert(wh.read("d", "t").select("w").head.getLong(0) === 5L)
    // ...and the pinned read under the name THAT commit knew (the bug:
    // renameColumn re-keys columnDefaults, so the as-of lookup missed
    // and history flipped from 5 to NULL)
    assert(wh.readVersion("d", "t", pinned).select("v").head.getLong(0) === 5L)
    // chain composition: a second rename must not break the back-walk
    wh.renameColumn("d", "t", "w", "x")
    assert(wh.readVersion("d", "t", pinned).select("v").head.getLong(0) === 5L)
    assert(wh.read("d", "t").select("x").head.getLong(0) === 5L)
    // the deletion-vector read path shares the as-of mapping: mask one
    // row via MoR on a two-row table, then time travel through the dv
    wh.append("d", "t", Seq((2L, 20L, 7L)).toDF("k", "a", "x"))
    val v2 = wh.log("d", "t").latest.get.version
    wh.deleteWhereMor("d", "t", col("k") === 2L)
    val v3 = wh.log("d", "t").latest.get.version
    assert(wh.readVersion("d", "t", v3).orderBy("k")
      .select("x").as[Long].collect().toSeq === Seq(5L))
    assert(wh.readVersion("d", "t", v2).orderBy("k")
      .select("x").as[Long].collect().toSeq === Seq(5L, 7L))
  }

  test("restore reconciles rename metadata: the chain gets compensating " +
    "links and name-keyed meta re-keys to the restored names") {
    import spark.implicits._
    val wh = new Warehouse(spark, Files.createTempDirectory("rr_fix").toString)
    wh.overwrite("d", "t", Seq((1L, 10L)).toDF("k", "v"),
      TableMeta(uniqueKey = Seq("k")))
    wh.addColumn("d", "t", "dft", "BIGINT", Some("5"))
    val v1 = wh.log("d", "t").latest.get.version
    wh.renameColumn("d", "t", "v", "w")
    val v2 = wh.log("d", "t").latest.get.version
    wh.restoreToVersion("d", "t", v1)
    // the restored CURRENT state serves the restored names + default
    assert(wh.read("d", "t").select("v", "dft").head() ===
      org.apache.spark.sql.Row(10L, 5L))
    // the bug: a rename of the RESTORED name forked the chain
    // ((v,w) then (v,z)) and physical-v fragments read NULL under z
    wh.renameColumn("d", "t", "v", "z")
    assert(wh.read("d", "t").select("z").head().getLong(0) === 10L)
    // every pinned schema keeps serving ITS names over the SAME bytes
    assert(wh.readVersion("d", "t", v2).select("w").head().getLong(0) === 10L)
    assert(wh.readVersion("d", "t", v1).select("v").head().getLong(0) === 10L)
    // the UNIQUE key survives the rename chain: a key rename re-keys
    // enforcement, and the standing probe still refuses duplicates
    wh.renameColumn("d", "t", "k", "kk")
    wh.append("d", "t", Seq((2L, 20L, 7L)).toDF("kk", "z", "dft"))
    val dup = intercept[IllegalArgumentException] {
      wh.append("d", "t", Seq((2L, 99L, 9L)).toDF("kk", "z", "dft"))
    }
    assert(dup.getMessage.contains("UNIQUE"))
  }

  test("sidecar cache: write-through coherence and delete visibility") {
    val td = Files.createTempDirectory("sidecar_cache")
    val st1 = ZoneMaps.FragStats(10L,
      Map("k" -> ZoneMaps.ColStat(Some("1"), Some("5"), 0L, "long")))
    ZoneMaps.write(td, "frag/a", st1)
    assert(ZoneMaps.read(td, "frag/a").contains(st1))
    // a re-write (hand-built states only in practice) must serve the
    // NEW stats, never a stale cache entry
    val st2 = st1.copy(rows = 20L)
    ZoneMaps.write(td, "frag/a", st2)
    assert(ZoneMaps.read(td, "frag/a").contains(st2))
    // out-of-band sidecar deletion must read as "no stats — no pruning"
    // even after the cache was populated (stat-on-hit contract)
    Files.delete(ZoneMaps.statsPath(td, "frag/a"))
    assert(ZoneMaps.read(td, "frag/a").isEmpty)
    // vacuumStats invalidates too
    ZoneMaps.write(td, "frag/b", st1)
    assert(ZoneMaps.read(td, "frag/b").isDefined)
    ZoneMaps.vacuumStats(td, Set.empty)
    assert(ZoneMaps.read(td, "frag/b").isEmpty)
  }

  test("zone pruning stays sound across sidecar-colliding partition values") {
    val wh = new Warehouse(spark, Files.createTempDirectory("collide").toString)
    // two partitions whose values collide under a lossy flattening; their
    // id ranges are disjoint, so consulting the WRONG sidecar would prune
    // the fragment that holds the match
    wh.overwrite("d", "t",
      ((1L to 5L).map(i => (i, "x y")) ++ (100L to 105L).map(i => (i, "x+y")))
        .toDF("id", "p"),
      TableMeta(partitionField = Some("p"), partitionType = "string"))
    val (scan, _) = wh.planScan("d", "t", col("id") === 100L)
    assert(scan.nonEmpty, "the matching partition was pruned away")
    assert(wh.read("d", "t").filter(col("id") === 100L).count() === 1L)
    assert(wh.read("d", "t").filter(col("id") === 3L).count() === 1L)
    // and the delete path (same planFiles machinery) hits exactly one row
    assert(wh.deleteWhere("d", "t", col("id") === 100L).deletedRows === 1L)
    assert(wh.read("d", "t").count() === 10L)
  }
}
