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
