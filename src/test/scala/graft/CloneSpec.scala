package graft

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Warehouse

/** Zero-copy clones: metadata-only creation, correct divergence in both
  * directions, the pin protocol that makes source-side vacuum safe, and
  * the clone-side vacuum that never reaches into the source's pool. */
class CloneSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private def freshWh(): (Warehouse, Path) = {
    val root = Files.createTempDirectory("clone_spec")
    (new Warehouse(spark, root.toString), root)
  }

  private def df(vals: Long*) = vals.map(v => (v, s"p$v")).toDF("id", "payload")

  private def parquetCount(dir: Path): Int = {
    if (!Files.isDirectory(dir)) return 0
    val w = Files.walk(dir)
    try w.iterator().asScala.count(p =>
      Files.isRegularFile(p) && p.getFileName.toString.endsWith(".parquet"))
    finally w.close()
  }

  private def ids(wh: Warehouse, ds: String, t: String): Set[Long] =
    wh.read(ds, t).select("id").as[Long].collect().toSet

  test("clone is zero-copy and reads identically; both sides diverge independently") {
    val (wh, root) = freshWh()
    wh.overwrite("d", "src", df(1L, 2L))
    wh.append("d", "src", df(3L, 4L))
    wh.cloneTable("d", "src", "dev", "clone")
    assert(parquetCount(root.resolve("dev/clone/_data")) == 0,
      "a clean-source clone must move zero data files")
    assert(ids(wh, "dev", "clone") == Set(1L, 2L, 3L, 4L))
    // diverge the clone: append + MoR delete — source must not move
    wh.append("dev", "clone", df(9L))
    wh.deleteWhereMor("dev", "clone", col("id") === 2L)
    assert(ids(wh, "dev", "clone") == Set(1L, 3L, 4L, 9L))
    assert(ids(wh, "d", "src") == Set(1L, 2L, 3L, 4L))
    // diverge the source: CoW delete — clone must not move
    wh.deleteWhere("d", "src", col("id") === 3L)
    assert(ids(wh, "d", "src") == Set(1L, 2L, 4L))
    assert(ids(wh, "dev", "clone") == Set(1L, 3L, 4L, 9L))
  }

  test("source vacuum cannot reclaim pinned fragments; dropping the clone releases the pin") {
    val (wh, _) = freshWh()
    wh.overwrite("d", "src", df(1L, 2L))
    wh.cloneTable("d", "src", "dev", "clone")
    wh.overwrite("d", "src", df(7L))   // source rewrites — old fragment now history
    val removed1 = wh.log("d", "src")
      .vacuum(0, System.currentTimeMillis() + 60000)
    assert(removed1.isEmpty, s"pinned fragment must survive vacuum: $removed1")
    assert(ids(wh, "dev", "clone") == Set(1L, 2L),
      "clone must read exactly after source vacuum")
    wh.drop("dev", "clone")
    assert(wh.log("d", "src").tags.isEmpty, "drop must release the pin")
    val removed2 = wh.log("d", "src")
      .vacuum(0, System.currentTimeMillis() + 60000)
    assert(removed2.size == 1, s"released fragment must now reclaim: $removed2")
  }

  test("clone-side vacuum never touches foreign refs") {
    val (wh, _) = freshWh()
    wh.overwrite("d", "src", df(1L, 2L))
    wh.cloneTable("d", "src", "dev", "clone")
    wh.overwrite("dev", "clone", df(5L))  // clone's live state drops all foreign refs
    val removed = wh.log("dev", "clone")
      .vacuum(0, System.currentTimeMillis() + 60000)
    assert(removed.isEmpty,
      s"foreign refs are not the clone's to reclaim: $removed")
    assert(ids(wh, "d", "src") == Set(1L, 2L), "source data must be intact")
  }

  test("MoR-masked source entries materialize into the clone; masks stay exact") {
    val (wh, root) = freshWh()
    wh.overwrite("d", "src", df(1L, 2L))
    wh.append("d", "src", df(3L, 4L))
    wh.deleteWhereMor("d", "src", col("id") === 3L)
    wh.cloneTable("d", "src", "dev", "clone")
    assert(ids(wh, "dev", "clone") == Set(1L, 2L, 4L),
      "the clone must not resurrect masked rows")
    assert(parquetCount(root.resolve("dev/clone/_data")) > 0,
      "the masked entry must have materialized into the clone's pool")
    // the un-masked fragment stayed zero-copy: exactly one entry is local
    val local = wh.log("dev", "clone").latest.get.entries
      .count(e => !java.nio.file.Paths.get(e.path).isAbsolute)
    assert(local == 1, s"expected exactly the masked entry local, got $local")
  }

  test("zone-map sidecars travel: pruned reads prune on the clone too") {
    val (wh, _) = freshWh()
    wh.overwrite("d", "src",
      spark.range(0, 1000).select(col("id"), lit("x").as("payload")))
    wh.append("d", "src",
      spark.range(1000, 2000).select(col("id"), lit("y").as("payload")))
    wh.cloneTable("d", "src", "dev", "clone")
    val (files, total) = wh.scanFootprint("dev", "clone", col("id") < 500L)
    assert(total > files && files >= 1,
      s"clone must zone-prune like the source: $files of $total")
  }

  test("clone of a clone is refused; cloning over an existing table is refused") {
    val (wh, _) = freshWh()
    wh.overwrite("d", "src", df(1L))
    wh.cloneTable("d", "src", "dev", "c1")
    intercept[IllegalArgumentException] {
      wh.cloneTable("dev", "c1", "dev", "c2")
    }
    wh.overwrite("d", "other", df(2L))
    intercept[IllegalArgumentException] {
      wh.cloneTable("d", "src", "d", "other")
    }
  }
}
