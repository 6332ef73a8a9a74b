package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Warehouse

/** Snapshot tags: named refs that pin a version past vacuum forever —
  * the manifest survives (re-checkpointed to a self-contained full state
  * when its delta ancestry dies), the fragments survive, and untagged
  * expired versions still reclaim. */
class SnapshotTagSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private def freshWh(): Warehouse =
    new Warehouse(spark, Files.createTempDirectory("tag_spec").toString)

  private def df(vals: Long*) = vals.map(v => (v, s"p$v")).toDF("id", "payload")

  test("tag/readTag roundtrip; bad names and versions reject") {
    val wh = freshWh()
    wh.overwrite("d", "t", df(1L, 2L))
    wh.append("d", "t", df(3L))
    val lg = wh.log("d", "t")
    lg.tag("baseline", 1)
    assert(lg.tags == Map("baseline" -> 1))
    assert(wh.readTag("d", "t", "baseline").count() == 2L)
    intercept[IllegalArgumentException] { lg.tag("bad name", 1) }
    intercept[IllegalArgumentException] { lg.tag("v9", 99) }
    intercept[IllegalArgumentException] { wh.readTag("d", "t", "nope") }
  }

  test("vacuum keeps a tagged mid-history version (manifest + fragments), drops untagged") {
    val wh = freshWh()
    wh.overwrite("d", "t", df(1L))          // v1 (will expire, untagged)
    wh.append("d", "t", df(2L))             // v2 (tagged)
    wh.append("d", "t", df(3L))             // v3 (will expire, untagged)
    wh.overwrite("d", "t", df(9L))          // v4 latest — drops refs to f1..f3
    val lg = wh.log("d", "t")
    lg.tag("keep", 2)
    val removed = lg.vacuum(retainMillis = 0,
      nowMillis = System.currentTimeMillis() + 60000)
    // v2's state = fragments of v1+v2 — BOTH pinned by the tag; only
    // v3's fragment is reclaimable
    assert(removed.size == 1, s"expected exactly v3's fragment gone: $removed")
    assert(lg.version(1).isEmpty && lg.version(3).isEmpty,
      "untagged expired manifests must be gone")
    assert(wh.readTag("d", "t", "keep").select("id").as[Long].collect().toSet
      == Set(1L, 2L), "tagged snapshot must read exactly past vacuum")
    assert(wh.read("d", "t").select("id").as[Long].collect().toSet == Set(9L))
  }

  test("dropTag releases the pin: the next vacuum reclaims") {
    val wh = freshWh()
    wh.overwrite("d", "t", df(1L))
    wh.overwrite("d", "t", df(2L))
    val lg = wh.log("d", "t")
    lg.tag("tmp", 1)
    assert(lg.vacuum(0, System.currentTimeMillis() + 60000).isEmpty)
    lg.dropTag("tmp")
    assert(lg.tags.isEmpty)
    val removed = lg.vacuum(0, System.currentTimeMillis() + 60000)
    assert(removed.size == 1, s"v1's fragment must now reclaim: $removed")
  }

  test("tagged snapshot read is exact through later schema evolution and deletes") {
    val wh = freshWh()
    wh.overwrite("d", "t", df(1L, 2L, 3L))
    wh.log("d", "t").tag("pre", 1)
    wh.append("d", "t", Seq((4L, "p4", "extra")).toDF("id", "payload", "note"))
    wh.deleteWhere("d", "t", col("id") === 2L)
    wh.log("d", "t").vacuum(0, System.currentTimeMillis() + 60000)
    val tagged = wh.readTag("d", "t", "pre")
    assert(tagged.columns.toSeq == Seq("id", "payload"),
      "tag serves its own commit's schema")
    assert(tagged.select("id").as[Long].collect().toSet == Set(1L, 2L, 3L))
  }
}
