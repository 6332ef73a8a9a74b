package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.{BloomIndex, Warehouse}

/** Per-file Bloom sidecars: point lookups on UNCLUSTERED columns must
  * skip files zone maps cannot, results must stay exactly equal to the
  * unpruned filter, and every verdict must be conservative (false
  * positives keep, never drop). */
class BloomIndexSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private def freshWh(): Warehouse =
    new Warehouse(spark, Files.createTempDirectory("bloom_spec").toString)

  test("point lookup on an unclustered column opens fewer files; rows exactly equal the unpruned filter") {
    val wh = freshWh()
    // layout clustered by k (range), probed by uid (scattered): each of
    // the 8 files holds one k-range but uids 0..9999 land round-robin —
    // zone maps cannot prune a uid probe, blooms can
    val df = spark.range(10000).select(
      col("id").as("k"),
      (col("id") * 7919 % 10000).as("uid"),
      concat(lit("v"), col("id")).as("payload"))
    wh.overwrite("d", "pl", df.repartitionByRange(8, col("k")),
      graft.core.TableMeta(clusteringFields = Seq("k")))
    wh.recluster("d", "pl", targetBytes = 8096)
    val probe = col("uid") === 4242
    val (before, total) = wh.scanFootprint("d", "pl", probe)
    assert(total >= 4, s"fixture needs multiple files, got $total")
    val indexed = wh.analyzeBloom("d", "pl", Seq("uid"))
    assert(indexed.nonEmpty)
    val (after, total2) = wh.scanFootprint("d", "pl", probe)
    assert(total2 === total)
    assert(after < before,
      s"bloom must skip files for a point probe: $after vs $before of $total")
    // exactness: pruned read == unpruned filter
    val got = wh.readWhere("d", "pl", probe)
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[Long]("uid"))).toSet
    val want = wh.read("d", "pl").filter(probe)
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[Long]("uid"))).toSet
    assert(got === want && got.nonEmpty)
    // IN probes prune too and stay exact
    val inProbe = col("uid").isin(4242, 17)
    assert(wh.readWhere("d", "pl", inProbe).count() ===
      wh.read("d", "pl").filter(inProbe).count())
    // absent value: every file proves clean, zero rows, zero files
    val (absentFiles, _) = wh.scanFootprint("d", "pl", col("uid") === 123456789L)
    assert(absentFiles === 0L)
    assert(wh.readWhere("d", "pl", col("uid") === 123456789L).count() === 0L)
  }

  test("bloom + zone verdicts INTERSECT; unsupported shapes and uncovered columns never prune") {
    val wh = freshWh()
    val df = spark.range(1000).select(col("id").as("k"),
      (col("id") % 100).as("uid"))
    wh.overwrite("d", "ix", df.repartitionByRange(4, col("k")),
      graft.core.TableMeta(clusteringFields = Seq("k")))
    wh.recluster("d", "ix", targetBytes = 2048)
    wh.analyzeBloom("d", "ix", Seq("uid"))
    // range ON the bloom column: bloom can't answer, zones on uid can't
    // either (scattered) → full scan, correct rows
    assert(wh.readWhere("d", "ix", col("uid") > 97).count() ===
      wh.read("d", "ix").filter(col("uid") > 97).count())
    // conjunction: k range (zones) AND uid point (bloom) both prune
    val both = col("k") < 10 && col("uid") === 5
    assert(wh.readWhere("d", "ix", both).collect().map(_.getLong(0)).toSeq
      === wh.read("d", "ix").filter(both).collect().map(_.getLong(0)).toSeq)
    // probing a column with no bloom never prunes incorrectly
    assert(wh.readWhere("d", "ix", col("k") === 500).count() === 1L)
  }

  test("string columns probe; corrupt sidecars degrade to scan; vacuumStats reclaims bloom files") {
    val wh = freshWh()
    val df = Seq.tabulate(400)(i => (i.toLong, s"user_${i % 40}"))
      .toDF("k", "name")
    wh.overwrite("d", "sx", df.repartition(4))
    wh.analyzeBloom("d", "sx", Seq("name"))
    val probe = col("name") === "user_7"
    assert(wh.readWhere("d", "sx", probe).count() ===
      wh.read("d", "sx").filter(probe).count())
    assert(wh.readWhere("d", "sx", col("name") === "nobody").count() === 0L)
    // corrupt the sidecar: reads must degrade to a full scan, not fail
    val td = Paths.get(wh.root, "d", "sx")
    val entry = wh.log("d", "sx").latest.get.entries.head.path
    Files.write(BloomIndex.bloomPath(td, entry), "garbage".getBytes)
    assert(wh.readWhere("d", "sx", probe).count() ===
      wh.read("d", "sx").filter(probe).count())
    // overwrite → old entry dead → vacuumStats removes its bloom file
    wh.overwrite("d", "sx", df)
    graft.core.ZoneMaps.vacuumStats(td,
      wh.log("d", "sx").commits.flatMap(_.entries.map(_.path)).toSet)
    assert(Files.exists(BloomIndex.bloomPath(td, entry)),
      "entry still referenced by v1 -> sidecar survives")
    graft.core.ZoneMaps.vacuumStats(td, Set.empty)
    assert(!Files.exists(BloomIndex.bloomPath(td, entry)))
  }

  test("MoR deletes compose: masked rows are bloom false-positives (kept files), results exact") {
    val wh = freshWh()
    wh.overwrite("d", "dv", spark.range(2000).select(col("id").as("k"),
      (col("id") % 50).as("uid")).repartition(4))
    wh.analyzeBloom("d", "dv", Seq("uid"))
    wh.deleteWhereMor("d", "dv", col("uid") === 7)
    // the filter still CONTAINS uid=7 (false-positive direction — sound);
    // the read applies the mask and returns zero rows
    assert(wh.readWhere("d", "dv", col("uid") === 7).count() === 0L)
    assert(wh.readWhere("d", "dv", col("uid") === 8).count() === 40L)
  }
}
