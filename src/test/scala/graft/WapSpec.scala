package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.{TableMeta, Warehouse}

/** Write-audit-publish staging: staged data is invisible to readers,
  * auditable via readWithStaged, publishable as one metadata-only
  * commit, discardable without a trace; constraints and UNIQUE keys
  * gate at stage time; orphan GC never eats staged fragments. */
class WapSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private def freshWh(): Warehouse =
    new Warehouse(spark, Files.createTempDirectory("wap_spec").toString)

  private def rows(ids: Long*) = ids.map(i => (i, s"p$i")).toDF("id", "v")

  private def parquetCount(wh: Warehouse): Long = {
    import scala.jdk.CollectionConverters._
    val w = Files.walk(java.nio.file.Paths.get(wh.root))
    try w.iterator().asScala.count(p => Files.isRegularFile(p) &&
      p.getFileName.toString.endsWith(".parquet")).toLong
    finally w.close()
  }

  test("staged rows are invisible until publish; publish is metadata-only") {
    val wh = freshWh()
    wh.overwrite("d", "t", rows(1L, 2L))
    val v0 = wh.log("d", "t").latest.get.version
    wh.stageAppend("d", "t", rows(3L, 4L))
    assert(wh.read("d", "t").count() == 2L, "readers must not see staged")
    assert(wh.readWithStaged("d", "t").count() == 4L, "audit view sees both")
    assert(wh.log("d", "t").latest.get.version == v0, "stage commits nothing")
    val files = parquetCount(wh)
    assert(wh.publishStaged("d", "t") == 1)
    assert(parquetCount(wh) == files, "publish must move ZERO data")
    assert(wh.log("d", "t").latest.get.version == v0 + 1)
    assert(wh.read("d", "t").count() == 4L)
    assert(wh.stagedEntries("d", "t").isEmpty)
    // second publish is a no-op
    assert(wh.publishStaged("d", "t") == 0)
  }

  test("multiple staged batches accumulate and publish as ONE commit") {
    val wh = freshWh()
    wh.overwrite("d", "t", rows(1L))
    wh.stageAppend("d", "t", rows(2L))
    wh.stageAppend("d", "t", rows(3L))
    val v0 = wh.log("d", "t").latest.get.version
    assert(wh.publishStaged("d", "t") == 2)
    assert(wh.log("d", "t").latest.get.version == v0 + 1)
    assert(wh.read("d", "t").count() == 3L)
  }

  test("discard deletes staged fragments; published state untouched; no orphans") {
    val wh = freshWh()
    wh.overwrite("d", "t", rows(1L, 2L))
    val files0 = parquetCount(wh)
    wh.stageAppend("d", "t", rows(3L))
    assert(parquetCount(wh) > files0)
    wh.discardStaged("d", "t")
    assert(parquetCount(wh) == files0, "discard removes staged bytes")
    assert(wh.read("d", "t").count() == 2L)
    assert(wh.stagedEntries("d", "t").isEmpty)
    assert(wh.orphanFiles("d", "t", graceMillis = 0).isEmpty)
  }

  test("orphan GC treats staged fragments as referenced") {
    val wh = freshWh()
    wh.overwrite("d", "t", rows(1L))
    wh.stageAppend("d", "t", rows(2L))
    assert(wh.orphanFiles("d", "t", graceMillis = 0).isEmpty,
      "staged fragments are NOT orphans")
    wh.publishStaged("d", "t")
    assert(wh.read("d", "t").count() == 2L)
  }

  test("constraints and UNIQUE gate at stage time; staged-vs-staged dups reject") {
    val wh = freshWh()
    val m = TableMeta(uniqueKey = Seq("id"),
      checkConstraints = Seq("pos" -> "id > 0"))
    wh.overwrite("d", "t", rows(1L), m)
    // CHECK violation rejects the stage, nothing staged
    intercept[IllegalArgumentException] { wh.stageAppend("d", "t", rows(-5L)) }
    assert(wh.stagedEntries("d", "t").isEmpty)
    // dup vs PUBLISHED rejects
    intercept[IllegalArgumentException] { wh.stageAppend("d", "t", rows(1L)) }
    // dup vs an EARLIER STAGED batch rejects
    wh.stageAppend("d", "t", rows(2L))
    val e = intercept[IllegalArgumentException] {
      wh.stageAppend("d", "t", rows(2L))
    }
    assert(e.getMessage.contains("staged"))
    assert(wh.stagedEntries("d", "t").size == 1)
    wh.publishStaged("d", "t")
    assert(wh.read("d", "t").count() == 2L)
    assert(wh.orphanFiles("d", "t", graceMillis = 0).isEmpty,
      "rejected stages must clean up")
  }

  test("staging composes with a hidden days() layout") {
    val wh = freshWh()
    val m = TableMeta(partitionField = Some("p_day"), partitionType = "date",
      partitionTransform = Some("days"), partitionSource = Some("ts"))
    def ev(rows: (String, Long)*) = rows.toSeq.toDF("tss", "v")
      .select(to_timestamp(col("tss")).as("ts"), col("v"))
    wh.overwrite("d", "ev", ev(("2024-01-05 01:00:00", 1L)), m)
    wh.stageAppend("d", "ev", ev(("2024-01-06 01:00:00", 2L)))
    assert(wh.read("d", "ev").count() == 1L)
    assert(wh.readWithStaged("d", "ev").count() == 2L)
    assert(wh.readWithStaged("d", "ev").columns.toSeq == Seq("ts", "v"))
    wh.publishStaged("d", "ev")
    val parts = wh.log("d", "ev").latest.get.entries.map(_.partition).sorted
    assert(parts == Seq("2024-01-05", "2024-01-06"))
    // staged-then-published fragments keep their zone sidecars: prune works
    val (s, t) = wh.scanFootprint("d", "ev",
      col("ts") >= lit("2024-01-06").cast("timestamp"))
    assert(s < t, s"published-from-staged entry must prune: $s/$t")
  }

  test("row-level mutations refuse while batches are staged (publish would undo them)") {
    val wh = freshWh()
    wh.overwrite("d", "t", rows(1L, 2L))
    wh.stageAppend("d", "t", rows(3L))
    def refusal(f: => Any): Unit = {
      val e = intercept[IllegalStateException](f)
      assert(e.getMessage.contains("staged"))
    }
    refusal(wh.deleteWhere("d", "t", col("id") === 1L))
    refusal(wh.deleteWhereMor("d", "t", col("id") === 1L))
    refusal(wh.replaceWhere("d", "t", col("id") === 1L, rows(1L)))
    refusal(wh.mergeInto("d", "t", rows(1L), keys = Seq("id")))
    assert(wh.read("d", "t").count() == 2L)
    // discard unblocks
    wh.discardStaged("d", "t")
    assert(wh.deleteWhere("d", "t", col("id") === 1L).deletedRows == 1L)
  }

  test("staged batch with a new column publishes with an additive union schema") {
    val wh = freshWh()
    wh.overwrite("d", "t", rows(1L))
    wh.stageAppend("d", "t", Seq((2L, "p2", "extra")).toDF("id", "v", "note"))
    val audit = wh.readWithStaged("d", "t")
    assert(audit.columns.toSeq == Seq("id", "v", "note"))
    assert(audit.filter(col("id") === 1L).head().isNullAt(2), "pad-on-read")
    wh.publishStaged("d", "t")
    val got = wh.read("d", "t")
    assert(got.columns.toSeq == Seq("id", "v", "note"))
    assert(got.filter(col("note") === "extra").count() == 1L)
  }
}
