package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.{SnapshotLog, TableMeta, Warehouse}

/** Partition-spec evolution: metadata-only re-spec of hidden layouts,
  * spec-stamped entries, spec-guarded transform pruning, mixed-spec read
  * unions, insertOverwrite refusal, relayout normalization, and the
  * manifest codec round-trip of the spec field. */
class PartitionEvolutionSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private def freshWh(): Warehouse =
    new Warehouse(spark, Files.createTempDirectory("evo_spec").toString)

  private def ev(rows: (String, Long)*) = rows.toSeq.toDF("tss", "v")
    .select(to_timestamp(col("tss")).as("ts"), col("v"))

  private val monthMeta = TableMeta(
    partitionField = Some("p_mon"), partitionType = "date",
    partitionTransform = Some("months"), partitionSource = Some("ts"))

  test("months -> days: metadata-only; mixed specs read as one table") {
    val wh = freshWh()
    wh.overwrite("d", "ev", ev(("2024-01-05 01:00:00", 1L),
      ("2024-01-20 01:00:00", 2L), ("2024-02-03 01:00:00", 3L)), monthMeta)
    val bytesBefore = wh.log("d", "ev").latest.get.entries.map(_.path)
    wh.evolvePartitionSpec("d", "ev", "p_day", "days", "ts")
    // evolution wrote no data
    assert(wh.log("d", "ev").latest.get.entries.map(_.path) == bytesBefore)
    // new writes land day-grain beside the old month-grain
    // (replaceWhere is the spec-proof landing path on evolved tables)
    wh.replaceWhere("d", "ev", to_date(col("ts")) === lit("2024-03-01"),
      ev(("2024-03-01 01:00:00", 4L)))
    val parts = wh.log("d", "ev").latest.get.entries.map(_.partition).sorted
    assert(parts == Seq("2024-01-01", "2024-02-01", "2024-03-01"))
    val specs = wh.log("d", "ev").latest.get.entries
      .map(e => e.partition -> e.spec).toMap
    assert(specs("2024-01-01") == 0 && specs("2024-03-01") == 1)
    assert(wh.read("d", "ev").select("v").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L))
  }

  test("transform pruning never trusts old-spec entries (days probe vs month dirs)") {
    val wh = freshWh()
    wh.overwrite("d", "ev", ev(("2024-01-05 01:00:00", 1L),
      ("2024-01-20 01:00:00", 2L)), monthMeta)
    wh.evolvePartitionSpec("d", "ev", "p_day", "days", "ts")
    wh.replaceWhere("d", "ev", to_date(col("ts")) === lit("2024-03-09"),
      ev(("2024-03-09 01:00:00", 9L)))
    // equality probe on a ts inside the OLD month dir: the month entry's
    // value ("2024-01-01") is not days("2024-01-20 …") — a spec-blind
    // transform prune would drop it and lose the row
    val hit = wh.readWhere("d", "ev",
      col("ts") === lit("2024-01-20 01:00:00").cast("timestamp"))
    assert(hit.count() == 1L && hit.head().getLong(1) == 2L)
    // and a current-spec probe still prunes to its day dir
    val (s, t) = wh.scanFootprint("d", "ev",
      col("ts") === lit("2024-03-09 01:00:00").cast("timestamp"))
    assert(s < t, s"current-spec day probe should prune: $s/$t")
  }

  test("unpartitioned -> bucket: old fragment readable, probes prune only new entries") {
    val wh = freshWh()
    val kv = (0L until 100L).map(i => (i, s"v$i")).toDF("k", "p")
    wh.overwrite("d", "kv", kv)
    wh.evolvePartitionSpec("d", "kv", "p_b", "bucket[8]", "k", newType = "int64")
    wh.replaceWhere("d", "kv", col("k") >= 100L,
      (100L until 200L).map(i => (i, s"v$i")).toDF("k", "p"))
    assert(wh.read("d", "kv").count() == 200L)
    // a key in the OLD unpartitioned fragment must survive a bucket probe
    assert(wh.readWhere("d", "kv", col("k") === 42L).count() == 1L)
    // a key in the NEW layout probes its bucket (plus the old fragment)
    assert(wh.readWhere("d", "kv", col("k") === 142L).count() == 1L)
    val (s, t) = wh.scanFootprint("d", "kv", col("k") === 142L)
    assert(s < t, s"bucket entries beyond the key's own must prune: $s/$t")
  }

  test("insertOverwrite refuses on mixed specs; relayout normalizes; then it works") {
    val wh = freshWh()
    wh.overwrite("d", "ev", ev(("2024-01-05 01:00:00", 1L),
      ("2024-01-20 01:00:00", 2L)), monthMeta)
    wh.evolvePartitionSpec("d", "ev", "p_day", "days", "ts")
    val e = intercept[IllegalStateException] {
      wh.insertOverwrite("d", "ev", ev(("2024-01-05 02:00:00", 10L)))
    }
    assert(e.getMessage.contains("older partition spec"))
    wh.relayout("d", "ev")
    val entries = wh.log("d", "ev").latest.get.entries
    assert(entries.forall(_.spec == 1), s"relayout stamps current spec: $entries")
    assert(entries.map(_.partition).sorted == Seq("2024-01-05", "2024-01-20"))
    wh.insertOverwrite("d", "ev", ev(("2024-01-05 02:00:00", 10L)))
    assert(wh.read("d", "ev").select("v").as[Long].collect().sorted.toSeq ==
      Seq(2L, 10L))
  }

  test("visible partition columns refuse to evolve") {
    val wh = freshWh()
    wh.overwrite("d", "t",
      Seq(("2024-01-05", 1L)).toDF("day", "v"),
      TableMeta(partitionField = Some("day"), partitionType = "string"))
    val e = intercept[IllegalArgumentException] {
      wh.evolvePartitionSpec("d", "t", "p_day", "days", "day")
    }
    assert(e.getMessage.contains("VISIBLE"))
  }

  test("manifest codec round-trips spec with and without deletion vectors") {
    val dir = Files.createTempDirectory("evo_codec")
    val lg = SnapshotLog.forTable(dir.toString, "d", "t")
    val entries = Seq(
      SnapshotLog.Entry("2024-01-01", "_data/a/p=2024-01-01"),
      SnapshotLog.Entry("2024-01-02", "_data/b/p=2024-01-02", spec = 1),
      SnapshotLog.Entry("2024-01-03", "_data/c/p=2024-01-03",
        dv = Some("_dv/x.parquet"), spec = 2),
      SnapshotLog.Entry("x", "_data/d", spec = -1))
    lg.commit("write", entries, schemaDdl = Some("v BIGINT"))
    // force both codecs: a second commit renders as a delta
    lg.commit("write", entries :+ SnapshotLog.Entry("y", "_data/e", spec = 3))
    val got = SnapshotLog.forTable(dir.toString, "d", "t").latest.get.entries
    assert(got.toSet == (entries :+ SnapshotLog.Entry("y", "_data/e", spec = 3)).toSet)
  }

  test("copy and clone preserve spec stamps (pruning survives the move)") {
    val wh = freshWh()
    wh.overwrite("d", "ev", ev(("2024-01-05 01:00:00", 1L)), monthMeta)
    wh.evolvePartitionSpec("d", "ev", "p_day", "days", "ts")
    wh.replaceWhere("d", "ev", to_date(col("ts")) === lit("2024-02-02"),
      ev(("2024-02-02 01:00:00", 2L)))
    def specsOf(ds: String, t: String) =
      wh.log(ds, t).latest.get.entries.map(e => e.partition -> e.spec).toMap
    val orig = specsOf("d", "ev")
    assert(orig.values.toSet == Set(0, 1))
    wh.copy("d", "ev", "d", "ev_copy")
    assert(specsOf("d", "ev_copy") == orig, "copy keeps spec stamps")
    wh.cloneTable("d", "ev", "d", "ev_clone")
    assert(specsOf("d", "ev_clone") == orig, "clone keeps spec stamps")
    assert(wh.read("d", "ev_copy").count() == 2L)
    assert(wh.read("d", "ev_clone").count() == 2L)
  }

  test("compact across an evolution: same-spec groups keep their stamp") {
    val wh = freshWh()
    wh.overwrite("d", "ev", ev(("2024-01-05 01:00:00", 1L)), monthMeta)
    wh.evolvePartitionSpec("d", "ev", "p_day", "days", "ts")
    wh.replaceWhere("d", "ev", to_date(col("ts")) === lit("2024-02-02"),
      ev(("2024-02-02 01:00:00", 2L), ("2024-02-02 02:00:00", 3L)))
    wh.replaceWhere("d", "ev", to_date(col("ts")) === lit("2024-02-03"),
      ev(("2024-02-03 01:00:00", 4L)))
    wh.compact("d", "ev", targetBytes = 1L << 30)
    val byPart = wh.log("d", "ev").latest.get.entries
      .map(e => e.partition -> e.spec).toMap
    assert(byPart("2024-01-01") == 0, "old-spec singleton keeps spec 0")
    assert(byPart.filterKeys(_.startsWith("2024-02")).values.forall(_ == 1))
    assert(wh.read("d", "ev").count() == 4L)
  }
}
