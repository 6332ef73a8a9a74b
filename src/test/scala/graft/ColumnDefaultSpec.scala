package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.{TableMeta, Warehouse}

/** ALTER ADD COLUMN with DEFAULT: metadata-only, per-fragment initial
  * defaults (fragments lacking the column serve it; explicit NULLs
  * survive), time-travel correctness, and composition with renames,
  * deletion vectors, hidden partitioning, and constraints. */
class ColumnDefaultSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private def freshWh(): Warehouse =
    new Warehouse(spark, Files.createTempDirectory("def_spec").toString)

  private def rows(ids: Long*) = ids.map(i => (i, s"p$i")).toDF("id", "v")

  test("old fragments serve the default; new explicit values (incl. NULL) survive") {
    val wh = freshWh()
    wh.overwrite("d", "t", rows(1L, 2L))
    val v0 = wh.log("d", "t").latest.get.version
    wh.addColumn("d", "t", "origin", "STRING", Some("'legacy'"))
    // metadata-only: no new data files
    assert(wh.log("d", "t").latest.get.entries ==
      wh.log("d", "t").version(v0).get.entries, "alter must move zero data")
    val got = wh.read("d", "t")
    assert(got.columns.toSeq == Seq("id", "v", "origin"))
    assert(got.select("origin").as[String].collect().toSeq == Seq("legacy", "legacy"))
    // new fragment WITH the column: explicit values and explicit NULL kept
    wh.append("d", "t",
      Seq((3L, "p3", Some("fresh")), (4L, "p4", None)).toDF("id", "v", "origin"))
    val all = wh.read("d", "t").orderBy("id").collect()
    assert(all.map(r => Option(r.getString(2))).toSeq ==
      Seq(Some("legacy"), Some("legacy"), Some("fresh"), None),
      "explicit NULL must NOT become the default")
    // a later writer omitting the column gets the write-default
    wh.append("d", "t", rows(5L))
    assert(wh.read("d", "t").filter(col("id") === 5L)
      .head().getString(2) == "legacy")
  }

  test("time travel before the alter lacks the column; after serves it") {
    val wh = freshWh()
    wh.overwrite("d", "t", rows(1L))
    val v0 = wh.log("d", "t").latest.get.version
    wh.addColumn("d", "t", "n", "BIGINT", Some("0"))
    assert(wh.readVersion("d", "t", v0).columns.toSeq == Seq("id", "v"))
    assert(wh.read("d", "t").select("n").as[Long].collect().toSeq == Seq(0L))
  }

  test("no default = plain additive evolution (old rows NULL)") {
    val wh = freshWh()
    wh.overwrite("d", "t", rows(1L))
    wh.addColumn("d", "t", "score", "DOUBLE")
    assert(wh.read("d", "t").head().isNullAt(2))
  }

  test("default validation is loud: non-literal, non-castable, duplicate") {
    val wh = freshWh()
    wh.overwrite("d", "t", rows(1L))
    intercept[IllegalArgumentException] {
      wh.addColumn("d", "t", "bad", "BIGINT", Some("id + 1")) // references a column
    }
    intercept[Exception] {
      wh.addColumn("d", "t", "bad2", "DATE", Some("'not a date that parses'"))
    }
    wh.addColumn("d", "t", "ok", "BIGINT", Some("7"))
    intercept[IllegalArgumentException] {
      wh.addColumn("d", "t", "ok", "BIGINT", Some("8"))
    }
    assert(wh.read("d", "t").select("ok").as[Long].collect().toSeq == Seq(7L))
  }

  test("defaults compose with deletion vectors and zone-pruned reads") {
    val wh = freshWh()
    wh.overwrite("d", "t", rows(1L, 2L, 3L))
    wh.addColumn("d", "t", "flag", "STRING", Some("'x'"))
    wh.deleteWhereMor("d", "t", col("id") === 2L)
    val got = wh.read("d", "t").orderBy("id").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 3L))
    assert(got.forall(_.getString(2) == "x"), "masked fragment serves the default")
    assert(wh.readWhere("d", "t", col("id") === 3L)
      .head().getString(2) == "x")
  }

  test("defaults compose with a hidden days() layout") {
    val wh = freshWh()
    val m = TableMeta(partitionField = Some("p_day"), partitionType = "date",
      partitionTransform = Some("days"), partitionSource = Some("ts"))
    def ev(rows: (String, Long)*) = rows.toSeq.toDF("tss", "v")
      .select(to_timestamp(col("tss")).as("ts"), col("v"))
    wh.overwrite("d", "ev", ev(("2024-01-05 01:00:00", 1L)), m)
    wh.addColumn("d", "ev", "src", "STRING", Some("'batch'"))
    assert(wh.read("d", "ev").columns.toSeq == Seq("ts", "v", "src"))
    assert(wh.read("d", "ev").head().getString(2) == "batch")
  }

  test("NOT NULL on a defaulted column: absence is satisfied by the default") {
    val wh = freshWh()
    wh.overwrite("d", "t", rows(1L),
      TableMeta(notNullColumns = Seq("id")))
    wh.addColumn("d", "t", "state", "STRING", Some("'new'"))
    val m = wh.meta("d", "t")
    wh.setMeta("d", "t", m.copy(notNullColumns = m.notNullColumns :+ "state"))
    // a write WITHOUT the column passes (default covers it)...
    wh.append("d", "t", rows(2L))
    assert(wh.read("d", "t").filter(col("state").isNull).count() == 0L)
    // ...a write with an explicit NULL in it still rejects
    intercept[IllegalArgumentException] {
      wh.append("d", "t",
        Seq((3L, "p3", null.asInstanceOf[String])).toDF("id", "v", "state"))
    }
  }
}
