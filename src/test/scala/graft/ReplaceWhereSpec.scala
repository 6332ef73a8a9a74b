package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.{TableMeta, Warehouse}

/** Predicate-scoped atomic overwrite (Delta replaceWhere): containment,
  * single-commit atomicity, prune-bounded rewrite cost, UNIQUE-key
  * interplay, and hidden-partition composition. */
class ReplaceWhereSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private def freshWh(): Warehouse =
    new Warehouse(spark, Files.createTempDirectory("rw_spec").toString)

  private def flagged(rows: (String, Long, Double)*) =
    rows.toSeq.toDF("flag", "id", "qty")

  test("replace is atomic (one commit), exact, and prune-bounded") {
    val wh = freshWh()
    wh.overwrite("d", "t", flagged(("A", 1L, 10.0), ("A", 2L, 20.0)))
    wh.append("d", "t", flagged(("N", 3L, 30.0)))
    wh.append("d", "t", flagged(("R", 4L, 40.0), ("R", 5L, 50.0)))
    val v0 = wh.log("d", "t").latest.get.version
    val res = wh.replaceWhere("d", "t", col("flag") === "R",
      flagged(("R", 40L, 4.0), ("R", 50L, 5.0), ("R", 60L, 6.0)))
    assert(res.replacedRows == 2L && res.insertedRows == 3L)
    assert(res.pruned == 2, s"zone maps must prune the A and N fragments: $res")
    assert(wh.log("d", "t").latest.get.version == v0 + 1, "ONE commit")
    val got = wh.read("d", "t").orderBy("id").collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L, 40L, 50L, 60L))
    // idempotence: replacing again with the same frame is a no-op delta
    val res2 = wh.replaceWhere("d", "t", col("flag") === "R",
      flagged(("R", 40L, 4.0), ("R", 50L, 5.0), ("R", 60L, 6.0)))
    assert(res2.replacedRows == 3L && res2.insertedRows == 3L)
    assert(wh.read("d", "t").count() == 6L)
  }

  test("containment: replacement rows outside the predicate reject loudly, state unchanged") {
    val wh = freshWh()
    wh.overwrite("d", "t", flagged(("A", 1L, 10.0), ("R", 2L, 20.0)))
    val v0 = wh.log("d", "t").latest.get.version
    val e = intercept[IllegalArgumentException] {
      wh.replaceWhere("d", "t", col("flag") === "R",
        flagged(("R", 3L, 30.0), ("A", 4L, 40.0)))
    }
    assert(e.getMessage.contains("containment"))
    assert(wh.log("d", "t").latest.get.version == v0)
    assert(wh.read("d", "t").count() == 2L)
    assert(wh.orphanFiles("d", "t", graceMillis = 0).isEmpty,
      "rejected landing must not leave orphans")
  }

  test("partial-fragment replace keeps non-matching rows of hit fragments") {
    val wh = freshWh()
    wh.overwrite("d", "t", flagged(("A", 1L, 10.0), ("R", 2L, 20.0),
      ("R", 3L, 30.0)))
    val res = wh.replaceWhere("d", "t",
      col("flag") === "R" && col("qty") > 25.0, flagged(("R", 30L, 99.0)))
    assert(res.replacedRows == 1L && res.insertedRows == 1L)
    val ids = wh.read("d", "t").select("id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 30L))
  }

  test("empty-match replace still inserts (an append-shaped restatement)") {
    val wh = freshWh()
    wh.overwrite("d", "t", flagged(("A", 1L, 10.0)))
    val res = wh.replaceWhere("d", "t", col("flag") === "Z",
      flagged(("Z", 9L, 90.0)))
    assert(res.replacedRows == 0L && res.insertedRows == 1L)
    assert(wh.read("d", "t").count() == 2L)
  }

  test("UNIQUE key: in-scope re-land OK; collision with surviving rows rejects") {
    val wh = freshWh()
    val m = TableMeta(uniqueKey = Seq("id"))
    wh.overwrite("d", "t", flagged(("A", 1L, 10.0), ("R", 2L, 20.0)), m)
    // key 2 is inside the scope — replacing it is the point
    wh.replaceWhere("d", "t", col("flag") === "R", flagged(("R", 2L, 99.0)))
    assert(wh.read("d", "t").filter(col("id") === 2L).head().getDouble(2) == 99.0)
    // key 1 survives outside the scope — re-landing it must reject
    val e = intercept[IllegalArgumentException] {
      wh.replaceWhere("d", "t", col("flag") === "R", flagged(("R", 1L, 0.0)))
    }
    assert(e.getMessage.contains("UNIQUE"))
    assert(wh.read("d", "t").count() == 2L)
    // in-batch dups reject too
    val e2 = intercept[IllegalArgumentException] {
      wh.replaceWhere("d", "t", col("flag") === "R",
        flagged(("R", 7L, 1.0), ("R", 7L, 2.0)))
    }
    assert(e2.getMessage.contains("UNIQUE") || e2.getMessage.contains("id=7"))
  }

  test("composes with a hidden days() layout: one day restated in place") {
    val wh = freshWh()
    val m = TableMeta(partitionField = Some("p_day"), partitionType = "date",
      partitionTransform = Some("days"), partitionSource = Some("ts"))
    def ev(rows: (String, Long)*) = rows.toSeq.toDF("tss", "v")
      .select(to_timestamp(col("tss")).as("ts"), col("v"))
    wh.overwrite("d", "ev", ev(("2024-01-05 01:00:00", 1L),
      ("2024-01-06 01:00:00", 2L), ("2024-01-07 01:00:00", 3L)), m)
    val res = wh.replaceWhere("d", "ev",
      to_date(col("ts")) === lit("2024-01-06"),
      ev(("2024-01-06 09:00:00", 20L), ("2024-01-06 10:00:00", 21L)))
    assert(res.replacedRows == 1L && res.insertedRows == 2L)
    val got = wh.read("d", "ev")
    assert(got.columns.toSeq == Seq("ts", "v"), "no synthetic leak")
    assert(got.select("v").as[Long].collect().sorted.toSeq == Seq(1L, 3L, 20L, 21L))
    val parts = wh.log("d", "ev").latest.get.entries.map(_.partition).sorted
    assert(parts == Seq("2024-01-05", "2024-01-06", "2024-01-07"))
  }
}
