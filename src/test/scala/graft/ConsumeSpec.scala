package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Warehouse

/** Incremental append consumption: version offsets, replay-until-commit,
  * manifest-diff batches, loud refusal on non-append-only history. */
class ConsumeSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private def freshWh(): Warehouse =
    new Warehouse(spark, Files.createTempDirectory("cons_spec").toString)

  private def rows(ids: Long*) = ids.map(i => (i, s"p$i")).toDF("id", "v")

  test("first batch is the whole table; then exactly the appended fragments") {
    val wh = freshWh()
    val cp = Files.createTempDirectory("cons_cp")
    wh.overwrite("d", "t", rows(1L, 2L))
    val b0 = wh.nextAppends("d", "t", cp).get
    assert(b0.df.count() == 2L && b0.fromVersion == -1)
    wh.commitConsumed(cp, b0.toVersion)
    assert(wh.nextAppends("d", "t", cp).isEmpty, "up to date")
    wh.append("d", "t", rows(3L))
    wh.append("d", "t", rows(4L, 5L))
    val b1 = wh.nextAppends("d", "t", cp).get
    assert(b1.df.select("id").as[Long].collect().sorted.toSeq == Seq(3L, 4L, 5L),
      "batch = only the new fragments, both appends coalesced")
    wh.commitConsumed(cp, b1.toVersion)
    assert(wh.nextAppends("d", "t", cp).isEmpty)
  }

  test("a batch replays until committed (crash-safe at-least-once)") {
    val wh = freshWh()
    val cp = Files.createTempDirectory("cons_cp2")
    wh.overwrite("d", "t", rows(1L))
    wh.commitConsumed(cp, wh.log("d", "t").latest.get.version)
    wh.append("d", "t", rows(2L))
    val a = wh.nextAppends("d", "t", cp).get
    val b = wh.nextAppends("d", "t", cp).get // no commit in between
    assert((a.fromVersion, a.toVersion) == (b.fromVersion, b.toVersion))
    assert(b.df.select("id").as[Long].collect().toSeq == Seq(2L))
    wh.commitConsumed(cp, b.toVersion)
    assert(wh.nextAppends("d", "t", cp).isEmpty)
  }

  test("non-append-only history between offsets fails loudly") {
    val wh = freshWh()
    val cp = Files.createTempDirectory("cons_cp3")
    wh.overwrite("d", "t", rows(1L, 2L, 3L))
    val b0 = wh.nextAppends("d", "t", cp).get
    wh.commitConsumed(cp, b0.toVersion)
    wh.deleteWhere("d", "t", col("id") === 2L)
    val e = intercept[IllegalStateException] { wh.nextAppends("d", "t", cp) }
    assert(e.getMessage.contains("append-only"))
  }

  test("published WAP batches consume like appends") {
    val wh = freshWh()
    val cp = Files.createTempDirectory("cons_cp4")
    wh.overwrite("d", "t", rows(1L))
    val b0 = wh.nextAppends("d", "t", cp).get
    wh.commitConsumed(cp, b0.toVersion)
    wh.stageAppend("d", "t", rows(2L))
    assert(wh.nextAppends("d", "t", cp).isEmpty, "staged is not published")
    wh.publishStaged("d", "t")
    val b1 = wh.nextAppends("d", "t", cp).get
    assert(b1.df.select("id").as[Long].collect().toSeq == Seq(2L))
  }
}
