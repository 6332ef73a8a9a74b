package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.materialize.DataTests

/** dbt-style generic data tests: each returns the failing rows (zero
  * rows = pass), exercised on deliberately dirty frames. */
class DataTestsSpec extends AnyFunSuite {
  import TestSession._

  test("each generic test isolates exactly its failing rows") {
    import spark.implicits._
    val dirty = Seq(
      (Some(1L), Some("a"), "X"),
      (Some(2L), None, "Y"),      // null name
      (Some(2L), Some("c"), "X"), // duplicate id
      (None, Some("d"), "Z")      // null id: unique ignores, not_null on id catches
    ).toDF("id", "name", "flag")
    assert(DataTests.notNull(dirty, "name").count() === 1)
    assert(DataTests.notNull(dirty, "id").count() === 1)
    val dup = DataTests.unique(dirty, Seq("id")).collect()
    assert(dup.length === 1 && dup.head.getLong(0) === 2L && dup.head.getLong(1) === 2L)
    assert(DataTests.acceptedValues(dirty, "flag", Seq("X", "Y")).collect()
      .map(_.getString(0)).toSeq === Seq("Z"))
    val parent = Seq(1L, 2L).toDF("pid")
    // null child key passes; unmatched 99 fails
    val child = Seq(Some(1L), Some(99L), None).toDF("cid")
    val orphans = DataTests.relationships(child, "cid", parent, "pid").collect()
    assert(orphans.map(_.getLong(0)).toSeq === Seq(99L))
    // summary counts mirror the per-test frames
    val summary = DataTests.summarize(Seq(
      "nn" -> DataTests.notNull(dirty, "name"),
      "uq" -> DataTests.unique(dirty, Seq("id")))).toMap
    assert(summary === Map("nn" -> 1L, "uq" -> 1L))
  }
}
