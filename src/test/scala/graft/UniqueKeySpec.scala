package graft

import java.nio.file.{Files, Path}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.{TableMeta, Warehouse}

/** Write-time UNIQUE-key (primary-key style) enforcement: in-batch dup
  * and NULL rejection on every landing path, the zone/Bloom-pruned
  * standing-table probe on append (monotonic appends probe ZERO files),
  * partition-containment on partitioned tables, and merge-path
  * preservation rules. */
class UniqueKeySpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private def freshWh(): Warehouse =
    new Warehouse(spark, Files.createTempDirectory("uniq_spec").toString)

  private val uniq = TableMeta(uniqueKey = Seq("id"))

  private def df(ids: Long*): DataFrame =
    ids.map(i => (i, s"p$i")).toDF("id", "payload")

  test("overwrite rejects in-batch duplicates and NULL keys, loudly") {
    val wh = freshWh()
    val e = intercept[IllegalArgumentException] {
      wh.overwrite("d", "t", df(1L, 2L, 2L), uniq)
    }
    assert(e.getMessage.contains("UNIQUE") && e.getMessage.contains("id=2"))
    val e2 = intercept[IllegalArgumentException] {
      wh.overwrite("d", "t2",
        Seq((Some(1L), "a"), (None, "b")).toDF("id", "payload"), uniq)
    }
    assert(e2.getMessage.contains("NULL"))
  }

  test("append dup vs standing table rejects; state unchanged; no orphans") {
    val wh = freshWh()
    wh.overwrite("d", "t", df(1L, 2L, 3L), uniq)
    val v = wh.log("d", "t").latest.get.version
    val e = intercept[IllegalArgumentException] { wh.append("d", "t", df(4L, 2L)) }
    assert(e.getMessage.contains("id=2") && e.getMessage.contains("already exists"))
    assert(wh.log("d", "t").latest.get.version == v)
    assert(wh.read("d", "t").count() == 3L)
    assert(wh.orphanFiles("d", "t", graceMillis = 0).isEmpty,
      "rejected fragment must be cleaned up")
    // a clean disjoint append still lands
    wh.append("d", "t", df(4L, 5L))
    assert(wh.read("d", "t").count() == 5L)
  }

  test("monotonic-key append probes ZERO standing files (zone pruning)") {
    val wh = freshWh()
    wh.overwrite("d", "t",
      spark.range(0, 1000).select(col("id"), lit("x").as("payload")), uniq)
    wh.append("d", "t",
      spark.range(1000, 2000).select(col("id"), lit("y").as("payload")))
    // the probe's own predicate shape: the batch range against the
    // PRE-append table — zone maps refute every standing fragment
    val (files, _) = wh.scanFootprint("d", "t", col("id").between(2000L, 2999L))
    assert(files == 0L, s"monotonic probe must open zero files, opened $files")
    assert(wh.read("d", "t").count() == 2000L)
  }

  test("interleaved-key append probes zero files once Bloom sidecars exist") {
    val wh = freshWh()
    // standing: EVEN ids — any odd batch overlaps the zone range
    wh.overwrite("d", "t", spark.range(0, 2000)
      .select((col("id") * 2).as("id"), lit("x").as("payload")), uniq)
    wh.analyzeBloom("d", "t", Seq("id"))
    val probe = col("id").isin(101L, 1001L, 2001L)
    val (files, _) = wh.scanFootprint("d", "t", probe)
    assert(files == 0L,
      s"Bloom must refute an absent-key IN probe, opened $files")
    wh.append("d", "t", df(101L, 1001L, 2001L))
    assert(wh.read("d", "t").count() == 2003L)
    // and the probe still CATCHES a real dup through the same path
    val e = intercept[IllegalArgumentException] { wh.append("d", "t", df(1001L)) }
    assert(e.getMessage.contains("already exists"))
  }

  test("multi-column key: full-key dup rejects, half-key overlap is fine") {
    val wh = freshWh()
    val m = TableMeta(uniqueKey = Seq("a", "b"))
    wh.overwrite("d", "t",
      Seq((1L, "x", 10), (1L, "y", 20)).toDF("a", "b", "v"), m)
    wh.append("d", "t", Seq((2L, "x", 30)).toDF("a", "b", "v"))
    val e = intercept[IllegalArgumentException] {
      wh.append("d", "t", Seq((1L, "y", 99)).toDF("a", "b", "v"))
    }
    assert(e.getMessage.contains("already exists"))
    assert(wh.read("d", "t").count() == 3L)
  }

  test("partitioned table: key must contain the partition field; replacement stays unique") {
    val wh = freshWh()
    val bad = TableMeta(partitionField = Some("day"), partitionType = "string",
      uniqueKey = Seq("id"))
    val data = Seq((1L, "2024-01-01", "a"), (2L, "2024-01-02", "b"))
      .toDF("id", "day", "v")
    intercept[IllegalArgumentException] { wh.overwrite("d", "p", data, bad) }
    val good = bad.copy(uniqueKey = Seq("day", "id"))
    wh.overwrite("d", "p", data, good)
    // replacing a partition with the SAME key is a replace, not a dup
    wh.insertOverwrite("d", "p", Seq((1L, "2024-01-01", "a2")).toDF("id", "day", "v"))
    assert(wh.read("d", "p").count() == 2L)
    // in-batch dup within one partition rejects
    val e = intercept[IllegalArgumentException] {
      wh.insertOverwrite("d", "p",
        Seq((7L, "2024-01-03", "x"), (7L, "2024-01-03", "y")).toDF("id", "day", "v"))
    }
    assert(e.getMessage.contains("UNIQUE"))
  }

  test("merge paths: wrong merge key refused; dup-key source refused; clean merge lands") {
    val wh = freshWh()
    wh.overwrite("d", "t", df(1L, 2L, 3L), uniq)
    intercept[IllegalArgumentException] {
      wh.mergeInto("d", "t", df(1L), Seq("payload"))
    }
    intercept[IllegalArgumentException] {
      wh.mergeIntoMor("d", "t", df(9L, 9L), Seq("id"))
    }
    assert(wh.read("d", "t").count() == 3L)
    wh.mergeIntoMor("d", "t",
      Seq((2L, "updated"), (9L, "new")).toDF("id", "payload"), Seq("id"))
    val out = wh.read("d", "t").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "p1", 2L -> "updated", 3L -> "p3", 9L -> "new"))
  }

  test("tables without a declared key are untouched by the gate") {
    val wh = freshWh()
    wh.overwrite("d", "t", df(1L, 1L))
    wh.append("d", "t", df(1L))
    assert(wh.read("d", "t").count() == 3L)
  }
}
