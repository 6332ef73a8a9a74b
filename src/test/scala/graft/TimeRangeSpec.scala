package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.TimeRange._

/** First-class TIME (micros-since-midnight) and RANGE (half-open
  * struct(start, end), NULL = unbounded) — SURVEY §1.2's last two
  * documented approximations, now typed operator sets. The q97 oracle
  * pins the end-to-end semantics against DuckDB; these cases pin the
  * operator edges an aggregate query can't reach. */
class TimeRangeSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private def one[A](c: org.apache.spark.sql.Column): A =
    spark.range(1).select(c.as("v")).collect().head.getAs[A]("v")

  test("TIME construction, parse, format, trunc round-trip") {
    assert(one[Long](makeTime(lit(13), lit(45), lit(30)))
      === (13L * 3600 + 45 * 60 + 30) * 1000000L)
    assert(one[String](formatTime(parseTime(lit("09:05:07"))))
      === "09:05:07")
    assert(one[String](formatTime(lit(0L))) === "00:00:00")
    assert(one[String](formatTime(lit(MicrosPerDay - 1L))) === "23:59:59")
    assert(one[Long](timeTrunc(parseTime(lit("09:05:07")), "hour"))
      === 9L * 3600 * 1000000L)
    assert(one[Long](timeTrunc(parseTime(lit("09:05:07")), "minute"))
      === (9L * 3600 + 5 * 60) * 1000000L)
    // invalid text parses to NULL (cast semantics)
    assert(spark.range(1).select(parseTime(lit("not a time")).as("v"))
      .collect().head.isNullAt(0))
    intercept[IllegalArgumentException] {
      timeTrunc(lit(0L), "day")
    }
  }

  test("TIME_ADD wraps at midnight both directions; TIME_DIFF is plain") {
    val t2330 = makeTime(lit(23), lit(30), lit(0))
    assert(one[Long](timeAdd(t2330, lit(3600L * 1000000L)))
      === makeTimeVal(0, 30, 0))
    assert(one[Long](timeAdd(makeTime(lit(0), lit(10), lit(0)),
      lit(-3600L * 1000000L))) === makeTimeVal(23, 10, 0))
    assert(one[Long](timeDiff(makeTime(lit(1), lit(0), lit(0)),
      makeTime(lit(2), lit(0), lit(0)))) === -3600L * 1000000L)
  }

  private def makeTimeVal(h: Int, m: Int, s: Int): Long =
    ((h * 3600L + m * 60L + s) * 1000000L)

  test("timeOfDay matches UTC wall clock incl. sub-second micros") {
    val got = Seq("2024-03-05 07:08:09.123456")
      .toDF("s").select(timeOfDay(to_timestamp(col("s"))).as("v"))
      .collect().head.getLong(0)
    assert(got === makeTimeVal(7, 8, 9) + 123456L)
  }

  test("RANGE: half-open contains, overlaps, intersect, unbounded sides") {
    val r = range(lit(10L), lit(20L))
    assert(one[Boolean](rangeContains(r, lit(10L))) === true)
    assert(one[Boolean](rangeContains(r, lit(20L))) === false) // half-open
    assert(one[Boolean](rangeContains(r, lit(5L))) === false)
    // unbounded start/end
    val unb = range(lit(null).cast("long"), lit(20L))
    assert(one[Boolean](rangeContains(unb, lit(-999L))) === true)
    assert(one[Boolean](rangeContains(unb, lit(25L))) === false)
    // overlaps: touching half-open ranges do NOT overlap
    assert(one[Boolean](rangeOverlaps(range(lit(1L), lit(5L)),
      range(lit(5L), lit(9L)))) === false)
    assert(one[Boolean](rangeOverlaps(range(lit(1L), lit(6L)),
      range(lit(5L), lit(9L)))) === true)
    // intersect clamps; disjoint → NULL
    val ix = spark.range(1).select(rangeIntersect(
      range(lit(1L), lit(6L)), range(lit(4L), lit(9L))).as("r"))
      .select(col("r.start"), col("r.end")).collect().head
    assert((ix.getLong(0), ix.getLong(1)) === (4L, 6L))
    assert(spark.range(1).select(rangeIntersect(
      range(lit(1L), lit(2L)), range(lit(5L), lit(9L))).as("r"))
      .collect().head.isNullAt(0))
    assert(one[Long](rangeWidth(range(lit(3L), lit(11L)))) === 8L)
    // inverted construction fails LOUDLY at eval
    intercept[Exception] {
      spark.range(1).select(range(lit(5L), lit(1L))).collect()
    }
  }

  test("operators stay inside whole-stage codegen (no CodegenFallback)") {
    val df = spark.range(1000)
      .select(col("id"), (col("id") % 86400L * 1000000L).as("tod"))
      .withColumn("r", range(col("tod"), col("tod") + lit(1000000L)))
      .withColumn("hit", rangeContains(col("r"), lit(43200L * 1000000L)))
      .withColumn("h", timeTrunc(col("tod"), "hour"))
      .filter(col("hit") || col("h") >= 0L)
    // executedPlan.toString renders codegen stages as `*(n)` stars
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), plan.take(500))
    assert(df.count() === 1000L)
  }
}
