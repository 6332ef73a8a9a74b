package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables
import graft.queries.DeclaredQueries

object TestSession {
  lazy val spark: SparkSession = graft.core.GraftSession.builder("4")
    .appName("graft-test")
    .getOrCreate()
  val sf: String = "/root/testdata/sf0.001"
}

class DeclaredQueriesSpec extends AnyFunSuite {
  import TestSession._

  // Every declared query must produce rows on the smoke fixture, and its
  // column names must match the oracle contract (driver hashes by name).
  for ((name, fn) <- DeclaredQueries.queries) {
    test(s"$name returns rows at sf0.001") {
      val df = fn(spark, sf)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("q2 orphans excludes all BUILDING customers") {
    val got = DeclaredQueries.q2Orphans(spark, sf)
    val building = Tables.load(spark, sf, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("orphan_custkey"))
    assert(got.join(building, Seq("orphan_custkey")).count() === 0)
  }

  test("q8 window rn is dense per user") {
    val df = DeclaredQueries.q8Scd2Window(spark, sf)
    val bad = df.groupBy("user_id")
      .agg(max(col("rn")).as("mx"), count(lit(1)).as("n"))
      .filter(col("mx") =!= col("n"))
    assert(bad.count() === 0)
  }

  test("q9 set algebra invariants: intersect+except partitions a") {
    val df = DeclaredQueries.q9SetOps(spark, sf).cache()
    val nInter = df.filter(col("op") === "intersect").count()
    val nExcept = df.filter(col("op") === "except").count()
    val a = Tables.load(spark, sf, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_nationkey").distinct().count()
    assert(nInter + nExcept === a)
  }

  test("approx_count_distinct within 5% of exact (Q10 HLL sanity)") {
    val li = Tables.load(spark, sf, "lineitem")
    val row = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey")).as("approx")).head()
    val (exact, approx) = (row.getLong(0).toDouble, row.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact < 0.05)
  }

  test("events loader converts nanos ts to TimestampType") {
    val e = Tables.load(spark, sf, "events")
    assert(e.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
    assert(e.count() > 0)
  }

  test("oracle keys cover exactly the query keys") {
    assert(DeclaredQueries.oracleSql.keySet === DeclaredQueries.queries.keySet)
  }
}
