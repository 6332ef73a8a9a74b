package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.plans.Lineage

/** Column-level lineage extraction: projections, aggregates, joins,
  * unions, explodes, windows, and the predicate-does-not-taint rule. */
class LineageSpec extends AnyFunSuite {
  import TestSession._

  private def writeTable(name: String, df: org.apache.spark.sql.DataFrame): String = {
    val dir = Files.createTempDirectory("lineage").resolve(name)
    df.write.parquet(dir.toString)
    dir.toString
  }

  private lazy val ordersPath = {
    import spark.implicits._
    writeTable("orders", Seq((1L, 10L, 100.0), (2L, 20L, 50.0))
      .toDF("o_id", "cust_id", "amount"))
  }
  private lazy val custPath = {
    import spark.implicits._
    writeTable("cust", Seq((10L, "alice", "NO"), (20L, "bob", "SE"))
      .toDF("c_id", "name", "country"))
  }

  private def srcOf(m: Map[String, Set[(String, String)]], col: String): Set[String] =
    m(col).map { case (t, c) => s"${t.split('/').last}.$c" }

  test("join + aggregate: each output column traces to its exact source columns") {
    val o = spark.read.parquet(ordersPath)
    val c = spark.read.parquet(custPath)
    val q = o.join(c, o("cust_id") === c("c_id"))
      .groupBy(col("country"))
      .agg(sum(col("amount") * 2).as("spend"), count(lit(1)).as("n"))
    val lin = Lineage.columnLineage(q)
    assert(srcOf(lin, "country") === Set("cust.country"))
    assert(srcOf(lin, "spend") === Set("orders.amount"))
    assert(lin("n") === Set.empty, "count(1) derives from no column")
    assert(Lineage.sourceTables(q).map(_.split('/').last) === Set("orders", "cust"))
  }

  test("filter and join predicates do NOT taint value lineage") {
    val o = spark.read.parquet(ordersPath)
    val q = o.filter(col("cust_id") > 5).select((col("amount") + 1).as("a1"))
    val lin = Lineage.columnLineage(q)
    assert(srcOf(lin, "a1") === Set("orders.amount"))
  }

  test("multi-source expression unions its leaves; aliases chase through") {
    val o = spark.read.parquet(ordersPath)
    val q = o.select((col("amount") / col("o_id")).as("ratio"))
      .select((col("ratio") * 3).as("scaled"))
    val lin = Lineage.columnLineage(q)
    assert(srcOf(lin, "scaled") === Set("orders.amount", "orders.o_id"))
  }

  test("union merges both branches per position") {
    val o = spark.read.parquet(ordersPath)
    val c = spark.read.parquet(custPath)
    val q = o.select(col("o_id").as("k")).unionAll(c.select(col("c_id").as("k")))
    val lin = Lineage.columnLineage(q)
    assert(srcOf(lin, "k") === Set("orders.o_id", "cust.c_id"))
  }

  test("explode output traces to the generator input; windows to their frame columns") {
    val o = spark.read.parquet(ordersPath)
    val g = o.select(explode(array(col("amount"), col("amount") * 2)).as("x"))
    assert(srcOf(Lineage.columnLineage(g), "x") === Set("orders.amount"))
    val w = o.withColumn("rk", row_number().over(
      org.apache.spark.sql.expressions.Window
        .partitionBy("cust_id").orderBy("amount")))
    val lin = Lineage.columnLineage(w)
    assert(srcOf(lin, "rk") === Set("orders.cust_id", "orders.amount"))
    assert(srcOf(lin, "o_id") === Set("orders.o_id"), "pass-through columns keep identity")
  }
}
