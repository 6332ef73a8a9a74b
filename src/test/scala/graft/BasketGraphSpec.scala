package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Warehouse
import graft.operators.BasketGraph

/** The built-once co-purchase basket-graph artifact: artifact-served
  * results must be EXACTLY the from-scratch build's for every consumer,
  * the in-process memo must actually serve (no rebuild per query), the
  * warehouse form must round-trip, and incremental appendOrders must be
  * equivalent to a full rebuild. */
class BasketGraphSpec extends AnyFunSuite {
  import TestSession._

  private def fromScratchHalf(dir: String): DataFrame = {
    val pp = core.Tables.load(spark, dir, "lineitem")
      .filter(col("l_orderkey").isNotNull && col("l_partkey").isNotNull)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    pp.as("a").join(pp.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("src"), col("b.p").as("dst"))
      .agg(count(lit(1)).as("w"))
  }

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("halfEdges artifact == from-scratch rollup; memo serves the same staged frame") {
    BasketGraph.invalidate()
    val a = BasketGraph.halfEdges(spark, sf)
    assert(rows(a) === rows(fromScratchHalf(sf)))
    // the second call must return the SAME staged frame, not a rebuild
    assert(BasketGraph.halfEdges(spark, sf) eq a,
      "memo must serve the staged artifact, not rebuild")
  }

  test("all five graph-family derivations match their pre-artifact from-scratch forms") {
    BasketGraph.invalidate()
    val half = fromScratchHalf(sf)
    // Triangles input: support >= 1, unweighted
    assert(rows(BasketGraph.supportEdges(spark, sf, 1)) ===
      rows(half.select("src", "dst")))
    // Components/KCore/LinkPred input: support >= 2, unweighted
    assert(rows(BasketGraph.supportEdges(spark, sf, 2)) ===
      rows(half.filter(col("w") >= 2).select("src", "dst")))
    // LabelProp input: mirrored, weighted
    assert(rows(BasketGraph.mirroredEdges(spark, sf)) ===
      rows(half.unionByName(
        half.select(col("dst").as("src"), col("src").as("dst"), col("w")))))
  }

  test("warehouse save/load round-trips the artifact and feeds consumers identically") {
    val wh = new Warehouse(spark, Files.createTempDirectory("bg_spec").toString)
    BasketGraph.save(wh, "graph", "basket_half_edges", spark, sf)
    val loaded = BasketGraph.load(wh, "graph", "basket_half_edges")
    assert(rows(loaded) === rows(fromScratchHalf(sf)))
    // consumer parity through the persisted table
    val viaTable = graft.operators.Triangles.triangleCounts(
      loaded.select("src", "dst"))
    val viaMemo = graft.operators.Triangles.qTriangles(spark, sf)
    assert(rows(viaTable) === rows(viaMemo))
  }

  test("appendOrders(batch) == full rebuild: new orders extend the standing artifact exactly") {
    import spark.implicits._
    val wh = new Warehouse(spark, Files.createTempDirectory("bg_incr").toString)
    // corpus A: orders 1..3; corpus B: NEW orders 4..5 (orders atomic,
    // so batch pairs never span A and B). Weight overlap is the point:
    // (10,20) appears in both A and B and must sum to w=3.
    val aPp = Seq(
      (1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 10L), (2L, 20L),
      (3L, 40L), (3L, 50L)).toDF("o", "p")
    val bPp = Seq(
      (4L, 10L), (4L, 20L),          // repeats an existing pair
      (5L, 40L), (5L, 60L), (5L, 70L)) // one old node, two new
      .toDF("o", "p")
    wh.overwrite("graph", "he", BasketGraph.rollup(aPp))
    BasketGraph.appendOrders(wh, "graph", "he", bPp)
    val incremental = rows(wh.read("graph", "he"))
    val rebuilt = rows(BasketGraph.rollup(aPp.unionByName(bPp)))
    assert(incremental === rebuilt)
    // sanity on the summed key
    assert(incremental.contains(Seq(10L, 20L, 3L)))
  }
}
