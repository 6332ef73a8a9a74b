package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.core.{Tables, Warehouse}

/** Scale probe for the round-16 layout features: z-order rewrite cost
  * and the √F serving claim across corpus decades, plus the SQL
  * plan-time pruning path. Usage: `ZScale <sfDir> [targetBytes]` —
  * prints one JSON line:
  * rows / land / rewrite seconds, output file count, files scanned for
  * a point predicate on EACH curve dimension, the pruned-SQL vs
  * full-scan wall times for the same point count(*), and the pure
  * PLAN-time cost of the pruned SQL (analysis incl. sidecar pruning).
  * Fixed targetBytes across scale factors means the file count F grows
  * linearly with data — the claim under test is scanned ≈ O(√F). */
object ZScale {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val targetBytes = if (args.length > 1) args(1).toLong else 8L << 20
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = graft.core.GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = Files.createTempDirectory("zscale").toString
    val wh = new Warehouse(spark, root)
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("l_quantity"))
    val (_, landSec) = timed(wh.overwrite("d", "zli", li))
    val rows = wh.read("d", "zli").count()
    val (_, rewriteSec) = timed(
      wh.zorderCluster("d", "zli", "l_partkey", "l_suppkey", targetBytes))
    val (sa, total) = wh.scanFootprint("d", "zli", col("l_partkey") === 50)
    val (sb, _) = wh.scanFootprint("d", "zli", col("l_suppkey") === 3)
    spark.conf.set("spark.sql.catalog.zc", classOf[graft.sql.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.zc.root", root)
    def q = "SELECT count(*) AS n FROM zc.d.zli WHERE l_partkey = 50"
    val (_, planSec) = timed(spark.sql(q).queryExecution.optimizedPlan)
    val (nPruned, prunedSec) = timed(spark.sql(q).head().getLong(0))
    val (nFull, fullSec) = timed(
      wh.read("d", "zli").filter(col("l_partkey") === 50).count())
    require(nPruned == nFull, s"pruned SQL diverged: $nPruned vs $nFull")
    println(s"""{"dir":"$dir","rows":$rows,"land_sec":${f"$landSec%.2f"},""" +
      s""""rewrite_sec":${f"$rewriteSec%.2f"},"files":$total,""" +
      s""""scan_partkey":$sa,"scan_suppkey":$sb,"point_rows":$nPruned,""" +
      s""""sql_pruned_sec":${f"$prunedSec%.2f"},"full_scan_sec":${f"$fullSec%.2f"},""" +
      s""""plan_sec":${f"$planSec%.2f"}}""")
    spark.stop()
  }
}
