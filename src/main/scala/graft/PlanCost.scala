package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.core.Warehouse

/** Driver-side PLAN cost probe for the SQL pruning path on a
  * many-fragment table (the append-heavy shape: one fragment per
  * micro-batch). Usage: `PlanCost [nFrags] [rowsPerFrag]` — builds the
  * table by repeated appends, then times the ANALYSIS of a SQL point
  * query (which includes the sidecar-pruning pass) cold and warm, plus
  * the executed query. Prints one JSON line. The claim under test:
  * with the process-wide sidecar cache, a thousand-fragment table pays
  * the sidecar file opens ONCE, and every later statement plans from
  * memory. */
object PlanCost {
  def main(args: Array[String]): Unit = {
    val nFrags = if (args.length > 0) args(0).toInt else 400
    val rowsPer = if (args.length > 1) args(1).toInt else 2000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = graft.core.GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = Files.createTempDirectory("plancost").toString
    val wh = new Warehouse(spark, root)
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val (_, buildSec) = timed {
      for (i <- 0 until nFrags) {
        wh.append("d", "t", spark.range(
            i.toLong * rowsPer, (i + 1).toLong * rowsPer)
          .select(col("id").as("k"), (col("id") % 1000).as("v"))
          .coalesce(1))
      }
    }
    spark.conf.set("spark.sql.catalog.pc", classOf[graft.sql.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.pc.root", root)
    val q = "SELECT count(*) AS n FROM pc.d.t WHERE k = 42"
    val (_, coldPlanSec) = timed(spark.sql(q).queryExecution.optimizedPlan)
    val (_, warmPlanSec) = timed(spark.sql(q).queryExecution.optimizedPlan)
    val (n, execSec) = timed(spark.sql(q).head().getLong(0))
    require(n == 1L, s"point query returned $n rows")
    // the monotonic-key append shape: the probe key lives in exactly one
    // fragment, so the pruned scan must open ~1 of nFrags
    val (scan, total) = wh.scanFootprint("d", "t", col("k") === 42L)
    println(s"""{"frags":$nFrags,"rows_per_frag":$rowsPer,""" +
      s""""build_sec":${f"$buildSec%.1f"},"cold_plan_sec":${f"$coldPlanSec%.3f"},""" +
      s""""warm_plan_sec":${f"$warmPlanSec%.3f"},"exec_sec":${f"$execSec%.3f"},""" +
      s""""scan_files":$scan,"total_files":$total}""")
    spark.stop()
  }
}
