package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query at SPARK_GRAFT_SF_DIR and
  * prints one JSON line {"metric":"total",...} (driver contract).
  *
  * Results are written to the `noop` sink — NOT `count()` — so Catalyst
  * can't prune the computed columns away: every query pays the full cost
  * of producing its output rows, which is what a real consumer would pay.
  *
  * Before timing, every query runs once untimed at the (tiny) warmup SF:
  * the first execution of each pipeline pays JIT compilation, codegen
  * compilation, and classloading that later executions don't — measured
  * r3/r4 outliers put 80-500 s of that one-time cost on whichever query
  * ran into it first (q11 ran 85-520 s in-harness vs 1.3 s warm
  * standalone). Warming on sf0.001 costs seconds and makes the timed
  * numbers reflect steady-state query cost instead of JVM state. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)
    val spark = graft.core.GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    val w0 = System.nanoTime()
    if (warmDir.nonEmpty && new java.io.File(warmDir).isDirectory)
      ordered.foreach { case (name, fn) =>
        try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] warmup $name failed: ${e.getMessage}")
        }
      }
    val warmupSec = (System.nanoTime() - w0) / 1e9
    System.err.println(f"[bench] warmup pass: $warmupSec%.2f s")
    val results = ordered.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name: $dt%.2f s")
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"warmup_sec":$warmupSec,"sf":"$sfDir"}""")
    spark.stop()
  }
}
