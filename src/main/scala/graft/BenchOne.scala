package graft

/** Debug main: time one named query repeatedly; print the formatted plan.
  * Usage: BenchOne <name> <sfDir> [reps] [explain]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)
    val spark = graft.core.GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    if (args.length > 3 && args(3) == "explain")
      fn(spark, sfDir).explain("formatted")
    val times = (1 to reps).map { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[$name] rep $i: $dt%.2f s")
      dt
    }
    // steady state = min over post-warmup reps (rep 1 pays JIT+codegen);
    // machine-parseable line consumed by Bench's steady side channel
    val steady = if (times.length > 1) times.tail.min else times.head
    println(f"STEADY $name $steady%.3f")
    spark.stop()
  }
}
