package graft

/** Dev utility: print the ANN recall/cost side-channel for one SF dir
  * without running the full bench. Usage: Recall [sfDir] */
object Recall {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)
    val spark = graft.core.GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.llmops.RecallReport.annRecall(spark, sfDir).foreach { case (k, s) =>
      println(f"$k%-24s recall=${s.recall}%.4f cands_per_query=${s.candsPerQuery}%.1f")
    }
    spark.stop()
  }
}
