package graft

/** Dev utility: print the formatted physical plan of any SparkEntry query.
  * Usage: scripts/run.sh graft.Explain <queryName> [sfDir]
  * Plan-shape regressions are CI-gated in PlanSpec; this is the
  * interactive loop for iterating on a plan before gating it. */
object Explain {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty)
      sys.error(s"usage: Explain <queryName> [sfDir]; known: " +
        SparkEntry.queries.keys.toSeq.sorted.mkString(", "))
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = graft.core.GraftSession.builder("8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    val df = fn(spark, sfDir)
    df.explain("formatted")
    graft.plans.PlanLint.lint(df).foreach(f =>
      println(s"LINT ${f.rule} @ ${f.node}: ${f.detail}"))
    spark.stop()
  }
}
