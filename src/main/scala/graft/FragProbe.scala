package graft

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** Fragment-count × rename-chain plan-cost probe (r17 judge item 6):
  * how does read PLANNING scale when a table holds thousands of
  * fragments under a 20-link rename chain? Builds a table with one
  * real tiny fragment cloned N times on disk (hand-committed in one
  * manifest — the probe measures planning, not write throughput),
  * applies a rename chain, and reports wall times for plan
  * construction and a count() execution.
  *
  * Usage: FragProbe [nFragments] [nLinks]  →  one JSON line.
  * Findings land in SCALE.md (round-18 section). */
object FragProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(2000)
    val links = args.lift(1).map(_.toInt).getOrElse(20)
    val spark = graft.core.GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val root = Files.createTempDirectory("fragprobe")
    val wh = new graft.core.Warehouse(spark, root.toString)
    wh.overwrite("d", "t", Seq((1L, 10L)).toDF("id", "c0"))
    val lg = wh.log("d", "t")
    val cur = lg.latest.get
    val td = root.resolve("d/t")
    val src = td.resolve(cur.entries.head.path)

    def copyDir(from: Path, to: Path): Unit = {
      Files.createDirectories(to)
      val ls = Files.list(from)
      try ls.iterator().asScala.filter(Files.isRegularFile(_)).foreach(f =>
        Files.copy(f, to.resolve(f.getFileName.toString)))
      finally ls.close()
    }

    val entries = cur.entries ++ (1 until n).map { _ =>
      val frag = lg.newFragmentDir()
      copyDir(src, frag)
      graft.core.SnapshotLog.Entry("",
        td.toAbsolutePath.relativize(frag.toAbsolutePath).toString, era = 0)
    }
    lg.commit("write", entries, schemaDdl = cur.schemaDdl)
    (1 to links).foreach { i =>
      wh.renameColumn("d", "t", if (i == 1) "c0" else s"r${i - 1}", s"r$i")
    }

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    // warm classloading/analysis machinery on a 1-fragment sibling
    wh.overwrite("d", "warm", Seq((1L, 1L)).toDF("id", "c0"))
    wh.read("d", "warm").count()

    val (df, tPlan) = timed(wh.read("d", "t"))
    val (_, tAnalyze) = timed(df.queryExecution.optimizedPlan)
    val (rows, tExec) = timed(df.count())
    println(f"""{"fragments":$n,"links":$links,"rows":$rows,"plan_sec":$tPlan%.3f,"optimize_sec":$tAnalyze%.3f,"count_sec":$tExec%.3f}""")
    spark.stop()
  }
}
