package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** Multi-process commit-protocol racer (driven by MultiProcessSpec):
  * a SEPARATE JVM performing appends or a merge-on-read delete against
  * a shared warehouse table — the shape real concurrent writers have at
  * cluster scale (separate drivers, no shared locks, only the CAS
  * commit protocol between them).
  *
  * Protocol: `RaceWriter <whRoot> <syncDir> <writerId> <op>`; the
  * process writes `ready_<id>` into syncDir, spins until `go` appears
  * (so racers overlap for real), runs its op, and prints one
  * machine-readable line per op: `OK <op> <detail>` or
  * `FAIL <op> <exceptionClass>: <message>`. */
object RaceWriter {
  def main(args: Array[String]): Unit = {
    val Array(root, syncDir, idS, op) = args.take(4)
    val id = idS.toInt
    val spark = graft.core.GraftSession.builder("4")
      .appName(s"race-writer-$id").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val wh = new graft.core.Warehouse(spark, root)
    val sync = Paths.get(syncDir)
    Files.write(sync.resolve(s"ready_$id"), Array.empty[Byte])
    val deadline = System.currentTimeMillis() + 60000
    while (!Files.exists(sync.resolve("go")) &&
      System.currentTimeMillis() < deadline) Thread.sleep(5)

    def run(tag: String)(body: => String): Unit =
      try println(s"OK $tag ${body}")
      catch {
        case t: Throwable =>
          println(s"FAIL $tag ${t.getClass.getSimpleName}: " +
            Option(t.getMessage).getOrElse("").replace('\n', ' ').take(200))
      }

    op match {
      case "append" =>
        // three sequential appends; k-space disjoint per (writer, batch)
        for (b <- 0 until 3) run(s"append_${id}_$b") {
          val base = 1000L * (id * 10 + b + 1)
          wh.append("d", "t",
            (0 until 50).map(i => (base + i, s"w$id-b$b")).toDF("k", "w"))
          s"rows=50 base=$base"
        }
      case "mor3" =>
        run("mor3") {
          val r = wh.deleteWhereMor("d", "t",
            col("k") < 1000L && col("k") % 10 === 3)
          s"deleted=${r.deletedRows}"
        }
      case "mor7" =>
        run("mor7") {
          val r = wh.deleteWhereMor("d", "t",
            col("k") < 1000L && col("k") % 7 === 2)
          s"deleted=${r.deletedRows}"
        }
      case other => println(s"FAIL unknown-op $other")
    }
    spark.stop()
  }
}
