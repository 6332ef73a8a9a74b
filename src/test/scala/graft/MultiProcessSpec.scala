package graft

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Warehouse

/** The commit protocol under SEPARATE-JVM writers — the shape real
  * clusters have (independent drivers, no shared memory, only the
  * CREATE_NEW manifest CAS between them). Four child JVMs race against
  * one table: two appenders (3 batches each) and two merge-on-read
  * deleters whose victim sets live in the same seed fragment (a genuine
  * dv-pointer conflict). Invariants, independent of interleaving:
  * every successful append's rows land EXACTLY once, every successful
  * MoR delete's victims are gone, failures are loud
  * ConcurrentModificationExceptions, versions are gap-free, and no
  * orphan files survive. */
class MultiProcessSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private def childClasspath: String = {
    val target = java.nio.file.Paths.get("target", "scala-2.13").toAbsolutePath
    Seq(target.resolve("classes").toString,
      "/opt/spark/jars/*").mkString(":")
  }

  private def launch(root: String, sync: Path, id: Int, op: String): (Process, Path) = {
    val out = Files.createTempFile(s"race_${op}_$id", ".out")
    val pb = new ProcessBuilder(
      Seq("java", "-Xmx3g", "-XX:+UseG1GC",
        "--add-opens=java.base/java.lang=ALL-UNNAMED",
        "--add-opens=java.base/java.nio=ALL-UNNAMED",
        "--add-opens=java.base/java.util=ALL-UNNAMED",
        "--add-opens=java.base/sun.nio.ch=ALL-UNNAMED",
        "--add-opens=java.base/sun.util.calendar=ALL-UNNAMED",
        "--add-opens=java.base/sun.security.action=ALL-UNNAMED",
        "-cp", childClasspath, "graft.RaceWriter",
        root, sync.toString, id.toString, op).asJava)
    pb.redirectErrorStream(false)
    pb.redirectOutput(out.toFile)
    (pb.start(), out)
  }

  test("two appender JVMs + two MoR-deleter JVMs race one table safely") {
    val root = Files.createTempDirectory("mproc").toString
    val wh = new Warehouse(spark, root)
    wh.overwrite("d", "t",
      (0L until 1000L).map(k => (k, "seed")).toDF("k", "w")) // v1
    val sync = Files.createTempDirectory("mproc_sync")
    val procs = Seq(
      launch(root, sync, 1, "append"), launch(root, sync, 2, "append"),
      launch(root, sync, 3, "mor3"), launch(root, sync, 4, "mor7"))
    // barrier: all children up, then fire
    val deadline = System.currentTimeMillis() + 60000
    while ((1 to 4).exists(i => !Files.exists(sync.resolve(s"ready_$i"))) &&
      System.currentTimeMillis() < deadline) Thread.sleep(20)
    Files.write(sync.resolve("go"), Array.empty[Byte])
    procs.foreach { case (p, _) =>
      assert(p.waitFor(180, java.util.concurrent.TimeUnit.SECONDS),
        "child JVM must terminate") }
    procs.foreach { case (p, out) =>
      assert(p.exitValue() === 0, Files.readString(out)) }
    val lines = procs.flatMap { case (_, out) =>
      Files.readAllLines(out).asScala.filter(l =>
        l.startsWith("OK ") || l.startsWith("FAIL ")) }
    assert(lines.nonEmpty, "children must report their ops")
    // every FAILURE is the loud CAS kind, never silent corruption
    lines.filter(_.startsWith("FAIL")).foreach(l =>
      assert(l.contains("ConcurrentModificationException"), l))
    // appends: 6 batches total, each must have landed exactly once (the
    // CAS rebase makes appends always succeed)
    val okAppends = lines.filter(l => l.startsWith("OK append")).length
    assert(okAppends === 6, s"all appends must land via rebase:\n${lines.mkString("\n")}")
    val table = wh.read("d", "t")
    for (id <- Seq(1, 2); b <- 0 until 3) {
      val base = 1000L * (id * 10 + b + 1)
      assert(table.filter(col("k") >= base && col("k") < base + 50).count() === 50L,
        s"append batch writer=$id b=$b must be present exactly once")
    }
    assert(table.filter(col("k") >= 1000L).count() === 300L,
      "no appended row may be duplicated or lost")
    // MoR deletes: each success's victims are fully gone from the seed
    val seedLeft = table.filter(col("k") < 1000L)
    if (lines.exists(_.startsWith("OK mor3")))
      assert(seedLeft.filter(col("k") % 10 === 3).count() === 0L)
    if (lines.exists(_.startsWith("OK mor7")))
      assert(seedLeft.filter(col("k") % 7 === 2).count() === 0L)
    // remaining seed = seed minus the union of SUCCESSFUL masks
    val expectSeed = (0L until 1000L).count { k =>
      !(lines.exists(_.startsWith("OK mor3")) && k % 10 == 3) &&
      !(lines.exists(_.startsWith("OK mor7")) && k % 7 == 2)
    }
    assert(seedLeft.count() === expectSeed.toLong)
    // version chain is gap-free (CREATE_NEW manifests can't collide)
    val versions = wh.log("d", "t").commits.map(_.version)
    assert(versions === (1 to versions.max).toSeq,
      s"versions must be contiguous: $versions")
    // nothing dangling: failed ops cleaned their fragments/vectors
    assert(wh.orphanFiles("d", "t", graceMillis = 0L).isEmpty)
  }
}
