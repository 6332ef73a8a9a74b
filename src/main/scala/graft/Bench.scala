package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

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
    // Queries that mutate shared session state (catalog tables, fixed-name
    // temp views, streaming micro-batch machinery) must warm one at a
    // time; everything else is a pure read→transform→noop pipeline whose
    // warmup cost is driver-side codegen + JIT — embarrassingly parallel
    // on one session (Spark schedules concurrent jobs fine). r7's serial
    // warmup had grown to 124 s, dominating bench wall time.
    val statefulWarm = Set(
      "q12_time_travel", "q13_incremental", "q14_scd2", "q15_catalog",
      "q16_stream_hourly", "q17_expire", "q18_scd2_merge", "q19_stream_dedup",
      "q20_data_tests", "q21_build", "q27_stream_sessions", "q28_stream_join",
      "q29_bucketed_join", "q39_stream_hll", "q44_stream_enrich",
      "q47_daily_delta", "q48_snapshot_diff")
    def warmOne(name: String, fn: (SparkSession, String) => DataFrame): Unit =
      try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] warmup $name failed: ${e.getMessage}")
      }
    // Warmup mode. r8 warmed the pure queries on an 8-thread pool, which
    // saved only ~14 s of wall time vs r7's serial pass but coincided with
    // an unexplained ~1.3x median drift in the TIMED numbers (8 untouched
    // queries >=2x slower) — the parallel pass leaves different JIT/GC
    // state behind, and it also raced the stateful warmups (they ran on
    // the main thread WHILE the pool was busy). Default is back to serial
    // — the timed numbers are the product; warmup wall time is not.
    // "parallel" stays selectable for A/B runs, with the race fixed:
    // futures fully Awaited BEFORE the stateful sequential loop starts.
    val warmMode = sys.env.getOrElse("SPARK_GRAFT_WARMUP_MODE", "serial")
    val w0 = System.nanoTime()
    if (warmDir.nonEmpty && new java.io.File(warmDir).isDirectory) {
      if (warmMode == "parallel") {
        val (seq, par) = ordered.partition(q => statefulWarm(q._1))
        val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
        implicit val ec: scala.concurrent.ExecutionContext =
          scala.concurrent.ExecutionContext.fromExecutorService(pool)
        val futs = par.map { case (n, f) =>
          scala.concurrent.Future(warmOne(n, f)) }
        scala.concurrent.Await.result(
          scala.concurrent.Future.sequence(futs),
          scala.concurrent.duration.Duration.Inf)
        pool.shutdown()
        seq.foreach { case (n, f) => warmOne(n, f) }
      } else {
        ordered.foreach { case (n, f) => warmOne(n, f) }
      }
    }
    // Settle the heap before timing: the warmup pass (especially a
    // parallel one) leaves allocation pressure that otherwise lands as GC
    // pauses inside whichever timed query runs first.
    System.gc()
    Thread.sleep(500)
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
    val qs = results.map { case (k, v) => f""""$k":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // "value" (the headline total) goes LAST: the driver captures a log
    // TAIL, and r7's capture started mid-line, hiding the leading keys of
    // a 3KB JSON line — the per-query map can lose entries to truncation,
    // the total must not. A full copy also lands in bench_summary.json so
    // the whole summary survives any log windowing.
    val json =
      f"""{"metric":"total","unit":"sec","sf":"$sfDir","queries":$qs,"warmup_sec":$warmupSec%.2f,"value":$total%.3f}"""
    try {
      val w = new java.io.PrintWriter("bench_summary.json")
      try w.println(json) finally w.close()
    } catch { case e: Throwable =>
      System.err.println(s"[bench] bench_summary.json write failed: ${e.getMessage}")
    }
    System.err.println(f"[bench] total: $total%.2f s over ${results.size} queries")
    println(json)
    // The driver captures a log TAIL whose window can start mid-line; the
    // 3 KB line above was "parsed": null two rounds running because of it.
    // Emit a final total-only line (<100 bytes) as the very LAST stdout —
    // too short to straddle any tail boundary.
    println(f"""{"metric":"total","unit":"sec","value":$total%.3f}""")
    System.out.flush()
    spark.stop()
  }
}
