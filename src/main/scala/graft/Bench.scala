package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main: runs every SparkEntry query at SPARK_GRAFT_SF_DIR.
  *
  * Driver contract: stdout ends with TWO JSON lines — a full record
  * {"metric":"total","unit":"sec","sf":…,"queries":{…},"failed":[…],
  * "warmup_sec":…,"value":total} followed by a short total-only line
  * {"metric":"total","unit":"sec","value":total}. The SHORT FINAL LINE IS
  * AUTHORITATIVE for the headline number (the driver captures a log tail
  * whose window can start mid-line; the full record also lands verbatim in
  * bench_summary.json, which is where per-query numbers should be read).
  *
  * Results are written to the `noop` sink — NOT `count()` — so Catalyst
  * can't prune the computed columns away: every query pays the full cost
  * of producing its output rows, which is what a real consumer would pay.
  *
  * Every query runs TWICE, serially, AT THE TIMED SCALE FACTOR (sfDir
  * itself), and reports the min of its two runs. Warming at a smaller SF
  * is not enough: AQE resolves different physical plans per input size
  * (broadcast-vs-SMJ switches, partition coalescing), so a tiny-SF warmup
  * compiles the wrong codegen classes and never touches the timed files —
  * r8/r9 kept capturing 4-10x cold outliers on a rotating set of queries.
  * Pass 1 pays JIT + codegen + page cache against the exact plans AQE
  * picks (its total is exported as "warmup_sec" for round-over-round
  * continuity); min-of-2 then keeps the steady-state property while the
  * warmup bill also produces a timing sample instead of being discarded.
  *
  * A query that throws in BOTH passes is recorded in "failed" with a null
  * time — never as a (meaninglessly fast) time-to-exception — and a
  * non-empty failed list nulls the HEADLINE total too: totals are only
  * comparable across identical query sets, and a slow-but-passing query
  * regressing into throwing must never read as an improvement.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)
    val spark = graft.core.GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    def runOnce(name: String, fn: (SparkSession, String) => DataFrame,
                dir: String, tag: String): Boolean =
      try { fn(spark, dir).write.format("noop").mode("overwrite").save(); true }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $tag $name failed: ${e.getMessage}")
        false
      }
    // Optional extra tiny-SF pass (opt-in, SPARK_GRAFT_WARM_DIR): pays
    // classloading early on a cheap pass. Correctness of the timing does
    // not depend on it — the sfDir warmup below is what matters.
    sys.env.get("SPARK_GRAFT_WARM_DIR").filter(_.nonEmpty).foreach { wd =>
      if (new java.io.File(wd).isDirectory)
        ordered.foreach { case (n, f) => runOnce(n, f, wd, "prewarm") }
    }
    // Two serial passes at the TIMED SF; each query reports the MIN of
    // its two runs. Pass 1 doubles as the warmup (it pays JIT + codegen +
    // page cache against the exact plans AQE picks at this SF — warming
    // at a smaller SF compiles the wrong plans, the r7-r9 defect), so the
    // warmup bill now also produces a timing sample instead of being
    // thrown away; min-of-2 keeps the steady-state property (the cold
    // pass-1 outliers lose the min). Serial, not pooled — a parallel
    // pass leaves different JIT/GC state behind and drifted the timed
    // medians ~1.3x in r8.
    def timedPass(tag: String): Seq[(String, Double, Boolean)] = {
      val p0 = System.nanoTime()
      val rs = ordered.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok = runOnce(name, fn, sfDir, tag)
        val dt = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[bench] $tag $name: $dt%.2f s" + (if (ok) "" else " (FAILED)"))
        (name, dt, ok)
      }
      System.err.println(f"[bench] $tag pass at $sfDir: ${(System.nanoTime() - p0) / 1e9}%.2f s")
      rs
    }
    val pass1 = timedPass("pass1")
    val warmupSec = pass1.map(_._2).sum // pass-1 (cold) total, for continuity
    val pass2 = timedPass("pass2")
    // a query is failed only if NO pass completed it; its time is the
    // min over completed passes
    val results = pass1.zip(pass2).map { case ((name, t1, ok1), (_, t2, ok2)) =>
      val ts = Seq((t1, ok1), (t2, ok2)).collect { case (t, true) => t }
      (name, if (ts.nonEmpty) ts.min else Double.NaN, ts.nonEmpty)
    }
    val qs = results.map { case (k, v, ok) =>
      if (ok) f""""$k":$v%.3f""" else s""""$k":null""" }
      .mkString("{", ",", "}")
    val failedList = results.filterNot(_._3).map(_._1)
    val failed = failedList.map(n => s""""$n"""").mkString("[", ",", "]")
    // A non-empty failed list INVALIDATES the headline: summing only the
    // surviving queries would let a slow-but-passing query that regresses
    // into throwing READ AS an improvement in round-over-round totals.
    // Totals are only comparable across identical query sets.
    val total = results.filter(_._3).map(_._2).sum
    val totalJson = if (failedList.isEmpty) f"$total%.3f" else "null"
    // Untimed side-channel: measured ANN recall@k vs brute force AND
    // candidates scored per query for each index variant, so every bench
    // round prints the recall/cost trade next to the sim_topk_* timings
    // instead of burying it in specs.
    val annRecall =
      try graft.llmops.RecallReport.annRecall(spark, sfDir)
        .map { case (k, s) =>
          f""""$k":{"recall":${s.recall}%.4f,"cands_per_query":${s.candsPerQuery}%.1f}"""
        }.mkString("{", ",", "}")
      catch { case e: Throwable =>
        System.err.println(s"[bench] ann_recall failed: ${e.getMessage}")
        "{}"
      }
    // "value" (the headline total) goes LAST in the full record: the
    // driver captures a log TAIL and a capture window can start mid-line —
    // per-query keys may truncate, the total must not.
    val json =
      f"""{"metric":"total","unit":"sec","sf":"$sfDir","queries":$qs,"failed":$failed,"ann_recall":$annRecall,"passes":2,"warmup_sec":$warmupSec%.2f,"value":$totalJson}"""
    try {
      val w = new java.io.PrintWriter("bench_summary.json")
      try w.println(json) finally w.close()
    } catch { case e: Throwable =>
      System.err.println(s"[bench] bench_summary.json write failed: ${e.getMessage}")
    }
    System.err.println(f"[bench] total: $total%.2f s over ${results.size} queries" +
      (if (failed != "[]") s", FAILED: $failed" else ""))
    println(json)
    // Final short line (<100 bytes) — the authoritative headline, too
    // short to straddle any tail-capture boundary. null when any query
    // failed (see totalJson above).
    println(s"""{"metric":"total","unit":"sec","value":$totalJson}""")
    System.out.flush()
    spark.stop()
  }
}
