package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** The steady-drift cross-check must compare against the prior ROUND's
  * baseline, not whatever the last interim run left in the working
  * tree. r16 shipped a +39%-vs-prior-round steady unannotated because
  * the harness ran multiple times in one session and each run
  * overwrote the baseline the next compared against (baseline
  * EROSION). The fix reads `git show HEAD:bench_summary.json`: only a
  * commit moves the baseline, so an interim run CANNOT mask a
  * >20%-vs-prior-round drift. */
class BenchBaselineSpec extends AnyFunSuite {

  private def sh(dir: java.io.File, cmd: String*): Unit = {
    val pb = new ProcessBuilder(cmd: _*)
    pb.directory(dir)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes())
    assert(p.waitFor() == 0, s"${cmd.mkString(" ")} failed: $out")
  }

  private def summary(steadySec: Double): String =
    s"""{"metric":"total","unit":"sec","steady":{"q84_sql_dml":$steadySec,"q1":1.00},"value":42.0}"""

  test("interim runs cannot erode the prior-round steady baseline") {
    val dir = Files.createTempDirectory("bench_baseline").toFile
    sh(dir, "git", "init", "-q")
    sh(dir, "git", "config", "user.email", "t@t")
    sh(dir, "git", "config", "user.name", "t")
    // round close: committed baseline says 3.0 s
    Files.writeString(dir.toPath.resolve("bench_summary.json"), summary(3.0))
    sh(dir, "git", "add", "bench_summary.json")
    sh(dir, "git", "commit", "-qm", "round close")
    // interim run inside the next session: working file now says 4.6 s
    Files.writeString(dir.toPath.resolve("bench_summary.json"), summary(4.6))
    val prior = Bench.committedPriorSteady(dir)
    // the baseline is the COMMITTED 3.0, not the eroded 4.6: a second
    // 4.2 s reading still trips 4.2 > 3.0 * 1.2 (against 4.6 it would
    // have shipped silently — the exact r16 masking)
    assert(prior.get("q84_sql_dml").contains(3.0))
    assert(4.2 > prior("q84_sql_dml") * 1.2)
    assert(prior.get("q1").contains(1.0))
  }

  test("fallback: no git repo reads the working file; neither = empty") {
    val dir = Files.createTempDirectory("bench_nogit").toFile
    Files.writeString(dir.toPath.resolve("bench_summary.json"), summary(2.5))
    assert(Bench.committedPriorSteady(dir).get("q84_sql_dml").contains(2.5))
    val empty = Files.createTempDirectory("bench_empty").toFile
    assert(Bench.committedPriorSteady(empty).isEmpty)
  }

  test("intra-round close commits cannot ratchet the cross-round baseline") {
    // r17 shipped q66/q72 steady creep of +30-40% vs r16 with zero
    // triggers: the round committed interim close snapshots, so the
    // HEAD baseline moved with each commit and every step stayed under
    // the >20% trigger. The round artifact BENCH_r{N}.json only moves
    // at a round boundary; the cross-round baseline takes the MIN of
    // the two, so the cumulative creep trips even when HEAD ratchets.
    val dir = Files.createTempDirectory("bench_xround").toFile
    sh(dir, "git", "init", "-q")
    sh(dir, "git", "config", "user.email", "t@t")
    sh(dir, "git", "config", "user.name", "t")
    // round boundary: the driver artifact recorded 5.13 s (its tail is
    // a JSON-ESCAPED string of the summary, as the driver writes it)
    Files.writeString(dir.toPath.resolve("BENCH_r16.json"),
      """{"n":16,"tail":"...,\"steady\":{\"q66_delete_dv\":5.13,\"ctl\":2.00},\"value\":250.0}"}""")
    // the round then committed progressively hotter close snapshots:
    // HEAD's baseline has ratcheted to 6.66
    Files.writeString(dir.toPath.resolve("bench_summary.json"),
      summary(3.0).replace(""""q84_sql_dml":3.0""",
        """"q66_delete_dv":6.66,"ctl":2.00"""))
    sh(dir, "git", "add", ".")
    sh(dir, "git", "commit", "-qm", "interim close")
    val (src, base) = Bench.crossRoundBaseline(dir)
    assert(src == "HEAD+BENCH_r16", src)
    // the baseline is the round boundary's 5.13, not the ratcheted 6.66
    assert(base.get("q66_delete_dv").contains(5.13), base.toString)
    // a 6.66 reading NOW trips: 6.66 > 5.13 * 1.2
    assert(6.66 > base("q66_delete_dv") * 1.2)
    // ...and against the ratcheted HEAD alone it would have shipped
    assert(6.66 < 6.66 * 1.2 + 1e-9)
    // the control is present in both sources for ambient normalization
    assert(base.get("ctl").contains(2.00))
  }

  test("parseSteady reads the steady block only") {
    val m = Bench.parseSteady(
      """{"queries":{"a":9.0},"steady":{"a":1.25,"b":0.5},"value":10}""")
    assert(m === Map("a" -> 1.25, "b" -> 0.5))
    assert(Bench.parseSteady("""{"value":10}""").isEmpty)
  }
}
