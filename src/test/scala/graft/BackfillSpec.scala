package graft

import java.time.LocalDate
import org.scalatest.funsuite.AnyFunSuite
import graft.backfill.Backfill._

/** Pure-logic backfill machinery: table-driven cases mirroring the
  * reference's unit tests (tests/test_backfill.py) plus seeded
  * property-style invariants for the chunker/codec/mangler. */
class BackfillSpec extends AnyFunSuite {

  private val d = LocalDate.parse(_: String)
  private val rnd = new scala.util.Random(42)
  private def cases(n: Int)(body: => Unit): Unit = (1 to n).foreach(_ => body)

  test("chunkDateRange splits inclusively with remainder in last chunk") {
    assert(chunkDateRange(d("2025-01-01"), d("2025-01-10"), 4) ===
      Seq((d("2025-01-01"), d("2025-01-04")),
        (d("2025-01-05"), d("2025-01-08")),
        (d("2025-01-09"), d("2025-01-10"))))
    assert(chunkDateRange(d("2025-01-01"), d("2025-01-01"), 30) ===
      Seq((d("2025-01-01"), d("2025-01-01"))))
  }

  private def randDate(): LocalDate = LocalDate.ofEpochDay(rnd.nextInt(20000).toLong)

  test("chunkDateRange covers the range exactly, in order, without overlap") {
    cases(200) {
      val first = randDate()
      val batch = 1 + rnd.nextInt(60)
      val last = first.plusDays(rnd.nextInt(400).toLong)
      val chunks = chunkDateRange(first, last, batch)
      assert(chunks.head._1 === first)
      assert(chunks.last._2 === last)
      chunks.foreach { case (s, e) =>
        assert(!s.isAfter(e))
        assert(java.time.temporal.ChronoUnit.DAYS.between(s, e) < batch)
      }
      chunks.sliding(2).foreach {
        case Seq((_, e1), (s2, _)) => assert(s2 === e1.plusDays(1))
        case _ =>
      }
    }
  }

  test("task-range codec round-trips") {
    cases(200) {
      val first = randDate()
      val ranges = chunkDateRange(first, first.plusDays(rnd.nextInt(100).toLong), 1 + rnd.nextInt(40))
      assert(decodeTaskRanges(encodeTaskRanges(ranges)) === ranges)
    }
  }

  test("decodeTaskRanges skips blanks and tolerates whitespace") {
    assert(decodeTaskRanges(" 2025-01-01:2025-01-03 ,, 2025-01-04 : 2025-01-05") ===
      Seq((d("2025-01-01"), d("2025-01-03")), (d("2025-01-04"), d("2025-01-05"))))
  }

  test("halveStr keeps first and last quarters") {
    assert(halveStr("abcdefgh") === "abgh")
    assert(halveStr("ab") === "ab") // quarter clamps to 1
    assert(halveStr("abc") === "ac")
  }

  test("backfillJobName strips +, maps _ to -, and stays within 64 chars") {
    assert(backfillJobName("+my_model+") === "my-model")
    cases(200) {
      val words = Seq.fill(1 + rnd.nextInt(8))(
        rnd.alphanumeric.filter(_.isLower).take(1 + rnd.nextInt(40)).mkString)
      val s = words.mkString("_")
      val n = backfillJobName(s)
      assert(n.length <= 64)
      assert(!n.contains("_") && !n.contains("+"))
    }
  }

  test("estimateBatchSize: floor division, clamp to 1, min across models, default fallbacks") {
    val target = targetBytes(600) // 48 GB (BASELINE.md)
    assert(target === 48000000000L)
    // floor division: 48GB / 20GB/day = 2 (test_backfill.py floor case)
    assert(estimateBatchSize(Seq(Some(20000000000L)), 30, target) === 2)
    // clamp to 1 when a day exceeds the target
    assert(estimateBatchSize(Seq(Some(100000000000L)), 30, target) === 1)
    // min across models
    assert(estimateBatchSize(Seq(Some(20000000000L), Some(1000000000L)), 30, target) === 2)
    // skip zero/None estimates; all skipped → default
    assert(estimateBatchSize(Seq(Some(0L), None), 30, target) === 30)
    assert(estimateBatchSize(Seq.empty, 30, target) === 30)
    // large target clamps to default
    assert(estimateBatchSize(Seq(Some(1L)), 30, target) === 30)
  }

  test("rangeForTaskIndex: offset arithmetic with clamped end; explicit ranges win") {
    assert(rangeForTaskIndex(0, d("2025-01-01"), d("2025-01-10"), 4) ===
      (d("2025-01-01"), d("2025-01-04")))
    assert(rangeForTaskIndex(2, d("2025-01-01"), d("2025-01-10"), 4) ===
      (d("2025-01-09"), d("2025-01-10")))
    assert(rangeForTaskIndex(1, d("2025-01-01"), d("2025-01-10"), 4,
      Some("2025-02-01:2025-02-02,2025-02-03:2025-02-04")) ===
      (d("2025-02-03"), d("2025-02-04")))
    assertThrows[IllegalArgumentException] {
      rangeForTaskIndex(5, d("2025-01-01"), d("2025-01-10"), 4, Some("2025-02-01:2025-02-02"))
    }
  }

  test("materialization census counts by key") {
    assert(materializationCensus(Seq("table", "view", "table")) ===
      Map("table" -> 2, "view" -> 1))
  }

  test("parallel run reports per-task status; retryRanges re-chunks failures") {
    val ranges = chunkDateRange(d("2025-01-01"), d("2025-01-12"), 3)
    val results = graft.backfill.Backfill.run(ranges, parallelism = 4) { case (s, _) =>
      if (s == d("2025-01-04")) sys.error("boom")
    }
    assert(results.count(_.success) === 3)
    val retry = retryRanges(results, rechunkBatchSize = Some(1))
    assert(retry === Seq((d("2025-01-04"), d("2025-01-04")),
      (d("2025-01-05"), d("2025-01-05")), (d("2025-01-06"), d("2025-01-06"))))
  }

  test("serial run (parallelism=1) stops at first failure") {
    val ranges = chunkDateRange(d("2025-01-01"), d("2025-01-06"), 2)
    val results = graft.backfill.Backfill.run(ranges, parallelism = 1) { case (s, _) =>
      if (s == d("2025-01-03")) sys.error("boom")
    }
    assert(results.map(_.success) === Seq(true, false)) // third task never ran
  }

  test("validateArgs enforces the reference's argument rules") {
    import graft.backfill.Backfill.validateArgs
    // happy path: last defaults to first
    val a = validateArgs("m", Some("2025-01-01"), None, fullRefresh = false, retry = false)
    assert(a.first === Some(d("2025-01-01")) && a.last === Some(d("2025-01-01")))
    // retry: dates ignored with a warning; no dates required
    val r = validateArgs("m", Some("2025-01-01"), None, fullRefresh = false, retry = true)
    assert(r.first.isEmpty && r.warnings.nonEmpty)
    assert(validateArgs("m", None, None, fullRefresh = false, retry = true).warnings.isEmpty)
    intercept[IllegalArgumentException] { // retry + full refresh
      validateArgs("m", None, None, fullRefresh = true, retry = true)
    }
    intercept[IllegalArgumentException] { // missing first date
      validateArgs("m", None, None, fullRefresh = false, retry = false)
    }
    intercept[IllegalArgumentException] { // bad format
      validateArgs("m", Some("01/01/2025"), None, fullRefresh = false, retry = false)
    }
    intercept[IllegalArgumentException] { // out of order
      validateArgs("m", Some("2025-01-02"), Some("2025-01-01"), fullRefresh = false, retry = false)
    }
    intercept[IllegalArgumentException] { // full refresh on a selector graph
      validateArgs("m+", Some("2025-01-01"), None, fullRefresh = true, retry = false)
    }
    intercept[IllegalArgumentException] { // full refresh across days
      validateArgs("m", Some("2025-01-01"), Some("2025-01-02"), fullRefresh = true, retry = false)
    }
    // full refresh, single model, single day: fine
    assert(validateArgs("m", Some("2025-01-01"), None, fullRefresh = true, retry = false)
      .first === Some(d("2025-01-01")))
  }
}
