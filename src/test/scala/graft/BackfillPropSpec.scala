package graft

import java.time.LocalDate
import java.time.temporal.ChronoUnit.DAYS
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.backfill.Backfill

/** Property-based invariants for the backfill work-partitioning layer
  * (SURVEY §5 item 3): chunking covers the range exactly with no overlap,
  * the range codec round-trips, and the job-name mangler always lands
  * within the length bound (backfill.py:104-163 semantics).
  *
  * Uses bare ScalaCheck (scalatestplus bridge is not in the offline dep
  * set): each property is checked with the default 100 cases and the
  * result asserted. */
class BackfillPropSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }

  private val epoch = LocalDate.of(2020, 1, 1)
  private val genStart = Gen.choose(0L, 3650L).map(epoch.plusDays)
  private val genSpan = Gen.choose(0L, 800L)
  private val genBatch = Gen.choose(1, 365)

  test("chunkDateRange covers [first,last] contiguously, in order, no overlap") {
    check(Prop.forAll(genStart, genSpan, genBatch) { (first, span, batch) =>
      val last = first.plusDays(span)
      val chunks = Backfill.chunkDateRange(first, last, batch)
      val contiguous = chunks.sliding(2).forall {
        case Seq((_, e1), (s2, _)) => s2 == e1.plusDays(1)
        case _ => true
      }
      val sized = chunks.forall { case (s, e) =>
        !e.isBefore(s) && DAYS.between(s, e) < batch }
      val totalDays = chunks.map { case (s, e) => DAYS.between(s, e) + 1 }.sum
      chunks.nonEmpty && chunks.head._1 == first && chunks.last._2 == last &&
        contiguous && sized && totalDays == span + 1
    })
  }

  test("encode/decode task ranges round-trips") {
    val genRanges = Gen.listOf(Gen.zip(genStart, Gen.choose(0L, 90L)).map {
      case (s, d) => (s, s.plusDays(d)) })
    check(Prop.forAll(genRanges) { ranges =>
      Backfill.decodeTaskRanges(Backfill.encodeTaskRanges(ranges)) == ranges
    })
  }

  test("backfillJobName is always within the 64-char bound and non-empty") {
    val word = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    val selector = Gen.nonEmptyListOf(word).map(_.mkString("_")).map(_.take(300))
    check(Prop.forAll(selector) { sel =>
      val name = Backfill.backfillJobName(sel)
      name.nonEmpty && name.length <= 64
    })
  }

  test("estimateBatchSize is always clamped to [1, default]") {
    val genBytes = Gen.listOf(Gen.option(Gen.choose(0L, 1L << 40)))
    check(Prop.forAll(genBytes, Gen.choose(1, 365), Gen.choose(1L, 1L << 38)) {
      (bytes, dflt, target) =>
        val got = Backfill.estimateBatchSize(bytes, dflt, target)
        got >= 1 && got <= dflt
    })
  }
}
