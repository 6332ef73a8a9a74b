package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.llmops.BpeTrain

/** Pins the BPE merge procedure on hand-traceable corpora: argmax pair
  * selection with the count-desc / lexicographic tie-break, the
  * left-to-right non-overlapping rewrite (the `aaa` case), early stop,
  * and the framing-exclusion contract (the oracle-gated `bpe_merges`
  * covers the fixture end to end). */
class BpeTrainSpec extends AnyFunSuite {
  import TestSession._

  private def mergeTable(rows: Array[org.apache.spark.sql.Row]) =
    rows.sortBy(_.getAs[Int]("round")).map(r =>
      (r.getAs[Int]("round"), r.getAs[String]("lhs"),
        r.getAs[String]("rhs"), r.getAs[Long]("pair_count")))

  test("bpeMerges: hand-traced merges on the classic low/lowest corpus") {
    import spark.implicits._
    // words: low ×3, lowest ×2 — round 1: (l,o)=5, (o,w)=5 -> tie broken
    // lexicographically to (l,o); round 2: (lo,w)=5; round 3: (low,e)=2 vs
    // (e,s)=2 vs (s,t)=2 -> (e,s); round 4: (es,t)=2; round 5: (low,est)=2.
    val docs = Seq((1L, "low low lowest"), (2L, "low lowest"))
      .toDF("doc_id", "text")
    val got = mergeTable(BpeTrain.bpeMerges(docs, rounds = 5).collect())
    assert(got === Array(
      (1, "l", "o", 5L), (2, "lo", "w", 5L), (3, "e", "s", 2L),
      (4, "es", "t", 2L), (5, "low", "est", 2L)))
  }

  test("bpeMerges: aaa rewrites left-to-right non-overlapping to [aa, a]") {
    import spark.implicits._
    // round 1 on "aaa": (a,a) counted twice (overlapping pairs both count).
    // The rewrite is greedy L-to-R, so round 2 sees [aa, a] -> pair (aa,a)=1.
    val docs = Seq((1L, "aaa")).toDF("doc_id", "text")
    val got = mergeTable(BpeTrain.bpeMerges(docs, rounds = 2).collect())
    assert(got === Array((1, "a", "a", 2L), (2, "aa", "a", 1L)))
  }

  test("bpeMerges: stops early when no pairs remain") {
    import spark.implicits._
    // single-letter words have no adjacent pairs after 0 merges
    val docs = Seq((1L, "a b a")).toDF("doc_id", "text")
    assert(BpeTrain.bpeMerges(docs, rounds = 4).count() === 0L)
  }

  test("batched merges are bit-identical to the sequential loop, in >=4x fewer trips") {
    import spark.implicits._
    // 16 two-letter words with strictly decreasing counts and disjoint
    // letters: every count level is a disjoint singleton, so one trip
    // accepts the whole 16-merge table
    val units = Seq("ab", "cd", "ef", "gh", "ij", "kl", "mn", "op",
      "qr", "st", "uv", "wx", "yz", "01", "23", "45")
    val text = units.zipWithIndex
      .flatMap { case (w, i) => Seq.fill(100 - i)(w) }.mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val (seqM, v1, seqTrips) = BpeTrain.train(docs, 16, batchLimit = 1)
    v1.unpersist()
    val (batM, v2, batTrips) = BpeTrain.train(docs, 16)
    v2.unpersist()
    assert(batM === seqM)
    assert(seqTrips === 16)
    assert(batTrips * 4 <= seqTrips,
      s"batched used $batTrips trips vs sequential $seqTrips")
    // interacting corpus (ties + chained merges): the conflict rule must
    // force sequential behavior, never reorder or stale-count a merge
    val docs2 = Seq((1L, "low low lowest"), (2L, "low lowest"))
      .toDF("doc_id", "text")
    val (s2, w1, _) = BpeTrain.train(docs2, 5, batchLimit = 1)
    w1.unpersist()
    val (b2, w2, _) = BpeTrain.train(docs2, 5)
    w2.unpersist()
    assert(b2 === s2)
  }

  test("bpeTokenCounts: post-merge symbol counts ride the word join") {
    import spark.implicits._
    // rounds=3 learns (l,o), (lo,w), (e,s): low -> [low] = 1 token,
    // lowest -> [low, es, t] = 3 tokens
    val docs = Seq((1L, "low low lowest"), (2L, "low lowest"))
      .toDF("doc_id", "text")
    val got = BpeTrain.bpeTokenCounts(docs, rounds = 3).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_words"), r.getAs[Long]("n_tokens"))).toMap
    assert(got === Map(1L -> ((3L, 5L)), 2L -> ((2L, 4L))))
  }

  test("bpeMerges: NULLs, empties and unframeable words are excluded") {
    import spark.implicits._
    val docs = Seq(
      (Some(1L), Some("ab ab")),
      (Some(2L), Some("xy c\nd")), // SEP / newline — excluded words
      (None: Option[Long], Some("ab ab")), // NULL doc_id
      (Some(3L), None: Option[String]))   // NULL text
      .toDF("doc_id", "text")
    val got = mergeTable(BpeTrain.bpeMerges(docs, rounds = 1).collect())
    assert(got === Array((1, "a", "b", 2L)))
  }
}
