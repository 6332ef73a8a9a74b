package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.llmops.Dedup

/** Unit-level checks for the dedup clustering fixpoint and the
  * deterministic sampler (the oracle-gated queries cover the fixture
  * end to end; these pin the algebra on hand-built graphs). */
class LlmopsSpec extends AnyFunSuite {
  import TestSession._

  test("duplicateClusters labels every chain with its minimum id") {
    import spark.implicits._
    val docs = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("doc_id")
    // chain 1-2-3 (transitive through 2), pair 4-5, singleton 6
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("doc_a", "doc_b")
    val got = Dedup.duplicateClusters(docs, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 6L))
    // keep-list = cluster representatives
    assert(got.collect { case (d, c) if d == c => d }.toSet === Set(1L, 4L, 6L))
  }

  test("duplicateClusters closes long chains (propagation crosses rounds)") {
    import spark.implicits._
    val n = 30L
    val docs = (1L to n).toDF("doc_id")
    val pairs = (1L until n).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val labels = Dedup.duplicateClusters(docs, pairs)
      .select(col("cluster_id")).distinct().collect().map(_.getLong(0)).toSeq
    assert(labels === Seq(1L)) // one component, labeled by the minimum
  }

  test("stratifiedSample is deterministic and honors per-stratum thresholds") {
    import spark.implicits._
    val docs = (1L to 1000L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("doc_id", "s")
    def run() = Dedup.stratifiedSample(docs, col("s"),
      Map("a" -> 0, "b" -> 5000), defaultPer10k = 10000)
      .collect().map(_.getLong(0)).toSet
    val first = run()
    assert(run() === first) // no RNG state: same rows every time
    assert(!first.exists(_ % 2 == 0)) // threshold 0 drops the whole stratum
    val bCount = first.size
    assert(bCount > 150 && bCount < 350, s"~half of 500 expected, got $bCount")
  }
}
