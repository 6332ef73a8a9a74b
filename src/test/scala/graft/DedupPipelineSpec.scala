package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.llmops.{Dedup, Similarity}

/** Staged cheap-first dedup pipelines (exact/banded collapse before the
  * quadratic-in-duplicate-mass pair families) — the enforced form of the
  * r13 scale-sweep mitigation. Pinned here: the expensive stage's input
  * is exactly the cluster-representative set (ids outside it can never
  * appear in the output), the pipeline output is the raw operator
  * restricted to representatives, and duplicate mass shrinks the output
  * instead of exploding the work. */
class DedupPipelineSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  private val baseText =
    "the quick brown fox jumps over the lazy dog again and again today"
  private val otherText =
    "completely different content about spark catalyst optimizer rules engine"

  /** The pipeline's own collapse stages, replayed to get the rep set. */
  private def repIds(d: DataFrame): Set[Long] = {
    val keeps = Dedup.exactDedup(d, "doc_id", "text")
      .select(col("keep_id").as("doc_id"))
    val reps1 = d.join(keeps, Seq("doc_id"), "left_semi")
    Dedup.duplicateClusters(reps1, Dedup.simhashPairs(reps1))
      .select("cluster_id").as[Long].collect().toSet
  }

  test("dedupPipeline: output is ppjoin RESTRICTED to cluster representatives") {
    // family A: original + 3 exact copies + 2 near-dup variants;
    // family B: unrelated + 1 exact copy
    val d = docs(
      1L -> baseText, 2L -> baseText, 3L -> baseText, 4L -> baseText,
      5L -> ("r1 " + baseText), 6L -> ("r2 " + baseText),
      10L -> otherText, 11L -> otherText)
    val reps = repIds(d)
    assert(reps.contains(1L) && reps.contains(10L))
    assert(reps.size < 8, s"collapse must shrink the corpus, reps=$reps")
    val out = Dedup.dedupPipeline(d)
    // identity: pipeline ≡ raw operator over the representative subset
    val want = Dedup.ppjoinPairs(
      d.filter(col("doc_id").isin(reps.toSeq: _*)))
      .orderBy("doc_a", "doc_b").collect().toSeq
    assert(out.orderBy("doc_a", "doc_b").collect().toSeq === want)
    // every output endpoint is a representative
    out.select("doc_a").union(out.select("doc_b")).as[Long].collect()
      .foreach(id => assert(reps.contains(id), s"non-rep id $id in output"))
    // and the duplicate mass no longer explodes the pair relation
    assert(Dedup.ppjoinPairs(d).count() > out.count(),
      "raw ppjoin must see strictly more pairs on the dup-heavy corpus")
  }

  test("typoPipeline: copies collapse to one representative with multiplicities") {
    val rows = Seq(
      (1L, "Customer#001"), (2L, "Customer#001"), (3L, "Customer#001"),
      (4L, "Customer#002"), (5L, "Customer#002"),
      (6L, "Xustomer#001")).toDF("id", "nm")
    val out = Dedup.typoPipeline(rows, "id", "nm")
      .orderBy("id_a", "id_b").collect()
    // distinct names: Customer#001 (rep 1, n=3), Customer#002 (rep 4, n=2),
    // Xustomer#001 (rep 6, n=1); pairs at distance 1: (001,002), (001,X001)
    val got = out.map(r => (r.getLong(0), r.getLong(1), r.getLong(4),
      r.getLong(5), r.getLong(6))).toSeq
    assert(got === Seq((1L, 4L, 1L, 3L, 2L), (1L, 6L, 1L, 3L, 1L)),
      s"got ${got.mkString}")
  }

  test("knnPipeline: copy-grade vectors collapse; graph spans representatives only") {
    val dim = Similarity.Dim
    val rnd = new scala.util.Random(1)
    val common = Array.fill(dim)(rnd.nextGaussian().toFloat)
    def family(seed: Int): Array[Float] = {
      val r = new scala.util.Random(seed)
      common.map(x => x + 0.5f * r.nextGaussian().toFloat)
    }
    // three correlated families (cross cosine ~0.8), 3 near-copies each
    val rows = (for {
      (seed, base) <- Seq(7, 8, 9).zipWithIndex
      c <- 0 until 3
    } yield {
      val v = family(seed).clone(); v(0) += c * 1e-3f
      ((base * 10 + c).toLong, v)
    }).toDF("vec_id", "embedding")
    val out = Similarity.knnPipeline(rows, k = 2)
    assert(out.count() > 0, "correlated families must produce graph edges")
    val ids = out.select("src_id").union(out.select("dst_id"))
      .as[Long].collect().toSet
    assert(ids.subsetOf(Set(0L, 10L, 20L)),
      s"graph must touch only min-id representatives, got $ids")
  }
}
