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

  test("embeddingCopySpanEdges: components EQUAL the all-pairs graph (fixture + adversarial)") {
    import graft.core.Tables
    def components(ids: org.apache.spark.sql.DataFrame,
                   pairs: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      Dedup.duplicateClusters(ids,
          pairs.select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b")))
        .select(col("doc_id"), col("cluster_id")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // fixture corpus at the pipeline's copy-grade threshold
    val emb = Tables.load(spark, sf, "embeddings")
    val ids = emb.select(col("vec_id").cast("long").as("doc_id")).distinct()
    val full = components(ids,
      Dedup.embeddingPairs(emb, 0.95, nBands = Similarity.KnnCollapseBands)
        .select(col("vec_a"), col("vec_b")))
    val span = components(ids,
      Dedup.embeddingCopySpanEdges(emb, 0.95, nBands = Similarity.KnnCollapseBands))
    assert(span === full, "fixture components diverged")
    // adversarial bucket: a, b are mutual near-dups but both farther
    // from the bucket's min-id member — a star-on-min scheme would
    // split them; the in-bucket verified spanning forest must not
    val base = Array.fill(Similarity.Dim)(1.0)
    def tweak(i: Int, d: Double): Seq[Double] = {
      val v = base.clone(); v(i) += d; v(i + 1) -= d; v.toSeq
    }
    val adv = Seq(
      (1L, base.toSeq),       // bucket min: moderately far from both
      (2L, tweak(4, 3.0)),    // a
      (3L, tweak(4, 3.2)))    // b: cos(a,b) high, cos(min,·) lower
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val fullAdv = components(
      adv.select(col("vec_id").as("doc_id")),
      Dedup.embeddingPairs(adv, 0.95, nBands = Similarity.KnnCollapseBands))
    val spanAdv = components(
      adv.select(col("vec_id").as("doc_id")),
      Dedup.embeddingCopySpanEdges(adv, 0.95, nBands = Similarity.KnnCollapseBands))
    assert(spanAdv === fullAdv, s"adversarial: $spanAdv vs $fullAdv")
  }

  test("embeddingCopySpanEdges: output is O(members), not O(pairs), on copy clusters") {
    import graft.core.Tables
    val emb = Tables.load(spark, sf, "embeddings")
    // replicate x8 with a tiny per-replica nudge: near-identical copies
    val copies = (0 until 8).map { r =>
      emb.select((col("vec_id").cast("long") + lit(r * 10000000L)).as("vec_id"),
        expr(s"transform(embedding, (x, i) -> CAST(x + IF(i = $r, 1e-4, 0.0) AS FLOAT))")
          .as("embedding"))
    }.reduce(_ unionAll _)
    val n = copies.count()
    val edges = Dedup.embeddingCopySpanEdges(copies, 0.95,
      nBands = Similarity.KnnCollapseBands).count()
    // all-pairs on 8-way copies would be >= 28 edges per distinct vector
    // (x4 the member count); the spanning forest stays below one edge
    // per member per band-overlap — the copy-density-proof contract
    assert(edges < n * 2, s"$edges edges for $n members — quadratic blow-up?")
  }
}
