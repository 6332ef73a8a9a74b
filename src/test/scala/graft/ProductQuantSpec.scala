package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.llmops.{ProductQuant, Similarity}

/** PQ/ADC invariants on the fixture corpus (the oracle-gated
  * `sim_topk_pq` pins cross-engine bit-equality; these pin the
  * semantics PQ must keep regardless of engine). */
class ProductQuantSpec extends AnyFunSuite {
  import TestSession._

  private val isQuery = expr(s"vec_id < 10")
  private val isCb = expr("vec_id % 29 = 3")
  private def emb = Tables.load(spark, sf, "embeddings")

  test("pqTopK: k rows per query, rank dense from 1, no identity pairs") {
    val got = ProductQuant.pqTopK(emb, isQuery, isCb).collect()
    val byQ = got.groupBy(_.getLong(0))
    assert(byQ.nonEmpty)
    byQ.foreach { case (qid, rows) =>
      assert(rows.length === Similarity.TopK, s"query $qid row count")
      assert(rows.map(_.getInt(2)).sorted.toSeq === (1 to Similarity.TopK),
        s"query $qid ranks")
      assert(!rows.exists(_.getLong(1) == qid), s"query $qid self-pair")
      // adist ascends with rank — it is a distance
      val byRank = rows.sortBy(_.getInt(2)).map(_.getDouble(3))
      assert(byRank.sliding(2).forall { case Array(a, b) => a <= b; case _ => true },
        s"query $qid distances not ascending")
    }
  }

  test("pqTopK recall@10 against brute-force truth is real but lossy") {
    // PQ quantizes to 16 codes/subspace from a sampled codebook — on the
    // fixture it must beat random guessing by a wide margin (the LUT
    // approximation preserves neighborhood structure) without being
    // exact (it IS a compression)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairs(Similarity.bruteForceTopK(emb, isQuery))
    val got = pairs(ProductQuant.pqTopK(emb, isQuery, isCb))
    val recall = (got & truth).size.toDouble / truth.size
    val n = emb.count().toDouble
    // random top-10 overlaps truth by k/n in expectation (~2% here);
    // 5x that margin separates structure from luck without over-pinning
    // a sampled (non-k-means) codebook's quality
    assert(recall > 5 * (Similarity.TopK / n),
      s"recall $recall is indistinguishable from chance")
    assert(recall < 1.0, s"recall $recall — exact match suggests no quantization")
  }

  test("trained codebooks: iterations=0 reproduces the sampled codebook; training lifts recall") {
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    // iterations = 0 must be EXACTLY the oracle's sampled codebook — the
    // trainer's init is the same deterministic smallest-id sample
    val cb0 = ProductQuant.trainPqCodebooks(emb, isCb, iterations = 0)
    assert(pairs(ProductQuant.pqTopKTrained(emb, isQuery, cb0))
      === pairs(ProductQuant.pqTopK(emb, isQuery, isCb)))
    // Lloyd's iterations move codebook entries to cell means, shrinking
    // quantization error; recall@k vs brute-force truth must not fall —
    // and on this fixture it strictly rises (the sampled codebook wastes
    // entries on near-duplicate sample rows; k-means spreads them)
    val cb5 = ProductQuant.trainPqCodebooks(emb, isCb, iterations = 5)
    val truth = pairs(Similarity.bruteForceTopK(emb, isQuery))
    val sampled = pairs(ProductQuant.pqTopK(emb, isQuery, isCb))
    val trained = pairs(ProductQuant.pqTopKTrained(emb, isQuery, cb5))
    val rSampled = (sampled & truth).size.toDouble / truth.size
    val rTrained = (trained & truth).size.toDouble / truth.size
    assert(rTrained > rSampled,
      s"k-means codebook did not improve recall: sampled $rSampled, trained $rTrained")
  }

  test("encode: exact tie takes the smaller code; dot accumulation is left-to-right") {
    // Pins the kernel half of the cross-engine bit-identity contract
    // (ProductQuant scaladoc "CROSS-ENGINE CONTRACT"): if either the
    // tie-break or the summation order regresses, this fails with a
    // pointed message instead of an opaque sim_topk_pq hash mismatch.
    val dim = ProductQuant.M * ProductQuant.SubDim
    // half-ulp(1.0): 1.0 + eps rounds DOWN to 1.0 (ties-to-even), so a
    // left-to-right sum of (1.0, eps, eps) is exactly 1.0 while the
    // reassociated (eps + eps) + 1.0 is 1.0000000000000002 — the probe
    // separates accumulation orders
    val eps = java.lang.Math.ulp(1.0) / 2
    val a = Array.fill(dim)(0.0); a(0) = 1.0; a(1) = eps; a(2) = eps
    val ones = Array.fill(ProductQuant.SubDim)(1.0)
    assert(ProductQuant.dotAt(a, 0, ones) === 1.0,
      "dotAt must accumulate strictly left-to-right (got the reassociated sum)")
    // exact tie: target at the origin, codebook entries at +1 and −1 on
    // one axis per subspace — both at squared distance 1.0; the FIRST
    // minimum (smaller code) must win, matching the oracle's ORDER BY
    // d, code
    val plus = Array.tabulate(dim)(i => if (i % ProductQuant.SubDim == 0) 1.0 else 0.0)
    val minus = plus.map(-_)
    val cb = ProductQuant.buildCodebook(Array((1L, plus), (2L, minus)))
    val codes = ProductQuant.encode(Array.fill(dim)(0.0), cb)
    assert(codes.toSeq === Seq.fill(ProductQuant.M)(0),
      "exact-tie assignment must take the smaller code")
  }

  test("ragged and NULL vectors are excluded, not crashed on") {
    import spark.implicits._
    val ragged = Seq((5000L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val got = ProductQuant.pqTopK(
      emb.unionByName(ragged, allowMissingColumns = true), isQuery, isCb).collect()
    assert(!got.exists(_.getLong(1) == 5000L))
  }

  test("scalarQuantizeInt8: endpoint/midpoint codes, degenerate dims pin to 0, exact error") {
    import spark.implicits._
    val d = graft.llmops.Similarity.Dim
    // dim 0 spans [0, 1]; dim 1 is constant (degenerate); others all 0
    def vec(x0: Float): Seq[Float] =
      x0 +: 5.0f +: Seq.fill(d - 2)(0.0f)
    val emb3 = Seq((1L, vec(0f)), (2L, vec(1f)), (3L, vec(0.5f)))
      .toDF("vec_id", "embedding")
    val out = ProductQuant.scalarQuantizeInt8(
      emb3, ProductQuant.trainScalarQuant(emb3)).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(1L) === ((0L, 0L, 0L, 0L)))      // mn endpoint: code 0, exact
    assert(out(2L) === ((255L, 0L, 255L, 0L))) // mx endpoint: code 255, exact
    // midpoint: code floor(0.5*255+0.5)=128, dq=128/255, err≈0.00196 → 1961
    assert(out(3L) === ((128L, 0L, 128L, 1961L)))
  }

  test("scalarQuantizeInt8 saturates out-of-range components against a stored range table") {
    import spark.implicits._
    val d = graft.llmops.Similarity.Dim
    def vec(x0: Float): Seq[Float] = x0 +: Seq.fill(d - 1)(0.0f)
    // train on [0, 1] for dim 0, then encode a later batch outside it
    val trainEmb = Seq((1L, vec(0f)), (2L, vec(1f))).toDF("vec_id", "embedding")
    val ranges = ProductQuant.trainScalarQuant(trainEmb)
    val later = Seq((10L, vec(2.0f)), (11L, vec(-1.0f)))
      .toDF("vec_id", "embedding")
    val out = ProductQuant.scalarQuantizeInt8(later, ranges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(out(10L)._2 === 255L) // above mx: clamps, never 510
    assert(out(11L)._1 === 0L)   // below mn: clamps, never negative
  }
}
