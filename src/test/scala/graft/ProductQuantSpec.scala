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

  test("ragged and NULL vectors are excluded, not crashed on") {
    import spark.implicits._
    val ragged = Seq((5000L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val got = ProductQuant.pqTopK(
      emb.unionByName(ragged, allowMissingColumns = true), isQuery, isCb).collect()
    assert(!got.exists(_.getLong(1) == 5000L))
  }
}
