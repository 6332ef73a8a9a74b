package graft.llmops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Measured recall@k of every ANN index vs the brute-force ground truth —
  * the number a 100 TB user needs NEXT TO the index's runtime when
  * choosing the recall/cost trade. [[graft.Bench]] emits this map as the
  * `ann_recall` side-channel in `bench_summary.json` (untimed — it is a
  * quality measurement, not a benchmark), so every bench round prints the
  * trade instead of burying it in specs.
  *
  * All indexes run with their query-map defaults on the same fixture
  * predicates as the oracle queries, so each recall figure corresponds
  * 1:1 to a timed `sim_topk_*` entry; `pq_trained` adds the
  * k-means-codebook variant ([[ProductQuant.trainPqCodebooks]], 5
  * Lloyd's iterations) next to the sampled-codebook `pq` so the training
  * benefit is visible in the same place. */
object RecallReport {

  def annRecall(spark: SparkSession, dir: String): Seq[(String, Double)] = {
    val emb = Tables.load(spark, dir, "embeddings")
    val isQuery = expr(Similarity.isQuerySql)
    val isCent = expr(Similarity.isCentroidSql)
    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairs(Similarity.bruteForceTopK(emb, isQuery))
    def recall(df: DataFrame): Double =
      if (truth.isEmpty) 0.0
      else (pairs(df) & truth).size.toDouble / truth.size
    Seq(
      "lsh" -> recall(Similarity.lshTopK(emb, isQuery)),
      s"ivf_nprobe${Similarity.NProbe}" ->
        recall(Similarity.ivfTopK(emb, isQuery, isCent)),
      s"ivf_nprobe${Similarity.NProbeWide}" ->
        recall(Similarity.ivfTopK(emb, isQuery, isCent,
          nprobe = Similarity.NProbeWide)),
      "pq_sampled" -> recall(ProductQuant.pqTopK(emb, isQuery, isCent)),
      "pq_trained" -> recall(ProductQuant.pqTopKTrained(emb, isQuery,
        ProductQuant.trainPqCodebooks(emb, isCent, iterations = 5))))
  }
}
