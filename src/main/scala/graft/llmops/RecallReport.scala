package graft.llmops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Measured recall@k AND candidate cost of every ANN index vs the
  * brute-force ground truth — the two numbers a 100 TB user needs NEXT TO
  * the index's runtime when choosing the recall/cost trade (recall alone
  * hides a full scan; cost alone hides random neighbors). [[graft.Bench]]
  * emits this map as the `ann_recall` side-channel in
  * `bench_summary.json` (untimed — it is a quality measurement, not a
  * benchmark), so every bench round prints the trade instead of burying
  * it in specs.
  *
  * `candsPerQuery` is the number of candidates each stage actually
  * scores per query: exact cosines for brute/LSH/IVF, ADC lookups for
  * the PQ family (pure PQ scans everything — it compresses, it does not
  * prune; n−1 is its honest cost). The fixture indexes run with their
  * query-map defaults, so each entry corresponds 1:1 to a timed
  * `sim_topk_*` entry; the `*_trained` variants add the k-means-trained
  * quantizers ([[Similarity.trainIvfCentroids]],
  * [[ProductQuant.trainPqCodebooks]], 5 Lloyd's iterations each) so the
  * training benefit is visible in the same place. */
object RecallReport {

  /** `role`: "default" = the documented serving path
    * ([[AnnIndex.ivfpqTopKFrom]] — trained residual IVF-ADC);
    * "baseline" = a real alternative with a different recall/cost
    * trade; "pedagogical" = compression-only (scans everything,
    * kept to make the pruning paths' candidate costs honest). */
  final case class AnnStat(recall: Double, candsPerQuery: Double,
                           role: String = "baseline")

  def annRecall(spark: SparkSession, dir: String): Seq[(String, AnnStat)] = {
    val emb = Tables.load(spark, dir, "embeddings")
    val isQuery = expr(Similarity.isQuerySql)
    val isCent = expr(Similarity.isCentroidSql)
    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairs(Similarity.bruteForceTopK(emb, isQuery))
    val nQueries = truth.map(_._1).size.toDouble
    val corpusN = Similarity.typedVecs(emb).count().toDouble
    def recall(df: DataFrame): Double =
      if (truth.isEmpty) 0.0
      else (pairs(df) & truth).size.toDouble / truth.size
    def perQuery(scored: DataFrame): Double =
      if (nQueries == 0) 0.0 else scored.count() / nQueries

    val sampledCents = Similarity.sampledCentroids(emb, isCent)
    val trainedCents = Similarity.collectCentroids(
      Similarity.trainIvfCentroids(emb, isCent, iterations = 5))
    val trainedCb = ProductQuant.trainPqCodebooks(emb, isCent, iterations = 5)
    // residual codebooks under each coarse quantizer (IVFADC training
    // order: coarse first, then residual-space PQ). The trained serving
    // path uses the FINER corpus-adaptive coarse quantizer
    // (ProductQuant.trainedInitSql — cells ∝ √n) probed wider at the
    // same candidate budget — see ProductQuant scaladoc.
    val isCbSrc = expr(ProductQuant.isCbResidualSrcSql)
    val sampledResCb = ProductQuant.residualCodebook(emb, sampledCents, isCbSrc)
    // no centroid-class exclusion here: TRAINED centroids move off the
    // init vectors under Lloyd's, so init-row residuals are not ~0 (the
    // degenerate-code hazard is the SAMPLED grid's, where centroids are
    // literal corpus vectors) — and keeping the source predicate as-is
    // keeps the bench-SF quantizer bit-identical to the r12 sweep's
    val fineCents = Similarity.collectCentroids(
      Similarity.trainIvfCentroids(emb,
        expr(ProductQuant.trainedInitSql(corpusN.toLong)), iterations = 5))
    val fineResCb = ProductQuant.trainPqCodebooksResidual(
      emb, fineCents, isCbSrc, iterations = 5)

    // each index's candidate-scoring pass runs ONCE: the scored frame is
    // cached, recall ranks it and candsPerQuery counts it, then the cache
    // is dropped — without this every variant would execute its corpus
    // scan twice (once inside topK, once for the count)
    def fromScored(scored: DataFrame, rank: DataFrame => DataFrame): AnnStat = {
      scored.persist()
      try AnnStat(recall(rank(scored)), perQuery(scored))
      finally scored.unpersist()
    }
    def ivf(cents: Array[(Long, Array[Double], Double)], nprobe: Int): AnnStat =
      fromScored(Similarity.ivfScoredWith(emb, isQuery, cents, nprobe),
        Similarity.rankTopK(_, Similarity.TopK))
    def ivfpq(cents: Array[(Long, Array[Double], Double)],
              cb: Array[Array[(Array[Double], Double)]],
              nprobe: Int): AnnStat =
      fromScored(
        ProductQuant.ivfpqResidualAdc(emb, isQuery, cents, cb, nprobe),
        ProductQuant.ivfpqRerank(emb, _, isQuery, Similarity.TopK,
          ProductQuant.ShortlistR))

    Seq(
      "lsh" -> fromScored(Similarity.lshScored(emb, isQuery),
        Similarity.rankTopK(_, Similarity.TopK)),
      "lsh_multiprobe" -> fromScored(Similarity.lshMultiProbeScored(emb, isQuery),
        Similarity.rankTopK(_, Similarity.TopK)),
      s"ivf_nprobe${Similarity.NProbe}" -> ivf(sampledCents, Similarity.NProbe),
      s"ivf_nprobe${Similarity.NProbeWide}" -> ivf(sampledCents, Similarity.NProbeWide),
      s"ivf_nprobe${Similarity.NProbeServe}" -> ivf(sampledCents, Similarity.NProbeServe),
      s"ivf_trained_nprobe${Similarity.NProbeServe}" ->
        ivf(trainedCents, Similarity.NProbeServe),
      "pq_sampled" -> AnnStat(
        recall(ProductQuant.pqTopK(emb, isQuery, isCent)), corpusN - 1,
        role = "pedagogical"),
      "pq_trained" -> AnnStat(
        recall(ProductQuant.pqTopKTrained(emb, isQuery, trainedCb)), corpusN - 1,
        role = "pedagogical"),
      "ivfpq" -> ivfpq(sampledCents, sampledResCb, ProductQuant.IvfPqNProbe),
      "ivfpq_trained" -> ivfpq(fineCents, fineResCb,
        ProductQuant.IvfPqTrainedNProbe).copy(role = "default"))
  }
}
