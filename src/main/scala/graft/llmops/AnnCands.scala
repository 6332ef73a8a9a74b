package graft.llmops

import org.apache.spark.sql.functions._

/** Scale-evidence probe for the adaptive IVF grid: prints ONE JSON line
  * with the corpus size, the grid the adaptive rule chose, and the
  * MEASURED ADC candidates per query for the `sim_topk_ivfpq` serving
  * path at that corpus — the number SCALE.md's exponent table cites
  * (contract: candidates ∝ √n, ≤ ~0.5/decade; a fixed grid gives
  * 1.0/decade, a grid ∝ n gives quadratic assignment instead).
  *
  * Usage: AnnCands <sfDir> */
object AnnCands {
  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: AnnCands <sfDir>")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = graft.core.GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.core.Tables.load(spark, args(0), "embeddings")
    val n = Similarity.typedVecs(emb).count()
    val m = Similarity.adaptiveGridModulus(n)
    val cent = expr(Similarity.adaptiveCentroidSqlFor(m))
    val cents = Similarity.sampledCentroids(emb, cent)
    val cb = ProductQuant.residualCodebook(emb, cents,
      expr(ProductQuant.isCbResidualSrcSql) && !cent)
    val adc = ProductQuant.ivfpqResidualAdc(emb, expr(Similarity.isQuerySql),
      cents, cb, ProductQuant.IvfPqNProbe)
    val nq = Similarity.typedVecs(emb)
      .filter(expr(Similarity.isQuerySql)).count()
    val cands = adc.count()
    val per = if (nq == 0) 0.0 else cands.toDouble / nq
    println(s"""{"n":$n,"modulus":$m,"cells":${cents.length},""" +
      s""""queries":$nq,"cands_per_query":$per}""")
    spark.stop()
  }
}
