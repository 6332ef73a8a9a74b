package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-sweep data generator: replicate an sf-dir `factor`× with
  * join-consistent key shifts, so the heaviest operators can be measured
  * at 10× data and their sf0.1→sf1 scaling exponents recorded in
  * SCALE.md (the r12 VERDICT's scale-contract validation sweep).
  *
  * NOT an oracle input — the driver's correctness gate stays on the
  * provided fixtures; this exists purely to measure how runtime grows
  * with data. Key shifts use one uniform stride (10M, above every
  * fixture key) on every join key so replica r's orders reference
  * replica r's customers/parts/suppliers — the join graph is preserved,
  * selectivities stay constant, row counts scale exactly ×factor.
  * Documents get a per-replica text prefix (replicas become NEAR
  * duplicates — realistic dup clusters for the dedup family, not
  * degenerate exact copies); embeddings perturb one dimension per
  * replica so ANN neighborhoods don't collapse onto 10-way ties;
  * events keep their timestamps (10× density, same window — the
  * streaming/sessionization cost axis). Dims (region, nation) copy once.
  *
  * Usage: ScaleUp <inDir> <outDir> <factor>. */
object ScaleUp {

  private val Stride = 10000000L

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleUp <inDir> <outDir> <factor>")
    val Array(inDir, outDir, factorS) = args
    val factor = factorS.toInt
    require(factor >= 1, "factor must be >= 1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = graft.core.GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def replicate(table: String, shiftCols: Seq[String],
                  extra: (DataFrame, Int) => DataFrame = (d, _) => d): Unit = {
      val base = graft.core.Tables.load(spark, inDir, table)
      val out = (0 until factor).map { r =>
        val shifted = shiftCols.foldLeft(base)((d, c) =>
          d.withColumn(c, col(c) + lit(r * Stride)))
        extra(shifted, r)
      }.reduce(_.unionByName(_))
      out.write.mode("overwrite").parquet(s"$outDir/$table.parquet")
      System.err.println(s"[scaleup] $table x$factor done")
    }

    replicate("region", Seq.empty, (d, r) => if (r == 0) d else d.limit(0))
    replicate("nation", Seq.empty, (d, r) => if (r == 0) d else d.limit(0))
    replicate("customer", Seq("c_custkey"))
    replicate("supplier", Seq("s_suppkey"))
    replicate("part", Seq("p_partkey"))
    replicate("orders", Seq("o_orderkey", "o_custkey"))
    replicate("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))
    replicate("events", Seq("event_id", "user_id"))
    replicate("documents", Seq("doc_id"), (d, r) =>
      if (r == 0) d
      else d.withColumn("text", concat(lit(s"r$r "), col("text"))))
    replicate("embeddings", Seq("vec_id"), (d, r) =>
      if (r == 0) d
      else d.withColumn("embedding",
        transform(col("embedding"), (x, i) =>
          when(i === 0, x + lit(r * 1e-3f)).otherwise(x))))
    spark.stop()
  }
}
