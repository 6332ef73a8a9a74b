package graft.llmops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Weighted mixture sampling — composing a training corpus from sources
  * at prescribed rates ("web at 25%, books at 100%, …"). The downsample
  * decision is a deterministic hash threshold, NOT an RNG draw:
  * `md5(source:doc_id) mod 10000 < threshold(source)` keeps exactly the
  * same rows on every run, on any partitioning, on either engine — which
  * is what makes the op oracle-checkable and re-runs reproducible.
  *
  * Shape at 100 TB: the rates table is per-source (tiny, broadcast); the
  * decision is a narrow codegen'd filter. No shuffle anywhere — the plan
  * is scan → broadcast-join → filter, and output partitioning mirrors
  * input partitioning. Thresholds are integers out of 10000 (basis
  * points) so no floating-point rate ever rounds differently across
  * engines.
  */
object Mix {

  /** The query's mixture: rates cycle 25/50/75/100% across the fixture's
    * 20 sources — every rate bucket is exercised, including the
    * keep-everything edge (threshold 10000). */
  val MixThresholds: Seq[(String, Int)] =
    (0 until 20).map(i => (s"src$i", 2500 * (i % 4 + 1)))

  /** Keep rows of `df` whose `(sourceCol, idCol)` hash lands under the
    * source's basis-point threshold. Sources absent from `thresholds`
    * are dropped (inner join) — an explicit mixture is a whitelist. */
  def weightedMix(df: DataFrame, thresholds: Seq[(String, Int)],
                  sourceCol: String = "source",
                  idCol: String = "doc_id"): DataFrame = {
    require(thresholds.nonEmpty, "weightedMix needs at least one source rate")
    require(thresholds.forall { case (_, t) => t >= 0 && t <= 10000 },
      "thresholds are basis points in [0, 10000]")
    val spark = df.sparkSession
    import spark.implicits._
    val rates = thresholds.toDF(sourceCol, "_thresh")
    val h = Hashing.md5Long(
      concat(col(sourceCol), lit(":"), col(idCol).cast("string")))
    df.join(broadcast(rates), Seq(sourceCol))
      .filter(h % 10000 < col("_thresh"))
      .drop("_thresh")
  }

  // ----------------------------------------------------------------- query

  def qMix(spark: SparkSession, dir: String): DataFrame =
    weightedMix(Tables.load(spark, dir, "documents"), MixThresholds)
      .select(col("doc_id"), col("source"))

  val qMixSql: String = {
    val values = MixThresholds
      .map { case (s, t) => s"('$s', $t)" }.mkString(", ")
    s"""WITH rates(source, thresh) AS (VALUES $values)
       |SELECT d.doc_id, d.source
       |FROM documents d JOIN rates r USING (source)
       |WHERE ${Hashing.md5LongSql("d.source || ':' || d.doc_id")} % 10000
       |      < r.thresh""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mix_weighted" -> (qMix _))

  val oracleSql: Map[String, String] = Map(
    "mix_weighted" -> qMixSql)
}
