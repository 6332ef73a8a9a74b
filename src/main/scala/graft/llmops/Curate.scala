package graft.llmops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import Hashing.md5LongSql

/** End-to-end curation pipeline — the composition a training-data user
  * actually runs: language gate ∘ quality gate ∘ exact-dedup keepers ∘
  * deterministic stratified sampling, in one DataFrame plan. The gating
  * signals come from [[TextAnalysis.withQualityLang]] — ONE narrow
  * kernel pass that carries the original row, so gating itself is
  * join-free and shuffle-free. The shuffles in the whole pipeline are:
  * the exact-dedup groupBy, the keeper semi-join, and the final summary
  * aggregation — nothing else.
  *
  * Each stage reuses an oracle-gated operator's exact arithmetic
  * ([[TextAnalysis]], [[Dedup]] — tiers and thresholds shared from
  * Dedup's constants); this query gates their COMPOSITION, where column
  * naming, join keys, and filter ordering bugs live. Summary statistics
  * are order-independent on purpose (count, min, max): an avg over
  * engine-dependent summation order would wobble in the last bits and
  * poison the hash compare. */
object Curate {

  val QualityFloor = 0.5
  val KeepLang = "en"

  def curate(docs: DataFrame): DataFrame = {
    val keepers = Dedup.exactDedup(docs, "doc_id", "text")
      .select(col("keep_id").as("doc_id"))
    TextAnalysis.withQualityLang(docs)
      .filter(col("quality") >= QualityFloor && col("pred_lang") === KeepLang)
      .join(keepers, Seq("doc_id"), "left_semi")
  }

  def qCurate(spark: SparkSession, dir: String): DataFrame = {
    val tiered = curate(Tables.load(spark, dir, "documents"))
      .withColumn("tier", Dedup.lengthTier(col("text")))
    Dedup.stratifiedSample(tiered, col("tier"),
      Dedup.TierThresholds, defaultPer10k = Dedup.TierDefault)
      .groupBy(col("tier"))
      .agg(count(lit(1)).as("n_kept"),
        min(col("quality")).as("min_quality"),
        max(col("quality")).as("max_quality"),
        min(col("doc_id")).as("min_id"))
  }

  val qCurateSql: String =
    s"""WITH stats AS (SELECT * FROM (${TextAnalysis.qTextStatsSql})),
       |lang AS (SELECT * FROM (${TextAnalysis.qLangIdSql})),
       |keep AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
       |cur AS (
       |  SELECT d.doc_id, d.text, s.quality
       |  FROM documents d
       |  JOIN stats s USING (doc_id)
       |  JOIN lang l USING (doc_id)
       |  WHERE s.quality >= $QualityFloor AND l.pred_lang = '$KeepLang'
       |    AND d.doc_id IN (SELECT doc_id FROM keep)),
       |t AS (
       |  SELECT doc_id, quality,
       |         ${Dedup.tierSqlCase} AS tier
       |  FROM cur),
       |f AS (
       |  SELECT * FROM t
       |  WHERE ${md5LongSql("CAST(doc_id AS VARCHAR)")} % 10000 < ${Dedup.tierThresholdSqlCase})
       |SELECT tier, count(*) AS n_kept,
       |       min(quality) AS min_quality, max(quality) AS max_quality,
       |       min(doc_id) AS min_id
       |FROM f GROUP BY tier""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_curate" -> (qCurate _))

  val oracleSql: Map[String, String] = Map(
    "pipeline_curate" -> qCurateSql)
}
