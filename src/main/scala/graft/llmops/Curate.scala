package graft.llmops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import Hashing.{md5LongSql, stableRound}

/** End-to-end curation pipeline — the composition a training-data user
  * actually runs: language gate ∘ quality gate ∘ exact-dedup keepers ∘
  * deterministic stratified sampling, in one DataFrame plan. Each stage
  * is an existing oracle-gated operator ([[TextAnalysis]], [[Dedup]]);
  * this query gates their COMPOSITION, where column naming, join keys,
  * and filter ordering bugs live. All narrow stages fuse; the only
  * shuffles are the dedup groupBy and the final summary aggregation.
  *
  * Summary statistics are order-independent on purpose (count, min,
  * max): an avg over engine-dependent summation order would wobble in
  * the last bits and poison the hash compare. */
object Curate {

  val QualityFloor = 0.5
  val KeepLang = "en"

  def curate(docs: DataFrame): DataFrame = {
    val stats = TextAnalysis.withTextStats(docs).select(col("doc_id"), col("quality"))
    val lang = TextAnalysis.withLangId(docs).select(col("doc_id"), col("pred_lang"))
    val keepers = Dedup.exactDedup(docs, "doc_id", "text")
      .select(col("keep_id").as("doc_id"))
    docs.join(stats, "doc_id").join(lang, "doc_id")
      .join(keepers, Seq("doc_id"), "left_semi")
      .filter(col("quality") >= QualityFloor && col("pred_lang") === KeepLang)
  }

  def qCurate(spark: SparkSession, dir: String): DataFrame = {
    val tiered = curate(Tables.load(spark, dir, "documents"))
      .withColumn("tier",
        when(length(col("text")) < 150, "short")
          .when(length(col("text")) < 400, "medium")
          .otherwise("long"))
    Dedup.stratifiedSample(tiered, col("tier"),
      Map("short" -> 2000, "medium" -> 5000), defaultPer10k = 10000)
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
       |         CASE WHEN length(text) < 150 THEN 'short'
       |              WHEN length(text) < 400 THEN 'medium'
       |              ELSE 'long' END AS tier
       |  FROM cur),
       |f AS (
       |  SELECT * FROM t
       |  WHERE ${md5LongSql("CAST(doc_id AS VARCHAR)")} % 10000 <
       |        (CASE tier WHEN 'short' THEN 2000 WHEN 'medium' THEN 5000 ELSE 10000 END))
       |SELECT tier, count(*) AS n_kept,
       |       min(quality) AS min_quality, max(quality) AS max_quality,
       |       min(doc_id) AS min_id
       |FROM f GROUP BY tier""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_curate" -> (qCurate _))

  val oracleSql: Map[String, String] = Map(
    "pipeline_curate" -> qCurateSql)
}
