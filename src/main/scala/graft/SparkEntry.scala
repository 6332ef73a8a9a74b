package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{DeclaredQueries, EngineQueries}
import graft.llmops.{Dedup, Multimodal, Similarity, TextAnalysis}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    *
    * The single end-to-end pipeline that proves the engine (SURVEY §7.3):
    * orphan detection — scan → broadcast join → filters → agg → anti-join
    * (reference: dbtwiz/admin/cleanup.py:46-101).
    */
  def entry(spark: SparkSession): DataFrame =
    DeclaredQueries.q2Orphans(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 + the
    * LLM-pipeline extension (SURVEY §7.7). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    DeclaredQueries.queries ++ EngineQueries.queries ++
      TextAnalysis.queries ++ Dedup.queries ++ graft.llmops.Curate.queries ++
      graft.llmops.Decontaminate.queries ++ graft.llmops.Pack.queries ++
      graft.llmops.Redact.queries ++ graft.llmops.Mix.queries ++
      graft.llmops.CorpusStats.queries ++
      graft.llmops.Rank.queries ++ graft.llmops.Clean.queries ++
      graft.llmops.Normalize.queries ++
      graft.operators.BloomJoin.queries ++
      graft.operators.Bucketing.queries ++
      graft.operators.Cdc.queries ++
      graft.operators.Concurrency.queries ++
      graft.operators.Funnel.queries ++
      graft.operators.GlobalRank.queries ++
      graft.operators.JsonCols.queries ++
      graft.operators.PageRank.queries ++
      graft.operators.LabelProp.queries ++
      graft.operators.Quantiles.queries ++
      graft.operators.Reshape.queries ++
      graft.operators.Retention.queries ++
      graft.operators.RollingWindow.queries ++
      graft.operators.SaltedJoin.queries ++
      graft.operators.Sessionize.queries ++
      graft.operators.Unpivot.queries ++
      graft.operators.Shard.queries ++
      graft.operators.Stats.queries ++
      graft.operators.Triangles.queries ++
      graft.operators.Profile.queries ++
      graft.operators.AssocRules.queries ++
      graft.operators.Transitions.queries ++
      graft.operators.Components.queries ++
      graft.operators.LinkPred.queries ++
      graft.operators.KCore.queries ++
      graft.operators.ZOrder.queries ++
      Similarity.queries ++ Multimodal.queries ++
      graft.llmops.LangModel.queries ++
      graft.llmops.QualityRules.queries ++
      graft.llmops.Dsir.queries ++
      graft.llmops.ProductQuant.queries ++
      graft.llmops.BpeTrain.queries ++
      graft.llmops.Bitext.queries ++
      graft.materialize.DataTests.queries ++
      graft.operators.AsOfJoin.queries ++
      graft.operators.Attribution.queries ++
      graft.operators.BasketGraph.queries ++
      graft.operators.Modularity.queries ++
      graft.operators.ChangePoint.queries ++
      graft.operators.RangeJoin.queries ++
      graft.operators.Sketch.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    DeclaredQueries.oracleSql ++ EngineQueries.oracleSql ++
      TextAnalysis.oracleSql ++ Dedup.oracleSql ++ graft.llmops.Curate.oracleSql ++
      graft.llmops.Decontaminate.oracleSql ++ graft.llmops.Pack.oracleSql ++
      graft.llmops.Redact.oracleSql ++ graft.llmops.Mix.oracleSql ++
      graft.llmops.CorpusStats.oracleSql ++
      graft.llmops.Rank.oracleSql ++ graft.llmops.Clean.oracleSql ++
      graft.llmops.Normalize.oracleSql ++
      graft.operators.BloomJoin.oracleSql ++
      graft.operators.Bucketing.oracleSql ++
      graft.operators.Cdc.oracleSql ++
      graft.operators.Concurrency.oracleSql ++
      graft.operators.Funnel.oracleSql ++
      graft.operators.GlobalRank.oracleSql ++
      graft.operators.JsonCols.oracleSql ++
      graft.operators.PageRank.oracleSql ++
      graft.operators.LabelProp.oracleSql ++
      graft.operators.Quantiles.oracleSql ++
      graft.operators.Reshape.oracleSql ++
      graft.operators.Retention.oracleSql ++
      graft.operators.RollingWindow.oracleSql ++
      graft.operators.SaltedJoin.oracleSql ++
      graft.operators.Sessionize.oracleSql ++
      graft.operators.Unpivot.oracleSql ++
      graft.operators.Shard.oracleSql ++
      graft.operators.Stats.oracleSql ++
      graft.operators.Triangles.oracleSql ++
      graft.operators.Profile.oracleSql ++
      graft.operators.AssocRules.oracleSql ++
      graft.operators.Transitions.oracleSql ++
      graft.operators.Components.oracleSql ++
      graft.operators.LinkPred.oracleSql ++
      graft.operators.KCore.oracleSql ++
      graft.operators.ZOrder.oracleSql ++
      Similarity.oracleSql ++ Multimodal.oracleSql ++
      graft.llmops.LangModel.oracleSql ++
      graft.llmops.QualityRules.oracleSql ++
      graft.llmops.Dsir.oracleSql ++
      graft.llmops.ProductQuant.oracleSql ++
      graft.llmops.BpeTrain.oracleSql ++
      graft.llmops.Bitext.oracleSql ++
      graft.materialize.DataTests.oracleSql ++
      graft.operators.AsOfJoin.oracleSql ++
      graft.operators.Attribution.oracleSql ++
      graft.operators.BasketGraph.oracleSql ++
      graft.operators.Modularity.oracleSql ++
      graft.operators.ChangePoint.oracleSql ++
      graft.operators.RangeJoin.oracleSql ++
      graft.operators.Sketch.oracleSql
}
