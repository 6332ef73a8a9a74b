package graft.llmops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Corpus-level token-frequency quality signals — the distributional
  * filter family (CCNet/Gopher-style "rare token" screens) that needs
  * global corpus statistics, unlike [[TextAnalysis]]'s narrow per-doc
  * kernels: per document, the mean corpus frequency of its tokens and
  * the share of rare tokens (corpus frequency ≤ [[RareMax]]). Low mean
  * frequency + high rare share flags OCR noise and junk; the inverse
  * flags boilerplate.
  *
  * Shape at 100 TB — this is a deliberately two-shuffle plan with a skew
  * split on the token join:
  *
  *  1. vocabulary build: explode → groupBy(token) with map-side combine —
  *     one shuffle of (token, partial count), output is vocab-sized;
  *  2. frequency lookup: token frequencies follow Zipf, so a plain
  *     shuffle join on token funnels the stopword keys ("the" alone can
  *     be 5% of all rows) through single tasks. The join is therefore
  *     SPLIT: the [[HeadVocab]] most frequent tokens — exactly the hot
  *     keys — join via broadcast (map-side, no shuffle, no skew), and
  *     only the long cold tail (bounded per-key row counts by
  *     construction) takes the shuffle join;
  *  3. per-doc re-agg: one shuffle on doc_id with map-side combine.
  *
  * All aggregated quantities are INTEGER sums (counts and frequency
  * totals), so the final divisions are exact-input doubles and the
  * [[Hashing.stableRound]] outputs are bit-identical to the DuckDB
  * oracle — no FP-order hazard anywhere.
  */
object CorpusStats {

  /** A token with corpus frequency ≤ this is "rare" (hapax/dis legomena). */
  val RareMax = 2

  /** Hot-vocabulary size for the broadcast side of the skew split. */
  val HeadVocab = 1024

  def corpusFreqStats(docs: DataFrame,
                      headVocab: Int = HeadVocab): DataFrame = {
    val toks = docs
      .select(col("doc_id").cast("long"),
        explode(split(col("text"), " ")).as("token"))
    val freq = toks.groupBy(col("token")).agg(count(lit(1)).as("freq"))
    // Skew split: hot tokens by broadcast, cold tail by shuffle join.
    val head = freq.orderBy(col("freq").desc, col("token")).limit(headVocab)
    val tail = freq.join(broadcast(head.select(col("token"))),
      Seq("token"), "left_anti")
    val joined = toks.join(broadcast(head), Seq("token"))
      .unionByName(toks.join(tail, Seq("token")))
    joined.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("freq")).as("sum_freq"),
        sum(when(col("freq") <= RareMax, 1L).otherwise(0L)).as("n_rare"))
      .select(col("doc_id"), col("n_tokens"),
        Hashing.stableRound(col("sum_freq") / col("n_tokens"), 4)
          .as("avg_freq"),
        Hashing.stableRound(col("n_rare") / col("n_tokens"), 4)
          .as("rare_ratio"))
  }

  /** Exact top-k heavy hitters per group — "top sources per language",
    * "top domains per shard": aggregate first (one shuffle with map-side
    * combine down to |group × key| rows), THEN rank with a window over
    * the aggregated counts only. The window never sees raw rows, so the
    * per-group funnel is bounded by key cardinality, not data volume —
    * the same histogram-first discipline as
    * [[graft.operators.Quantiles]]. Ties break by key for
    * determinism. */
  def topKPerGroup(df: DataFrame, groupCol: String, keyCol: String,
                   k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(groupCol), col(keyCol))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(groupCol)
      .orderBy(col("n").desc, col(keyCol))
    counts.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  // ----------------------------------------------------------------- query

  def qCorpusFreq(spark: SparkSession, dir: String): DataFrame =
    corpusFreqStats(Tables.load(spark, dir, "documents"))

  def qTopkSources(spark: SparkSession, dir: String): DataFrame =
    topKPerGroup(Tables.load(spark, dir, "documents"), "lang", "source", 3)
      .select(col("lang"), col("source"), col("n"), col("rank"))

  val qTopkSourcesSql: String =
    """WITH c AS (SELECT lang, source, count(*) AS n
      |           FROM documents GROUP BY 1, 2),
      |r AS (SELECT *, row_number() OVER (PARTITION BY lang
      |               ORDER BY n DESC, source) AS rank FROM c)
      |SELECT lang, source, n, rank FROM r WHERE rank <= 3""".stripMargin

  /** The oracle states the semantics with ONE plain join — the skew-split
    * union must reproduce it exactly (every token matches exactly one of
    * head/tail, so the union is a partition of the plain join). */
  val qCorpusFreqSql: String =
    s"""WITH toks AS MATERIALIZED (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
       |  FROM documents),
       |freq AS (SELECT token, count(*) AS freq FROM toks GROUP BY 1)
       |SELECT t.doc_id, count(*) AS n_tokens,
       |       ${Hashing.stableRoundSql("sum(f.freq) / count(*)", 4)}
       |         AS avg_freq,
       |       ${Hashing.stableRoundSql(
             s"sum(CASE WHEN f.freq <= $RareMax THEN 1 ELSE 0 END) " +
               "/ count(*)", 4)} AS rare_ratio
       |FROM toks t JOIN freq f USING (token)
       |GROUP BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "quality_corpusfreq" -> (qCorpusFreq _),
    "topk_sources" -> (qTopkSources _))

  val oracleSql: Map[String, String] = Map(
    "quality_corpusfreq" -> qCorpusFreqSql,
    "topk_sources" -> qTopkSourcesSql)
}
