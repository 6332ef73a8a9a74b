package graft.llmops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Gopher-style hard quality gates (Rae et al., "Scaling Language Models:
  * Methods, Analysis & Insights from Training Gopher", 2021, §A1.1 /
  * MassiveText filtering) — the rule battery web-scale corpora are run
  * through BEFORE any model-based scoring: word-count bounds, mean word
  * length bounds, symbol-to-word ratio, alphabetic-word fraction, and a
  * required-stopword hit count.
  *
  * Every rule is evaluated in INTEGER algebra — ratio thresholds become
  * cross-multiplications (`3·n ≤ sum_chars ≤ 10·n` instead of
  * `3 ≤ sum/n ≤ 10`) — so verdicts are bit-deterministic and
  * oracle-comparable with no float rounding contract. The whole operator
  * is one narrow codegen'd projection per document: no shuffle, no UDF,
  * survives any scale the scan survives.
  *
  * Rule constants (word-count lower bound 30 vs the paper's 50) are tuned
  * so the fixture corpus splits non-trivially; the algebra is the paper's. */
object QualityRules {

  /** Required stopwords (Gopher's "must contain ≥2 of"): the paper's list
    * intersected with [[TextAnalysis.stopwords]]'s English inventory. */
  val RequiredStops: Seq[String] = Seq("the", "a", "and", "of", "to", "in", "is", "that")

  /** Symbol inventory for the symbol-to-word rule — the paper's full
    * set, not just `#`/`...`: Gopher A1.1 names the hash symbol and the
    * ellipsis (both the three-dot spelling and U+2026), and its
    * line-level bullet rule contributes the bullet glyphs (•, ‣, ▪).
    * A word COUNTS as a symbol word when it contains any inventory
    * member; the 10% threshold below is the paper's 0.1 ratio as a
    * cross-multiplication. */
  val SymbolTokens: Seq[String] =
    Seq("#", "...", "…", "•", "‣", "▪")

  /** Word-count bounds — paper: 50..100k; lower bound tuned to 30 so the
    * fixture corpus splits non-trivially (documented deviation). */
  val MinWords = 30L
  val MaxWords = 100000L

  private def flag(c: Column): Column = when(c, 1).otherwise(0).cast("int")

  /** Per-document rule verdicts: counters + one 0/1 column per rule and
    * the conjunction `passes`. `carryCols` rides extra input columns
    * (e.g. source/lang) through unchanged, so downstream roll-ups
    * ([[CorpusStats.corpusReport]]) never need a corpus-sized join back
    * to the metadata. */
  def gopherRules(docs: DataFrame, carryCols: Seq[String] = Nil): DataFrame = {
    val words = filter(split(col("text"), " "), w => w =!= "")
    val carry = carryCols.map(col)
    docs
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
      .select(col("doc_id") +: carry :+ words.as("words"): _*)
      .select((col("doc_id") +: carry) ++ Seq(
        size(col("words")).cast("long").as("n_words"),
        aggregate(col("words"), lit(0L), (a, w) => a + length(w)).as("sum_word_chars"),
        size(filter(col("words"), w => w.rlike("[a-zA-Z]"))).cast("long").as("n_alpha_words"),
        size(filter(col("words"),
          w => SymbolTokens.map(s => w.contains(s)).reduce(_ || _)))
          .cast("long").as("n_symbol_words"),
        size(filter(array(RequiredStops.map(lit): _*),
          s => array_contains(col("words"), s))).cast("long").as("n_stop_hits")): _*)
      .withColumn("ok_word_count",
        flag(col("n_words") >= MinWords && col("n_words") <= MaxWords))
      .withColumn("ok_mean_len",
        flag(col("n_words") * 3 <= col("sum_word_chars") &&
          col("sum_word_chars") <= col("n_words") * 10))
      .withColumn("ok_alpha", flag(col("n_alpha_words") * 10 >= col("n_words") * 8))
      .withColumn("ok_symbol", flag(col("n_symbol_words") * 10 <= col("n_words")))
      .withColumn("ok_stopwords", flag(col("n_stop_hits") >= 2))
      .withColumn("passes", flag(
        col("ok_word_count") + col("ok_mean_len") + col("ok_alpha") +
          col("ok_symbol") + col("ok_stopwords") === 5))
  }

  /** Fixture blocklist for [[blocklistFilter]]'s oracle query: real
    * deployments load the language-specific banned-term list; these two
    * fixture-vocabulary words exercise hit, multi-hit and clean docs. */
  val FixtureBlocklist: Seq[String] = Seq("slow", "dup")

  /** C4-style blocklist filter (Raffel et al. 2020 §2.2: pages with any
    * "bad word" are dropped): per document, the banned-token hit count,
    * hit rate in basis points, and the any-hit `blocked` verdict.
    * Membership is exact on space-split tokens (the repo's tokenizer
    * contract — substring matching would false-positive on benign
    * compounds, the documented C4 over-blocking failure).
    *
    * The blocklist embeds as a literal array in a codegen'd HOF filter:
    * zero shuffle, zero joins, scan-speed at any corpus size (real
    * lists are thousands of terms — still literal-sized; beyond that,
    * the [[graft.operators.BloomJoin]] probe is the same shape with a
    * bitmap). NULL text pins to the empty doc. */
  def blocklistFilter(docs: DataFrame,
                      banned: Seq[String] = FixtureBlocklist): DataFrame = {
    require(banned.nonEmpty, "empty blocklist — nothing to filter")
    docs.filter(col("doc_id").isNotNull)
      .select(col("doc_id"),
        split(coalesce(col("text"), lit("")), " ").as("words"))
      .select(col("doc_id"),
        size(col("words")).cast("long").as("n_tokens"),
        size(filter(col("words"),
          w => banned.map(b => w === b).reduce(_ || _)))
          .cast("long").as("n_banned"))
      .select(col("doc_id"), col("n_tokens"), col("n_banned"),
        expr("n_banned * 10000 div n_tokens").as("banned_bp"),
        (col("n_banned") > 0).as("blocked"))
  }

  // ------------------------------------------------------------ queries

  def qGopher(spark: SparkSession, dir: String): DataFrame =
    gopherRules(Tables.load(spark, dir, "documents"))

  def qBlocklist(spark: SparkSession, dir: String): DataFrame =
    blocklistFilter(Tables.load(spark, dir, "documents"))

  val blocklistSql: String = {
    val pred = FixtureBlocklist.map(b => s"w = '$b'").mkString(" OR ")
    s"""WITH t AS (
       |  SELECT doc_id, string_split(coalesce(text, ''), ' ') AS words
       |  FROM documents WHERE doc_id IS NOT NULL),
       |c AS (
       |  SELECT doc_id, CAST(len(words) AS BIGINT) AS n_tokens,
       |         CAST(len(list_filter(words, w -> $pred)) AS BIGINT) AS n_banned
       |  FROM t)
       |SELECT doc_id, n_tokens, n_banned,
       |       (n_banned * 10000) // n_tokens AS banned_bp,
       |       n_banned > 0 AS blocked
       |FROM c""".stripMargin
  }

  private val stopsList = RequiredStops.map(s => s"'$s'").mkString("[", ", ", "]")

  /** `contains(w, '#') OR contains(w, '...') OR …` over [[SymbolTokens]]
    * — same inventory, same membership semantics as the Spark side. */
  private val symbolPredSql =
    SymbolTokens.map(s => s"contains(w, '$s')").mkString(" OR ")

  val gopherSql: String =
    s"""WITH f AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS words
       |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
       |s AS (
       |  SELECT doc_id,
       |    CAST(len(words) AS BIGINT) AS n_words,
       |    CAST(coalesce(list_sum(list_transform(words, w -> length(w))), 0) AS BIGINT)
       |      AS sum_word_chars,
       |    CAST(len(list_filter(words, w -> regexp_matches(w, '[a-zA-Z]'))) AS BIGINT)
       |      AS n_alpha_words,
       |    CAST(len(list_filter(words, w -> $symbolPredSql))
       |      AS BIGINT) AS n_symbol_words,
       |    CAST(len(list_filter($stopsList, s -> list_contains(words, s))) AS BIGINT)
       |      AS n_stop_hits
       |  FROM f)
       |SELECT doc_id, n_words, sum_word_chars, n_alpha_words, n_symbol_words, n_stop_hits,
       |  CAST(CASE WHEN n_words BETWEEN $MinWords AND $MaxWords THEN 1 ELSE 0 END AS INT)
       |    AS ok_word_count,
       |  CAST(CASE WHEN n_words * 3 <= sum_word_chars AND sum_word_chars <= n_words * 10
       |       THEN 1 ELSE 0 END AS INT) AS ok_mean_len,
       |  CAST(CASE WHEN n_alpha_words * 10 >= n_words * 8 THEN 1 ELSE 0 END AS INT)
       |    AS ok_alpha,
       |  CAST(CASE WHEN n_symbol_words * 10 <= n_words THEN 1 ELSE 0 END AS INT)
       |    AS ok_symbol,
       |  CAST(CASE WHEN n_stop_hits >= 2 THEN 1 ELSE 0 END AS INT) AS ok_stopwords,
       |  CAST(CASE WHEN n_words BETWEEN $MinWords AND $MaxWords
       |         AND n_words * 3 <= sum_word_chars AND sum_word_chars <= n_words * 10
       |         AND n_alpha_words * 10 >= n_words * 8
       |         AND n_symbol_words * 10 <= n_words
       |         AND n_stop_hits >= 2 THEN 1 ELSE 0 END AS INT) AS passes
       |FROM s""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "quality_gopher" -> (qGopher _),
    "filter_blocklist" -> (qBlocklist _))

  val oracleSql: Map[String, String] = Map(
    "quality_gopher" -> gopherSql,
    "filter_blocklist" -> blocklistSql)
}
