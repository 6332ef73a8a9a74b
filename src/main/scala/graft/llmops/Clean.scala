package graft.llmops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Text normalization — the first stage of every LLM data pipeline:
  * strip markup, collapse whitespace runs, case-fold. Everything here is
  * a NARROW projection (scan → regexp chain → project, zero shuffle,
  * whole-stage codegen), so at 100 TB it runs at scan speed and its
  * output partitioning mirrors the input's.
  *
  * Regexes stay inside the RE2 ∩ Java common subset (the [[Redact]]
  * discipline) so the DuckDB oracle executes the IDENTICAL pattern:
  *  - no `\s` (RE2's class differs from Java's on `\x0B`) — the
  *    whitespace class is spelled out;
  *  - no `\p{Cntrl}` (Java name; RE2 spells it `\p{Cc}`) — control
  *    chars are covered by the explicit class too;
  *  - case-folding via `lower()`, ASCII-identical on both engines (the
  *    fixtures are ASCII; full Unicode folding is locale-trapped on ANY
  *    pair of engines and belongs to a collation layer, not here).
  */
object Clean {

  /** Whitespace spelled explicitly — identical in RE2 and Java. */
  private val Ws = "[ \\t\\n\\r\\f]+"

  /** `<tag>`-shaped markup (HTML/XML); non-greedy bounded by `>`. */
  private val Tag = "<[^>]*>"

  /** lower(trim(collapse(strip-tags(text)))) — one codegen'd chain. */
  def cleanCol(text: Column): Column =
    lower(trim(regexp_replace(
      regexp_replace(coalesce(text, lit("")), Tag, " "), Ws, " ")))

  /** Cleaned text per document plus its post-clean size — the columns a
    * curation pipeline filters and tokenizes downstream. */
  def cleanDocs(docs: DataFrame): DataFrame = {
    val clean = cleanCol(col("text"))
    docs.select(col("doc_id"), clean.as("clean"))
      .withColumn("n_chars_clean", length(col("clean")).cast("long"))
      .withColumn("n_words_clean",
        when(col("clean") === "", 0L)
          .otherwise(size(split(col("clean"), " ")).cast("long")))
  }

  // ----------------------------------------------- token-run collapse

  /** Collapse immediate token repetitions — the CLEANER counterpart to
    * [[TextAnalysis.withRepetition]]'s detector: "the the the cat" is
    * stutter noise (OCR, scraper echo, generation loops); keep one token
    * of every consecutive run. A token is kept iff it differs from its
    * ORIGINAL left neighbor, which collapses a whole run to its head in
    * one indexed-lambda pass — a narrow codegen'd projection, zero
    * shuffle, scan-speed at any scale (same shape as [[cleanCol]]).
    * Longer-period phrase loops ("the cat the cat") are detection
    * territory ([[TextAnalysis.withRepetition]]'s top-2gram share) —
    * collapsing those safely needs period inference, out of scope here.
    *
    * Output: (doc_id, cleaned, n_tokens, n_removed). */
  def collapseTokenRuns(docs: DataFrame): DataFrame =
    docs
      .filter(col("doc_id").isNotNull)
      .select(col("doc_id"),
        split(coalesce(col("text"), lit("")), " ").as("toks"))
      // Spark lambda index is 0-based, element_at is 1-based: for token
      // i the original left neighbor is element_at(toks, i)
      .withColumn("kept",
        expr("filter(toks, (t, i) -> i = 0 OR t != element_at(toks, i))"))
      .select(col("doc_id"),
        array_join(col("kept"), " ").as("cleaned"),
        size(col("toks")).cast("long").as("n_tokens"),
        (size(col("toks")) - size(col("kept"))).cast("long").as("n_removed"))

  // ----------------------------------------------------------------- query

  def qClean(spark: SparkSession, dir: String): DataFrame =
    cleanDocs(Tables.load(spark, dir, "documents"))

  /** DuckDB regexp_replace needs the explicit 'g' flag (default replaces
    * the FIRST match only; Spark always replaces all). */
  val qCleanSql: String =
    """WITH c AS (
      |  SELECT doc_id,
      |         lower(trim(regexp_replace(regexp_replace(
      |           coalesce(text, ''), '<[^>]*>', ' ', 'g'),
      |           '[ \t\n\r\f]+', ' ', 'g'))) AS clean
      |  FROM documents)
      |SELECT doc_id, clean,
      |       CAST(len(clean) AS BIGINT) AS n_chars_clean,
      |       CAST(CASE WHEN clean = '' THEN 0
      |                 ELSE len(string_split(clean, ' ')) END AS BIGINT)
      |         AS n_words_clean
      |FROM c""".stripMargin

  def qTokenRuns(spark: SparkSession, dir: String): DataFrame =
    collapseTokenRuns(Tables.load(spark, dir, "documents"))

  /** DuckDB's lambda index is 1-based and list indexing is 1-based, so
    * "original left neighbor" is `toks[i - 1]` — the same element the
    * Spark side reads. */
  val qTokenRunsSql: String =
    """WITH t AS (
      |  SELECT doc_id, string_split(coalesce(text, ''), ' ') AS toks
      |  FROM documents WHERE doc_id IS NOT NULL),
      |k AS (
      |  SELECT doc_id, toks,
      |         list_filter(toks, (t, i) -> i = 1 OR t != toks[i - 1]) AS kept
      |  FROM t)
      |SELECT doc_id, array_to_string(kept, ' ') AS cleaned,
      |       CAST(len(toks) AS BIGINT) AS n_tokens,
      |       CAST(len(toks) - len(kept) AS BIGINT) AS n_removed
      |FROM k""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_clean" -> (qClean _),
    "clean_token_runs" -> (qTokenRuns _))

  val oracleSql: Map[String, String] = Map(
    "text_clean" -> qCleanSql,
    "clean_token_runs" -> qTokenRunsSql)
}
