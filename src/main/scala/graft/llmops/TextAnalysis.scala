package graft.llmops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language ID (stopword heuristic), and
  * document fingerprinting. All are narrow per-row transforms — no shuffle,
  * fully codegen'd (`functions._` + higher-order array functions, no UDFs) —
  * so they scale linearly with input splits at 100 TB.
  *
  * Each operator is exposed (a) as a reusable DataFrame transform and
  * (b) as an oracle-checked query over the `documents` fixture.
  */
object TextAnalysis {

  /** Tiny per-language stopword lists for the n-gram/stopword langid
    * heuristic. Real lists would be longer; the mechanism (per-language
    * token-hit scoring, argmax with deterministic tiebreak) is the point. */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "is"),
    "es" -> Seq("el", "la", "de", "y", "que", "los"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein"),
    "fr" -> Seq("le", "la", "et", "les", "des", "une"))

  private def inList(vals: Seq[String]): String =
    vals.map(v => s"'$v'").mkString("(", ", ", ")")

  /** Adds token/quality columns. Token model: whitespace words plus a
    * BPE-ish estimate (alnum runs + ceil(chars/4) continuation pieces). */
  def withTextStats(docs: DataFrame): DataFrame = {
    val en = inList(stopwords.head._2)
    docs
      .withColumn("words", split(col("text"), " "))
      .withColumn("n_tokens", size(col("words")))
      .withColumn("n_uniq_tokens", size(array_distinct(col("words"))))
      .withColumn("n_chars_m", length(col("text")))
      .withColumn("n_alnum_tokens",
        size(expr("regexp_extract_all(text, '[a-z0-9]+', 0)")))
      .withColumn("bpe_est",
        ceil(length(col("text")).cast("double") / 4.0).cast("long"))
      // Raw (unrounded) ratios feed the quality score; rounding the inputs
      // first would cluster quality at 5th-decimal half-boundaries where
      // Spark's BigDecimal rounding and DuckDB's multiply-round disagree.
      .withColumn("raw_stopword_ratio",
        expr(s"size(filter(words, w -> w in $en))").cast("double") /
          col("n_tokens"))
      .withColumn("raw_uniq_ratio",
        col("n_uniq_tokens").cast("double") / col("n_tokens"))
      .withColumn("avg_word_len",
        round(expr("aggregate(words, cast(0 as double), (acc, w) -> acc + length(w))") /
          col("n_tokens"), 4))
      .withColumn("stopword_ratio", round(col("raw_stopword_ratio"), 4))
      .withColumn("uniq_ratio", round(col("raw_uniq_ratio"), 4))
      // Quality score: in [0,1]-ish, rewards lexical diversity and a
      // natural stopword rate, penalizes very short docs. Rounded with the
      // bit-stable floor(x*1e4 + 0.5)/1e4 — expressed identically in the
      // oracle — because the weighted sum lands exactly on 4-decimal half
      // boundaries where BigDecimal-HALF_UP (Spark) and DuckDB round()
      // disagree on the underlying double.
      .withColumn("quality",
        floor((least(lit(1.0), col("n_tokens").cast("double") / 100.0) * 0.4 +
          col("raw_uniq_ratio") * 0.3 +
          least(lit(1.0), col("raw_stopword_ratio") * 5.0) * 0.3) * 10000.0 + 0.5) / 10000.0)
  }

  /** Language-ID by stopword-hit argmax with deterministic tiebreak
    * (hit counts compared in declaration order; 'und' when no hits). */
  def withLangId(docs: DataFrame): DataFrame = {
    val withHits = stopwords.foldLeft(
      docs.withColumn("words", split(col("text"), " "))) {
      case (df, (lang, ws)) =>
        df.withColumn(s"hits_$lang",
          expr(s"size(filter(words, w -> w in ${inList(ws)}))"))
    }
    val langs = stopwords.map(_._1)
    val best = langs.map(l => col(s"hits_$l")).reduce((a, b) => greatest(a, b))
    // Earlier languages win ties: build the CASE chain inside-out so the
    // first declared language is the outermost branch.
    val predFirstWins = langs.reverse.foldLeft(lit("und")) { (acc, l) =>
      when(col(s"hits_$l") === best && best > 0, lit(l)).otherwise(acc)
    }
    withHits.withColumn("pred_lang", predFirstWins)
      .withColumn("lang_score", best)
  }

  /** Fingerprints: md5 of normalized text (exact), and a winnowing-style
    * min-hash over character 8-grams (rolling-hash robust fingerprint). */
  def withFingerprints(docs: DataFrame): DataFrame =
    docs
      .withColumn("norm", lower(regexp_replace(col("text"), "\\s+", " ")))
      .withColumn("fp_md5", md5(col("norm")))
      .withColumn("fp_winnow",
        expr(s"""array_min(transform(sequence(1, greatest(length(norm) - 7, 1)),
                 i -> ${duckCompatHashExpr("substring(norm, i, 8)")}))"""))

  /** Spark-SQL text of the shared 60-bit hash (see Hashing.md5Long). */
  private def duckCompatHashExpr(e: String): String =
    s"cast(conv(substr(md5($e), 1, 15), 16, 10) as bigint)"

  // ----------------------------------------------------------------- queries

  def qTextStats(spark: SparkSession, dir: String): DataFrame =
    withTextStats(Tables.load(spark, dir, "documents"))
      .select(col("doc_id"), col("n_tokens"), col("n_uniq_tokens"),
        col("n_alnum_tokens"), col("bpe_est"), col("avg_word_len"),
        col("stopword_ratio"), col("quality"))

  val qTextStatsSql: String = {
    val en = inList(stopwords.head._2)
    s"""WITH t AS (
       |  SELECT doc_id, text, string_split(text, ' ') AS words FROM documents
       |), s AS (
       |  SELECT doc_id,
       |         len(words) AS n_tokens,
       |         len(list_distinct(words)) AS n_uniq_tokens,
       |         len(regexp_extract_all(text, '[a-z0-9]+')) AS n_alnum_tokens,
       |         CAST(ceil(length(text) / 4.0) AS BIGINT) AS bpe_est,
       |         round(list_sum(list_transform(words, w -> length(w))) * 1.0 / len(words), 4) AS avg_word_len,
       |         CAST(len(list_filter(words, w -> w IN $en)) AS DOUBLE) / len(words) AS raw_stopword_ratio,
       |         CAST(len(list_distinct(words)) AS DOUBLE) / len(words) AS raw_uniq_ratio
       |  FROM t)
       |SELECT doc_id, n_tokens, n_uniq_tokens, n_alnum_tokens, bpe_est,
       |       avg_word_len, round(raw_stopword_ratio, 4) AS stopword_ratio,
       |       floor((least(1.0, n_tokens / 100.0) * 0.4 + raw_uniq_ratio * 0.3 +
       |             least(1.0, raw_stopword_ratio * 5.0) * 0.3) * 10000.0 + 0.5) / 10000.0 AS quality
       |FROM s""".stripMargin
  }

  def qLangId(spark: SparkSession, dir: String): DataFrame =
    withLangId(Tables.load(spark, dir, "documents"))
      .select(col("doc_id"), col("pred_lang"), col("lang_score"))

  val qLangIdSql: String = {
    val hitCols = stopwords.map { case (l, ws) =>
      s"len(list_filter(words, w -> w IN ${inList(ws)})) AS hits_$l"
    }.mkString(",\n         ")
    val best = stopwords.map(l => s"hits_${l._1}")
      .reduceRight((a, b) => s"greatest($a, $b)")
    val pred = stopwords.map(_._1).reverse.foldLeft("'und'") { (acc, l) =>
      s"CASE WHEN hits_$l = best AND best > 0 THEN '$l' ELSE $acc END"
    }
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
       |h AS (SELECT doc_id,
       |         $hitCols
       |      FROM t),
       |b AS (SELECT *, $best AS best FROM h)
       |SELECT doc_id, $pred AS pred_lang, best AS lang_score FROM b""".stripMargin
  }

  def qFingerprint(spark: SparkSession, dir: String): DataFrame =
    withFingerprints(Tables.load(spark, dir, "documents"))
      .select(col("doc_id"), col("fp_md5"), col("fp_winnow"))

  val qFingerprintSql: String =
    s"""WITH n AS (SELECT doc_id, lower(regexp_replace(text, '\\s+', ' ', 'g')) AS norm FROM documents),
       |g AS (SELECT doc_id, norm, unnest(generate_series(1, greatest(length(norm) - 7, 1))) AS i FROM n)
       |SELECT doc_id, min(md5(norm)) AS fp_md5,
       |       min(${Hashing.md5LongSql("substring(norm, CAST(i AS INT), 8)")}) AS fp_winnow
       |FROM g
       |GROUP BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_stats" -> (qTextStats _),
    "text_langid" -> (qLangId _),
    "text_fingerprint" -> (qFingerprint _))

  val oracleSql: Map[String, String] = Map(
    "text_stats" -> qTextStatsSql,
    "text_langid" -> qLangIdSql,
    "text_fingerprint" -> qFingerprintSql)
}
