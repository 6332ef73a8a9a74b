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

  /** (doc_id, token) pairs of the corpus — the shared explode. */
  private def tokenize(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").cast("long"),
      explode(split(col("text"), " ")).as("token"))

  /** Skew-split frequency attach: every (doc_id, token) row gains the
    * token's corpus `freq`. Hot tokens (top `headVocab` by frequency —
    * exactly the Zipf head that would funnel a plain shuffle join)
    * broadcast; only the bounded-cardinality cold tail shuffle-joins.
    * The union is a partition of the plain join (each token matches
    * exactly one of head/tail), so semantics are join-identical. */
  private[graft] def withTokenFreq(toks: DataFrame,
                                   headVocab: Int): DataFrame = {
    val freq = toks.groupBy(col("token")).agg(count(lit(1)).as("freq"))
    val head = freq.orderBy(col("freq").desc, col("token")).limit(headVocab)
    val tail = freq.join(broadcast(head.select(col("token"))),
      Seq("token"), "left_anti")
    toks.join(broadcast(head), Seq("token"))
      .unionByName(toks.join(tail, Seq("token")))
  }

  def corpusFreqStats(docs: DataFrame,
                      headVocab: Int = HeadVocab): DataFrame = {
    withTokenFreq(tokenize(docs), headVocab)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("freq")).as("sum_freq"),
        sum(when(col("freq") <= RareMax, 1L).otherwise(0L)).as("n_rare"))
      .select(col("doc_id"), col("n_tokens"),
        Hashing.stableRound(col("sum_freq") / col("n_tokens"), 4)
          .as("avg_freq"),
        Hashing.stableRound(col("n_rare") / col("n_tokens"), 4)
          .as("rare_ratio"))
  }

  /** Per-document n-gram NOVELTY — the marginal-information screen a
    * curation pipeline runs before paying to keep a document: the
    * fraction of a doc's DISTINCT word-3-gram shingles that occur in NO
    * other document (corpus doc-frequency 1). Boilerplate and
    * near-template docs score ~0 (their shingles are everywhere);
    * genuinely new content scores toward 1. The complement of
    * [[ngramDiversity]]'s corpus-granularity view, at the granularity
    * sampling and keep-lists act on — and the dedup-adjacent signal
    * that catches "not a duplicate, but says nothing new".
    *
    * Shape at 100 TB: one narrow shingle-kernel pass (the shared 60-bit
    * hash domain — [[Kernels.distinctShingleHashes]]), one
    * map-side-combined doc-frequency rollup bounded by |distinct
    * shingles|, then the [[withTokenFreq]] Zipf discipline: the
    * `headShingles` hottest shingles broadcast and only the cold tail
    * shuffle-joins, so boilerplate shingles (the df-heavy head by
    * definition) never funnel a shuffle partition. */
  def noveltyScores(docs: DataFrame, headShingles: Int = HeadVocab): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rows = docs
      .filter(col("doc_id").isNotNull)
      .select(col("doc_id").cast("long"),
        coalesce(col("text"), lit("")).as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = Kernels.newMd5()
        it.flatMap { case (id, text) =>
          Kernels.distinctShingleHashes(md, text).iterator.map(h => (id, h))
        }
      }.toDF("doc_id", "h")
    // rows are per-doc-distinct, so count per h IS document frequency
    val dfreq = rows.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val head = dfreq.orderBy(col("df").desc, col("h")).limit(headShingles)
    val tail = dfreq.join(broadcast(head.select(col("h"))), Seq("h"), "left_anti")
    rows.join(broadcast(head), Seq("h"))
      .unionByName(rows.join(tail, Seq("h")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_novel"))
      .select(col("doc_id"), col("n_shingles"), col("n_novel"),
        Hashing.stableRound(
          col("n_novel").cast("double") / col("n_shingles"), 4).as("novelty"))
  }

  def qNovelty(spark: SparkSession, dir: String): DataFrame =
    noveltyScores(Tables.load(spark, dir, "documents"))

  /** Same shingle hash domain and df rollup; docs with < 3 tokens have
    * no shingles and are absent on both engines. */
  val qNoveltySql: String = {
    val h = Hashing.md5LongSql("words[i] || ' ' || words[i+1] || ' ' || words[i+2]")
    s"""WITH sh AS MATERIALIZED (
       |  SELECT DISTINCT doc_id, $h AS h
       |  FROM (SELECT doc_id, words,
       |               unnest(generate_series(1, len(words) - 2)) AS i
       |        FROM (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS words
       |              FROM documents WHERE doc_id IS NOT NULL)
       |        WHERE len(words) >= 3)),
       |df AS MATERIALIZED (SELECT h, count(*) AS df FROM sh GROUP BY 1)
       |SELECT s.doc_id, count(*) AS n_shingles,
       |       CAST(sum(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_novel,
       |       ${Hashing.stableRoundSql(
             "sum(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) * 1.0 / count(*)", 4)}
       |         AS novelty
       |FROM sh s JOIN df USING (h)
       |GROUP BY 1""".stripMargin
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

  /** Distinctive keywords per document — the idf intuition without the
    * cross-engine `log()` hazard: a document's most distinctive tokens
    * are its RAREST ones, so rank each doc's distinct tokens by corpus
    * frequency ascending (ties by token) and keep the top `k`. Pure
    * integer/string ordering — no tf·idf float ever computed, so the
    * selection is bit-stable on any engine.
    *
    * Shape: tokenize → distinct (doc, token) → skew-split freq attach →
    * per-DOC window (groups are document-length-bounded, embarrassingly
    * parallel — never a corpus-wide funnel). */
  def distinctiveKeywords(docs: DataFrame, k: Int,
                          headVocab: Int = HeadVocab): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val toks = tokenize(docs).distinct()
    val w = Window.partitionBy("doc_id")
      .orderBy(col("freq"), col("token"))
    withTokenFreq(toks, headVocab)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("token"), col("freq"))
  }

  /** Per-source n-gram diversity — the self-BLEU-style repetition screen
    * at corpus granularity: distinct word-3-gram shingles over total
    * (per-doc-distinct) shingle occurrences. A templated or boilerplate-
    * heavy source reuses the same shingles across documents and scores
    * low; a diverse source approaches 1. Shingle hashing is the shared
    * 60-bit kernel ([[Kernels.distinctShingleHashes]]), so the oracle
    * replicates the exact hash domain — distinctness is counted over
    * identical values on both engines.
    *
    * Shape: one narrow kernel pass emitting (source, doc_id, h), then one
    * aggregation per source. The two distinct-counts expand rows 3× into
    * the shuffle — fine while source cardinality is modest; at extreme
    * cardinality split into two single-distinct aggs over the same
    * frame. */
  def ngramDiversity(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rows = docs
      // NULL doc_id would NPE in the non-nullable Long encoder below, not
      // get excluded — filter it like every other NULL-key kernel, and
      // mirror the filter in the oracle (ADVICE r7)
      .filter(col("doc_id").isNotNull)
      .select(col("doc_id").cast("long"),
        coalesce(col("source"), lit("")).as("source"),
        // NULL text = zero shingles on both engines (the oracle's
        // len(words) filter skips NULL docs; '' yields < 3 tokens here)
        coalesce(col("text"), lit("")).as("text"))
      .as[(Long, String, String)]
      .mapPartitions { it =>
        val md = Kernels.newMd5()
        it.flatMap { case (id, src, text) =>
          Kernels.distinctShingleHashes(md, text).iterator.map(h => (src, id, h))
        }
      }.toDF("source", "doc_id", "h")
    rows.groupBy(col("source"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_shingles"),
        countDistinct(col("h")).as("n_distinct_shingles"))
      .select(col("source"), col("n_docs"), col("n_shingles"),
        col("n_distinct_shingles"),
        Hashing.stableRound(
          col("n_distinct_shingles").cast("double") / col("n_shingles"), 4)
          .as("diversity"))
  }

  /** Collocation (multi-word-expression) mining — the phrase-detection
    * pass a tokenizer/vocab pipeline runs before merging frequent word
    * pairs into single units (word2vec's phrase step, MWE lexicons):
    * adjacent-bigram pairs scored by the Dice coefficient
    * `2·c(x,y) / (c(x) + c(y))`, reported in exact basis points.
    * Dice over PMI deliberately: the score is a ratio of counts that
    * never overflows (`2·c_xy ≤ c_x + c_y`), needs no log, and is
    * integer-pinnable end to end, where PMI's `c_xy·W²/(B·c_x·c_y)`
    * product exceeds int64 at corpus scale.
    *
    * Shape at 100 TB: two map-side-combined rollups (unigrams to vocab
    * size, adjacent bigrams to pair-vocab size) — the only corpus-scale
    * passes — then joins and the top-k rank run on the min-count-filtered
    * PAIR aggregate, which the `minCount` gate keeps collocation-sized.
    * Pair keys are unique post-aggregation, so the unigram joins carry
    * no row explosion and need no skew split. The final row_number is a
    * single-partition sort of the top-k-bound frame (the documented
    * small-frame exception). */
  def collocations(docs: DataFrame, minCount: Int = 3, k: Int = 100): DataFrame = {
    val ws = docs.filter(col("doc_id").isNotNull && col("text").isNotNull)
      .select(filter(split(col("text"), " "), w => w =!= "").as("ws"))
    val uni = ws.select(explode(col("ws")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val pairs = ws.filter(size(col("ws")) >= 2)
      .select(explode(zip_with(
        slice(col("ws"), lit(1), size(col("ws")) - 1),
        slice(col("ws"), lit(2), size(col("ws")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("pr"))
      .select(col("pr.w1"), col("pr.w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= minCount)
    pairs
      .join(uni.select(col("w").as("w1"), col("c").as("c1")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("c2")), "w2")
      .withColumn("dice_bp", expr("(2 * c_xy * 10000) div (c1 + c2)"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("dice_bp").desc, col("w1"), col("w2"))))
      .filter(col("rank") <= k)
      .select(col("rank"), col("w1"), col("w2"), col("c_xy"),
        col("c1"), col("c2"), col("dice_bp"))
  }

  // ----------------------------------------------------------------- query

  def qCorpusFreq(spark: SparkSession, dir: String): DataFrame =
    corpusFreqStats(Tables.load(spark, dir, "documents"))

  def qKeywords(spark: SparkSession, dir: String): DataFrame =
    distinctiveKeywords(Tables.load(spark, dir, "documents"), 3)

  def qCollocations(spark: SparkSession, dir: String): DataFrame =
    collocations(Tables.load(spark, dir, "documents"))

  val qCollocationsSql: String =
    """WITH w AS MATERIALIZED (
      |  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS ws
      |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
      |uni AS MATERIALIZED (
      |  SELECT w, CAST(count(*) AS BIGINT) AS c
      |  FROM (SELECT unnest(ws) AS w FROM w) GROUP BY 1),
      |pr AS (
      |  SELECT unnest(list_zip(ws[1:len(ws)-1], ws[2:len(ws)])) AS pr
      |  FROM w WHERE len(ws) >= 2),
      |pairs AS (
      |  SELECT pr[1] AS w1, pr[2] AS w2, CAST(count(*) AS BIGINT) AS c_xy
      |  FROM pr GROUP BY 1, 2 HAVING count(*) >= 3),
      |s AS (
      |  SELECT pairs.w1, pairs.w2, c_xy, u1.c AS c1, u2.c AS c2,
      |         (2 * c_xy * 10000) // (u1.c + u2.c) AS dice_bp
      |  FROM pairs
      |  JOIN uni u1 ON u1.w = pairs.w1
      |  JOIN uni u2 ON u2.w = pairs.w2)
      |SELECT * FROM (
      |  SELECT row_number() OVER (ORDER BY dice_bp DESC, w1, w2) AS rank,
      |         w1, w2, c_xy, c1, c2, dice_bp
      |  FROM s)
      |WHERE rank <= 100""".stripMargin

  val qKeywordsSql: String =
    """WITH toks AS MATERIALIZED (
      |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
      |  FROM documents),
      |freq AS (SELECT token, count(*) AS freq FROM toks GROUP BY 1),
      |r AS (SELECT t.doc_id, t.token, f.freq,
      |             row_number() OVER (PARTITION BY t.doc_id
      |                                ORDER BY f.freq, t.token) AS rank
      |      FROM toks t JOIN freq f USING (token))
      |SELECT doc_id, rank, token, freq FROM r WHERE rank <= 3""".stripMargin

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

  def qDiversity(spark: SparkSession, dir: String): DataFrame =
    ngramDiversity(Tables.load(spark, dir, "documents"))

  /** DISTINCT is taken over the same 60-bit hash values the kernel
    * emits (not shingle strings), so both engines count the identical
    * domain even in the (negligible) collision case. */
  val qDiversitySql: String = {
    val h = Hashing.md5LongSql("words[i] || ' ' || words[i+1] || ' ' || words[i+2]")
    s"""WITH sh AS MATERIALIZED (
       |  SELECT DISTINCT doc_id, source, $h AS h
       |  FROM (SELECT doc_id, coalesce(source, '') AS source, words,
       |               unnest(generate_series(1, len(words) - 2)) AS i
       |        FROM (SELECT doc_id, source, string_split(text, ' ') AS words
       |              FROM documents WHERE doc_id IS NOT NULL)
       |        WHERE len(words) >= 3))
       |SELECT source, count(DISTINCT doc_id) AS n_docs,
       |       count(*) AS n_shingles,
       |       count(DISTINCT h) AS n_distinct_shingles,
       |       ${Hashing.stableRoundSql(
             "count(DISTINCT h) * 1.0 / count(*)", 4)} AS diversity
       |FROM sh GROUP BY 1""".stripMargin
  }

  // ------------------------------------------------------ corpus report

  /** Per-source corpus datasheet — the summary table a dataset card
    * publishes per source: document count, token mass, mean length,
    * quality pass rate ([[QualityRules]]' Gopher battery), and the
    * dominant language. One corpus pass computes the per-doc verdicts
    * WITH source/lang carried on the row (no corpus-sized metadata
    * join); the two roll-ups (per source, per source×lang) are
    * map-side-combined aggregates with source-sized outputs, joined
    * source-to-source at the end. Pass rate is integer basis points and
    * the mean is a division of two exact BIGINTs through
    * [[Hashing.stableRound]] — bit-stable on both engines. */
  def corpusReport(docs: DataFrame): DataFrame =
    corpusReportFinalize(corpusReportPartial(docs))

  /** The MERGEABLE half of [[corpusReport]]: the (source, lang) roll-up
    * with pure-sum measures — the finest grain every report output
    * needs. Partials from disjoint corpus slices merge by ADDITION
    * (doc counts, token mass, pass counts are all sums; the dominant
    * language and mean re-derive from the merged grain), so an
    * append-only pipeline maintains the datasheet by storing this frame
    * per ingest batch and finalizing over the union — the standing
    * corpus is never rescanned ([[corpusReportFinalize]] touches only
    * source×lang-sized rows). */
  def corpusReportPartial(docs: DataFrame): DataFrame =
    QualityRules.gopherRules(
        docs.filter(col("source").isNotNull), carryCols = Seq("source", "lang"))
      .withColumn("lang", coalesce(col("lang"), lit("?")))
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("n_words")).as("_tok"),
        sum(col("passes")).cast("long").as("_pass"))

  /** Merge + finalize (source, lang) partials into the report: re-sum
    * the grain (slices may repeat a (source, lang) cell), then the
    * window roll-ups. ONE pass over grain-sized rows, no corpus scan —
    * per-source totals are WINDOW sums over the tiny source×lang frame
    * (same partition key as the dominant-language rank — one exchange
    * serves all windows). Splitting totals into a second groupBy would
    * diverge under column pruning into a second scan of the partial
    * source (two non-identical aggregates cannot share an exchange);
    * this shape can't. */
  def corpusReportFinalize(partials: DataFrame): DataFrame = {
    val byLang = partials.groupBy(col("source"), col("lang"))
      .agg(sum(col("n")).cast("long").as("n"),
        sum(col("_tok")).cast("long").as("_tok"),
        sum(col("_pass")).cast("long").as("_pass"))
    val wSrc = org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
    val wTop = org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
      .orderBy(col("n").desc, col("lang"))
    byLang
      .withColumn("n_docs", sum(col("n")).over(wSrc))
      .withColumn("sum_tokens", sum(col("_tok")).over(wSrc))
      .withColumn("n_quality_pass", sum(col("_pass")).over(wSrc))
      .withColumn("_rn", row_number().over(wTop))
      .filter(col("_rn") === 1)
      .select(col("source"), col("lang").as("top_lang"),
        col("n").as("top_lang_docs"), col("n_docs"), col("sum_tokens"),
        col("n_quality_pass"))
      .select(col("source"), col("n_docs"), col("sum_tokens"),
        Hashing.stableRound(
          col("sum_tokens").cast("double") / col("n_docs").cast("double"), 2)
          .as("mean_tokens"),
        col("n_quality_pass"),
        expr("n_quality_pass * 10000 div n_docs").as("pass_bp"),
        col("top_lang"), col("top_lang_docs"))
  }

  def qCorpusReport(spark: SparkSession, dir: String): DataFrame =
    corpusReport(Tables.load(spark, dir, "documents"))

  /** One CTE computes the per-doc verdict with source/lang carried (the
    * [[QualityRules.gopherSql]] algebra inlined), then the two
    * source-sized roll-ups and the dominant-language window. */
  val qCorpusReportSql: String = {
    val stopsList = QualityRules.RequiredStops.map(s => s"'$s'").mkString("[", ", ", "]")
    val symbolPred = QualityRules.SymbolTokens
      .map(s => s"contains(w, '$s')").mkString(" OR ")
    s"""WITH f AS (
       |  SELECT doc_id, source, coalesce(lang, '?') AS lang,
       |         list_filter(string_split(text, ' '), w -> w <> '') AS words
       |  FROM documents
       |  WHERE doc_id IS NOT NULL AND text IS NOT NULL AND source IS NOT NULL),
       |s AS MATERIALIZED (
       |  SELECT doc_id, source, lang,
       |    CAST(len(words) AS BIGINT) AS n_words,
       |    CAST(coalesce(list_sum(list_transform(words, w -> length(w))), 0) AS BIGINT)
       |      AS sum_word_chars,
       |    CAST(len(list_filter(words, w -> regexp_matches(w, '[a-zA-Z]'))) AS BIGINT)
       |      AS n_alpha_words,
       |    CAST(len(list_filter(words, w -> $symbolPred)) AS BIGINT) AS n_symbol_words,
       |    CAST(len(list_filter($stopsList, s -> list_contains(words, s))) AS BIGINT)
       |      AS n_stop_hits
       |  FROM f),
       |v AS MATERIALIZED (
       |  SELECT source, lang,
       |    n_words,
       |    CASE WHEN n_words BETWEEN ${QualityRules.MinWords} AND ${QualityRules.MaxWords}
       |           AND n_words * 3 <= sum_word_chars AND sum_word_chars <= n_words * 10
       |           AND n_alpha_words * 10 >= n_words * 8
       |           AND n_symbol_words * 10 <= n_words
       |           AND n_stop_hits >= 2 THEN 1 ELSE 0 END AS passes
       |  FROM s),
       |a AS (
       |  SELECT source, count(*) AS n_docs,
       |         CAST(sum(n_words) AS BIGINT) AS sum_tokens,
       |         CAST(sum(passes) AS BIGINT) AS n_quality_pass
       |  FROM v GROUP BY source),
       |l AS (
       |  SELECT source, lang, count(*) AS n FROM v GROUP BY source, lang),
       |t AS (
       |  SELECT source, lang AS top_lang, n AS top_lang_docs,
       |         row_number() OVER (PARTITION BY source ORDER BY n DESC, lang) AS rn
       |  FROM l)
       |SELECT a.source, a.n_docs, a.sum_tokens,
       |       floor((CAST(a.sum_tokens AS DOUBLE) / CAST(a.n_docs AS DOUBLE))
       |             * 100.0 + 0.5) / 100.0 AS mean_tokens,
       |       a.n_quality_pass,
       |       (a.n_quality_pass * 10000) // a.n_docs AS pass_bp,
       |       t.top_lang, t.top_lang_docs
       |FROM a JOIN t USING (source) WHERE t.rn = 1""".stripMargin
  }

  /** Append-only maintenance of the datasheet: two disjoint ingest
    * slices produce PARTIAL (source, lang) roll-ups, the partials merge
    * by addition, and the finalize must reproduce the full-corpus
    * report exactly — same oracle as `corpus_report`, so the merge path
    * is hash-pinned against the one-shot path by construction. */
  def qCorpusReportMerged(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    corpusReportFinalize(
      corpusReportPartial(docs.filter(col("doc_id") % 2 === 0))
        .unionByName(corpusReportPartial(docs.filter(col("doc_id") % 2 =!= 0))))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "quality_corpusfreq" -> (qCorpusFreq _),
    "topk_sources" -> (qTopkSources _),
    "keywords_rare" -> (qKeywords _),
    "ngram_collocations" -> (qCollocations _),
    "diversity_ngram" -> (qDiversity _),
    "quality_novelty" -> (qNovelty _),
    "corpus_report" -> (qCorpusReport _),
    "corpus_report_merged" -> (qCorpusReportMerged _))

  val oracleSql: Map[String, String] = Map(
    "quality_corpusfreq" -> qCorpusFreqSql,
    "topk_sources" -> qTopkSourcesSql,
    "keywords_rare" -> qKeywordsSql,
    "ngram_collocations" -> qCollocationsSql,
    "diversity_ngram" -> qDiversitySql,
    "quality_novelty" -> qNoveltySql,
    "corpus_report" -> qCorpusReportSql,
    "corpus_report_merged" -> qCorpusReportSql)
}
