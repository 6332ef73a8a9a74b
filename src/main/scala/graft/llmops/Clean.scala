package graft.llmops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import Hashing.md5LongSql

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

  // ------------------------------------------- boilerplate block removal

  /** Token width of a boilerplate block — the "paragraph" unit on this
    * corpus (the fixtures carry no newline/sentence structure, so the
    * repeated-paragraph unit is a fixed non-overlapping token block). */
  val BlockTokens = 4

  /** A block content appearing in at least this many DISTINCT documents
    * is boilerplate (site templates, cookie banners, scraper chrome). */
  val BoilerplateMinDf = 3

  /** Broadcast guard for the drop set: 10M hashes ≈ 80 MB of longs. A
    * bigger drop set means the corpus is mostly boilerplate — fail with
    * the problem named rather than OOM executors (the
    * [[Decontaminate.MaxBenchmarkShingles]] contract). */
  val MaxDropBlocks = 10_000_000L

  /** Non-overlapping `k`-token blocks of `words` (ceil(len/k) of them;
    * the tail block is shorter). `words` is never empty (split of "" is
    * [""]), so every doc has >= 1 block. */
  private def blockStrings(words: Array[String], k: Int): Array[String] = {
    val n = (words.length + k - 1) / k
    Array.tabulate(n) { i =>
      val from = i * k
      val until = math.min(from + k, words.length)
      val sb = new java.lang.StringBuilder()
      var j = from
      while (j < until) {
        if (j > from) sb.append(' ')
        sb.append(words(j))
        j += 1
      }
      sb.toString
    }
  }

  /** Corpus-frequency boilerplate removal — the RefinedWeb/MassiveText
    * "repeated paragraph" cleaner re-expressed on fixed token blocks:
    * any `blockTokens`-token block whose CONTENT appears in >= `minDf`
    * distinct documents is boilerplate and is struck from every document
    * (navigation chrome, cookie banners, license footers — content no
    * model should see hundreds of times). Documents reassemble from
    * their surviving blocks in order.
    *
    * Shape at 100 TB — two passes, corpus never shuffles ROWS:
    *
    *  1. statistics: a narrow kernel emits each doc's DISTINCT block
    *     hashes (distinctness inside the kernel — no corpus-wide
    *     DISTINCT shuffle), then one map-side-combined groupBy(h) counts
    *     document frequency; only 60-bit longs ever shuffle. Blocks with
    *     df >= minDf form the drop set — boilerplate-inventory sized
    *     (bounded by the loud `maxDropBlocks` guard), collected once via
    *     the capped `limit(cap+1)` pattern and broadcast as a sorted
    *     long array.
    *  2. cleaning: a SECOND narrow kernel probes the broadcast set per
    *     block (binary search, no boxing) and reassembles survivors —
    *     zero joins, zero exchanges; output partitioning mirrors input
    *     partitioning, so the cleaning pass runs at scan speed.
    *
    * Output: (doc_id, cleaned, n_blocks, n_dropped). */
  def removeBoilerplateBlocks(docs: DataFrame,
                              blockTokens: Int = BlockTokens,
                              minDf: Int = BoilerplateMinDf,
                              maxDropBlocks: Long = MaxDropBlocks): DataFrame = {
    require(blockTokens >= 1, s"blockTokens must be >= 1, got $blockTokens")
    require(minDf >= 2, s"minDf must be >= 2, got $minDf")
    val spark = docs.sparkSession
    import spark.implicits._
    val typed = docs.filter(col("doc_id").isNotNull)
      .select(col("doc_id").cast("long"),
        coalesce(col("text"), lit("")).as("text"))
      .as[(Long, String)]
    val perDocDistinct = typed.mapPartitions { it =>
      val md = Kernels.newMd5()
      it.flatMap { case (_, text) =>
        val hs = blockStrings(Kernels.splitSpace(text), blockTokens)
          .map(Kernels.md5Long(md, _))
        val seen = new java.util.HashSet[Long](hs.length * 2)
        hs.filter(seen.add(_))
      }
    }.toDF("h")
    val capInt = math.min(maxDropBlocks, Int.MaxValue - 1L).toInt
    val dropRows = perDocDistinct.groupBy(col("h"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf).select(col("h")).as[Long]
      .limit(capInt + 1).collect()
    require(dropRows.length <= capInt,
      s"boilerplate drop set exceeds $capInt blocks — the corpus is " +
        "dominated by repeated content; exact-dedup it first or raise minDf")
    java.util.Arrays.sort(dropRows)
    val bc = spark.sparkContext.broadcast(dropRows)
    typed.mapPartitions { it =>
      val md = Kernels.newMd5()
      val drop = bc.value
      it.map { case (id, text) =>
        val blocks = blockStrings(Kernels.splitSpace(text), blockTokens)
        val sb = new java.lang.StringBuilder()
        var kept = 0
        var i = 0
        while (i < blocks.length) {
          if (java.util.Arrays.binarySearch(drop,
              Kernels.md5Long(md, blocks(i))) < 0) {
            if (kept > 0) sb.append(' ')
            sb.append(blocks(i))
            kept += 1
          }
          i += 1
        }
        (id, sb.toString, blocks.length.toLong, (blocks.length - kept).toLong)
      }
    }.toDF("doc_id", "cleaned", "n_blocks", "n_dropped")
  }

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

  def qBoilerplate(spark: SparkSession, dir: String): DataFrame =
    removeBoilerplateBlocks(Tables.load(spark, dir, "documents"))

  /** States the semantics with plain relational algebra: block explode →
    * df by DISTINCT doc count → NOT IN the >= minDf set → ordered
    * string_agg reassembly. The drop decision keys on the same 60-bit
    * hash the kernel probes, so even a (negligible) collision drops
    * identically on both engines. Docs whose every block drops keep a
    * row with cleaned = '' (the LEFT JOIN + coalesce). */
  val qBoilerplateSql: String = {
    val k = BlockTokens
    s"""WITH w AS (
       |  SELECT doc_id, string_split(coalesce(text, ''), ' ') AS words
       |  FROM documents WHERE doc_id IS NOT NULL),
       |b AS MATERIALIZED (
       |  SELECT doc_id, i AS blk,
       |         array_to_string(list_slice(words, (i-1)*$k + 1, i*$k), ' ')
       |           AS block
       |  FROM (SELECT doc_id, words,
       |               unnest(generate_series(
       |                 1, CAST(ceil(len(words) * 1.0 / $k) AS BIGINT))) AS i
       |        FROM w)),
       |hb AS MATERIALIZED (
       |  SELECT doc_id, blk, block, ${md5LongSql("block")} AS h FROM b),
       |f AS (SELECT h, count(DISTINCT doc_id) AS df FROM hb GROUP BY h),
       |kept AS (
       |  SELECT doc_id, blk, block FROM hb
       |  WHERE h NOT IN (SELECT h FROM f WHERE df >= $BoilerplateMinDf)),
       |agg AS (
       |  SELECT doc_id, string_agg(block, ' ' ORDER BY blk) AS cleaned,
       |         count(*) AS n_kept
       |  FROM kept GROUP BY doc_id),
       |tot AS (SELECT doc_id, count(*) AS n_blocks FROM hb GROUP BY doc_id)
       |SELECT t.doc_id, coalesce(a.cleaned, '') AS cleaned,
       |       CAST(t.n_blocks AS BIGINT) AS n_blocks,
       |       CAST(t.n_blocks - coalesce(a.n_kept, 0) AS BIGINT) AS n_dropped
       |FROM tot t LEFT JOIN agg a USING (doc_id)""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_clean" -> (qClean _),
    "clean_token_runs" -> (qTokenRuns _),
    "clean_boilerplate" -> (qBoilerplate _))

  val oracleSql: Map[String, String] = Map(
    "text_clean" -> qCleanSql,
    "clean_token_runs" -> qTokenRunsSql,
    "clean_boilerplate" -> qBoilerplateSql)
}
