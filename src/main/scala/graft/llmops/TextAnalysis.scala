package graft.llmops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language ID (stopword heuristic), and
  * document fingerprinting. All are narrow per-row transforms — no shuffle —
  * run as [[Kernels]] primitive loops inside `mapPartitions` (one
  * MessageDigest/Pattern per partition), so they scale linearly with input
  * splits at 100 TB. The arithmetic reproduces the SQL oracles bit-for-bit
  * (see Kernels' scaladoc for the FP-order and rounding contracts).
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

  /** Shared typed input for the per-doc kernels: NULL doc_id cannot ride
    * the non-nullable Long encoder (executor NPE, not exclusion) and NULL
    * text cannot be tokenized, so both are EXCLUDED — every oracle
    * mirrors with `WHERE doc_id IS NOT NULL AND text IS NOT NULL`
    * ([[DocFilterSql]]). Exception: [[withBpeTokens]] keeps its pinned
    * NULL-text→empty-doc contract and filters only doc_id. */
  val DocFilterSql = "doc_id IS NOT NULL AND text IS NOT NULL"

  private def typedDocs(docs: DataFrame)
      : org.apache.spark.sql.Dataset[(Long, String)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.filter(col("doc_id").isNotNull && col("text").isNotNull)
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
  }

  /** Token/quality stats per doc. Token model: whitespace words plus a
    * BPE-ish estimate (ceil(chars/4)). Quality rewards lexical diversity
    * and a natural stopword rate, penalizes very short docs; it is rounded
    * with the bit-stable floor(x*1e4+0.5)/1e4 (expressed identically in
    * the oracle) because the weighted sum lands exactly on 4-decimal half
    * boundaries where HALF_UP roundings of the double disagree across
    * engines. */
  def withTextStats(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val en: Set[String] = stopwords.head._2.toSet
    typedDocs(docs)
      .mapPartitions { it =>
        val alnum = java.util.regex.Pattern.compile("[a-z0-9]+")
        it.map { case (id, text) =>
          val words = Kernels.splitSpace(text)
          val n = words.length
          val uniq = new java.util.HashSet[String](n * 2)
          var lenSum = 0.0 // left-to-right double fold, as aggregate() does
          var nStop = 0
          var i = 0
          while (i < n) {
            val w = words(i)
            uniq.add(w)
            lenSum += w.length
            if (en.contains(w)) nStop += 1
            i += 1
          }
          val m = alnum.matcher(text)
          var nAlnum = 0
          while (m.find()) nAlnum += 1
          val rawStop = nStop.toDouble / n
          val rawUniq = uniq.size.toDouble / n
          val quality = Kernels.floorRound4(
            math.min(1.0, n.toDouble / 100.0) * 0.4 + rawUniq * 0.3 +
              math.min(1.0, rawStop * 5.0) * 0.3)
          (id, n, uniq.size, nAlnum, math.ceil(text.length / 4.0).toLong,
            Kernels.round4(lenSum / n), Kernels.round4(rawStop), quality)
        }
      }.toDF("doc_id", "n_tokens", "n_uniq_tokens", "n_alnum_tokens",
        "bpe_est", "avg_word_len", "stopword_ratio", "quality")
  }

  /** Combined gating kernel: (doc_id, text, quality, pred_lang) in ONE
    * narrow pass. The curation pipeline needs exactly these two signals;
    * running [[withTextStats]] + [[withLangId]] separately tokenizes
    * every document twice, computes stats the gate discards (alnum regex
    * scan, BPE estimate), and forces a corpus-sized join to reunite the
    * outputs. Tokenization happens once, the English stopword count is
    * the langid hit counter's first slot, and the original row rides
    * along — so gating is join-free. Identical arithmetic to the full
    * kernels: quality and pred_lang are bit-identical to the oracles'. */
  def withQualityLang(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val langs: Array[(String, Set[String])] =
      stopwords.map { case (l, ws) => (l, ws.toSet) }.toArray
    typedDocs(docs)
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val words = Kernels.splitSpace(text)
          val n = words.length
          val uniq = new java.util.HashSet[String](n * 2)
          val hits = new Array[Int](langs.length)
          var i = 0
          while (i < n) {
            val w = words(i)
            uniq.add(w)
            var j = 0
            while (j < langs.length) {
              if (langs(j)._2.contains(w)) hits(j) += 1
              j += 1
            }
            i += 1
          }
          // stopwords.head is "en": hits(0) IS the English stopword count
          val rawStop = hits(0).toDouble / n
          val quality = Kernels.floorRound4(
            math.min(1.0, n.toDouble / 100.0) * 0.4 +
              (uniq.size.toDouble / n) * 0.3 +
              math.min(1.0, rawStop * 5.0) * 0.3)
          var best = 0
          var j = 0
          while (j < hits.length) { if (hits(j) > best) best = hits(j); j += 1 }
          var pred = "und"
          if (best > 0) {
            var k = 0
            var found = false
            while (k < hits.length && !found) {
              if (hits(k) == best) { pred = langs(k)._1; found = true }
              k += 1
            }
          }
          (id, text, quality, pred)
        }
      }.toDF("doc_id", "text", "quality", "pred_lang")
  }

  /** Language-ID by stopword-hit argmax with deterministic tiebreak
    * (hit counts compared in declaration order; 'und' when no hits). */
  def withLangId(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val langs: Array[(String, Set[String])] =
      stopwords.map { case (l, ws) => (l, ws.toSet) }.toArray
    typedDocs(docs)
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val words = Kernels.splitSpace(text)
          val hits = new Array[Int](langs.length)
          var i = 0
          while (i < words.length) {
            var j = 0
            while (j < langs.length) {
              if (langs(j)._2.contains(words(i))) hits(j) += 1
              j += 1
            }
            i += 1
          }
          var best = 0
          var j = 0
          while (j < hits.length) { if (hits(j) > best) best = hits(j); j += 1 }
          // First declared language wins ties.
          var pred = "und"
          if (best > 0) {
            var k = 0
            var found = false
            while (k < hits.length && !found) {
              if (hits(k) == best) { pred = langs(k)._1; found = true }
              k += 1
            }
          }
          (id, pred, best)
        }
      }.toDF("doc_id", "pred_lang", "lang_score")
  }

  /** Repetition signals — the Gopher/MassiveText-style quality filters
    * that catch boilerplate and degenerate generations, which the
    * diversity term in [[withTextStats]]' quality score only partially
    * covers:
    *
    *  - `dup_word_frac`: fraction of word occurrences that repeat an
    *    earlier word (1 − distinct/total);
    *  - `dup_3gram_frac`: same over word 3-grams (0 when < 3 tokens);
    *  - `top_2gram_share`: the most frequent 2-gram's share of all
    *    2-gram occurrences (0 when < 2 tokens) — only the winner's COUNT
    *    matters, so ties need no ordering contract.
    *
    * One narrow kernel pass (no shuffle, no joins); all three fractions
    * round through the bit-stable floor(x·1e4+0.5)/1e4 shared with the
    * oracle. */
  def withRepetition(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    typedDocs(docs)
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val words = Kernels.splitSpace(text)
          val n = words.length
          val uniq = new java.util.HashSet[String](n * 2)
          var i = 0
          while (i < n) { uniq.add(words(i)); i += 1 }
          val dupWord = Kernels.floorRound4(1.0 - uniq.size.toDouble / n)
          val tri = new java.util.HashSet[String](math.max(n - 2, 1) * 2)
          i = 0
          while (i < n - 2) {
            tri.add(words(i) + " " + words(i + 1) + " " + words(i + 2)); i += 1
          }
          val dup3 = if (n < 3) 0.0
            else Kernels.floorRound4(1.0 - tri.size.toDouble / (n - 2))
          val big = new java.util.HashMap[String, Int](math.max(n - 1, 1) * 2)
          var mx = 0
          i = 0
          while (i < n - 1) {
            val g = words(i) + " " + words(i + 1)
            val c = big.merge(g, 1, Integer.sum)
            if (c > mx) mx = c
            i += 1
          }
          val topShare = if (n < 2) 0.0
            else Kernels.floorRound4(mx.toDouble / (n - 1))
          (id, n, dupWord, dup3, topShare)
        }
      }.toDF("doc_id", "n_tokens", "dup_word_frac", "dup_3gram_frac", "top_2gram_share")
  }

  /** Fingerprints: md5 of normalized text (exact), and a winnowing-style
    * min-hash over character 8-grams (rolling robust fingerprint). */
  def withFingerprints(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    typedDocs(docs)
      .mapPartitions { it =>
        val md = Kernels.newMd5()
        it.map { case (id, text) =>
          val norm = Kernels.normalizeWs(text)
          (id, Kernels.md5Hex(md, norm), Kernels.winnowFingerprint(md, norm))
        }
      }.toDF("doc_id", "fp_md5", "fp_winnow")
  }

  /** BPE-ish pre-tokenizer pattern (the GPT-2-family shape, ASCII
    * subset): an optional leading space glued to a letter run, digit
    * run, or symbol run; bare space runs are their own token. Alternation
    * is leftmost-first in BOTH Java regex and RE2 and every class is
    * plain ASCII, so Spark and DuckDB count identical matches — the same
    * engine-intersection discipline as Redact's patterns. */
  val BpePattern = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+| +"

  /** Pre-tokenizer counting — the real token-budget estimate whitespace
    * counts understate (punctuation, digit runs, and glued-space pieces
    * all become separate BPE pieces). One narrow kernel pass, pattern
    * compiled once per partition; no shuffle. `bpe_per_word` is the
    * corpus's token-inflation factor, the number that converts word
    * budgets into context-window budgets. */
  def withBpeTokens(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // NULL text pins to the empty doc (0 pieces / 1 empty ws token) —
    // same contract as Clean/Pack/Shard, mirrored by the oracle coalesce.
    // NULL doc_id is FILTERED (not encoded): the non-nullable Long
    // encoder would NPE executor-side instead of excluding the row
    docs.filter(col("doc_id").isNotNull)
      .select(col("doc_id").cast("long"),
        coalesce(col("text"), lit("")).as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val p = java.util.regex.Pattern.compile(BpePattern)
        it.map { case (id, text) =>
          val m = p.matcher(text)
          var nBpe = 0L
          while (m.find()) nBpe += 1
          val nWs = Kernels.splitSpace(text).length.toLong
          (id, nBpe, nWs, Kernels.floorRound4(nBpe.toDouble / nWs))
        }
      }.toDF("doc_id", "n_bpe_tokens", "n_ws_tokens", "bpe_per_word")
  }

  // ----------------------------------------------------------------- queries

  def qTextStats(spark: SparkSession, dir: String): DataFrame =
    withTextStats(Tables.load(spark, dir, "documents"))

  val qTextStatsSql: String = {
    val en = inList(stopwords.head._2)
    s"""WITH t AS (
       |  SELECT doc_id, text, string_split(text, ' ') AS words FROM documents
       |  WHERE $DocFilterSql
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

  val qLangIdSql: String = {
    val hitCols = stopwords.map { case (l, ws) =>
      s"len(list_filter(words, w -> w IN ${inList(ws)})) AS hits_$l"
    }.mkString(",\n         ")
    val best = stopwords.map(l => s"hits_${l._1}")
      .reduceRight((a, b) => s"greatest($a, $b)")
    val pred = stopwords.map(_._1).reverse.foldLeft("'und'") { (acc, l) =>
      s"CASE WHEN hits_$l = best AND best > 0 THEN '$l' ELSE $acc END"
    }
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents
       |           WHERE $DocFilterSql),
       |h AS (SELECT doc_id,
       |         $hitCols
       |      FROM t),
       |b AS (SELECT *, $best AS best FROM h)
       |SELECT doc_id, $pred AS pred_lang, best AS lang_score FROM b""".stripMargin
  }

  def qRepetition(spark: SparkSession, dir: String): DataFrame =
    withRepetition(Tables.load(spark, dir, "documents"))

  val qRepetitionSql: String =
    s"""WITH w AS MATERIALIZED (SELECT doc_id, string_split(text, ' ') AS words
       |                        FROM documents WHERE $DocFilterSql),
       |base AS (SELECT doc_id, len(words) AS n, len(list_distinct(words)) AS nd FROM w),
       |g3 AS (SELECT doc_id, count(DISTINCT s) AS nd3 FROM (
       |         SELECT doc_id, words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS s
       |         FROM (SELECT doc_id, words, unnest(generate_series(1, len(words) - 2)) AS i
       |               FROM w WHERE len(words) >= 3)) GROUP BY doc_id),
       |g2 AS (SELECT doc_id, max(c) AS mx FROM (
       |         SELECT doc_id, s, count(*) AS c FROM (
       |           SELECT doc_id, words[i] || ' ' || words[i+1] AS s
       |           FROM (SELECT doc_id, words, unnest(generate_series(1, len(words) - 1)) AS i
       |                 FROM w WHERE len(words) >= 2))
       |         GROUP BY doc_id, s) GROUP BY doc_id)
       |SELECT b.doc_id, b.n AS n_tokens,
       |       floor((1 - b.nd * 1.0 / b.n) * 10000.0 + 0.5) / 10000.0 AS dup_word_frac,
       |       CASE WHEN b.n < 3 THEN 0.0
       |            ELSE floor((1 - g3.nd3 * 1.0 / (b.n - 2)) * 10000.0 + 0.5) / 10000.0
       |       END AS dup_3gram_frac,
       |       CASE WHEN b.n < 2 THEN 0.0
       |            ELSE floor((g2.mx * 1.0 / (b.n - 1)) * 10000.0 + 0.5) / 10000.0
       |       END AS top_2gram_share
       |FROM base b LEFT JOIN g3 USING (doc_id) LEFT JOIN g2 USING (doc_id)""".stripMargin

  def qFingerprint(spark: SparkSession, dir: String): DataFrame =
    withFingerprints(Tables.load(spark, dir, "documents"))

  val qFingerprintSql: String =
    s"""WITH n AS (SELECT doc_id, lower(regexp_replace(text, '\\s+', ' ', 'g')) AS norm
       |           FROM documents WHERE $DocFilterSql),
       |g AS (SELECT doc_id, norm, unnest(generate_series(1, greatest(length(norm) - 7, 1))) AS i FROM n)
       |SELECT doc_id, min(md5(norm)) AS fp_md5,
       |       min(${Hashing.md5LongSql("substring(norm, CAST(i AS INT), 8)")}) AS fp_winnow
       |FROM g
       |GROUP BY doc_id""".stripMargin

  def qBpeTokens(spark: SparkSession, dir: String): DataFrame =
    withBpeTokens(Tables.load(spark, dir, "documents"))

  val qBpeTokensSql: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |         len(regexp_extract_all(coalesce(text, ''), '$BpePattern'))
       |           AS n_bpe_tokens,
       |         len(string_split(coalesce(text, ''), ' ')) AS n_ws_tokens
       |  FROM documents WHERE doc_id IS NOT NULL)
       |SELECT doc_id, n_bpe_tokens, n_ws_tokens,
       |       floor((n_bpe_tokens * 1.0 / n_ws_tokens) * 10000.0 + 0.5) / 10000.0
       |         AS bpe_per_word
       |FROM t""".stripMargin

  /** Cohen's kappa between the DECLARED language and the langid
    * prediction — classifier agreement beyond chance (raw accuracy
    * overstates a classifier on a skewed label mix; kappa subtracts the
    * agreement the marginals alone would produce). Pure integers: with
    * contingency cells n(a,b), `κ = (agree·n − Σ_l r_l·c_l) /
    * (n² − Σ_l r_l·c_l)` cross-multiplied by n² — reported in basis
    * points by integer division, so the score hash-gates. Shape: one
    * label-pair rollup (cells are |langs|² rows), marginals and the
    * chance term on that tiny frame, a 1-row output. The same algebra
    * audits any predicted-vs-gold label pair at any scale. */
  def qKappaLangid(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val gold = docs.filter(col("doc_id").isNotNull && col("lang").isNotNull)
      .select(col("doc_id"), col("lang").as("a"))
    val cells = gold
      .join(withLangId(docs).select(col("doc_id"), col("pred_lang").as("b")), "doc_id")
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // feeds totals + both marginals + chance
    val rt = cells.groupBy(col("a")).agg(sum(col("c")).as("r"))
    val ct = cells.groupBy(col("b")).agg(sum(col("c")).as("cc"))
    val chance = rt.join(ct, rt("a") === ct("b"))
      .agg(sum(col("r") * col("cc")).as("chance"))
    cells.agg(sum(col("c")).as("n"),
        sum(when(col("a") === col("b"), col("c")).otherwise(lit(0L))).as("agree"))
      .crossJoin(broadcast(chance))
      .withColumn("chance", coalesce(col("chance"), lit(0L)))
      .withColumn("kappa_bp",
        expr("((agree * n - chance) * 10000) div (n * n - chance)"))
      .select(col("n"), col("agree"), col("kappa_bp"))
  }

  lazy val qKappaLangidSql: String =
    s"""WITH pred AS MATERIALIZED (
       |  SELECT doc_id, pred_lang FROM (${qLangIdSql.replace("\n", "\n  ")})),
       |cells AS MATERIALIZED (
       |  SELECT d.lang AS a, p.pred_lang AS b, CAST(count(*) AS BIGINT) AS c
       |  FROM documents d JOIN pred p USING (doc_id)
       |  WHERE d.doc_id IS NOT NULL AND d.lang IS NOT NULL
       |  GROUP BY 1, 2),
       |rt AS (SELECT a, CAST(sum(c) AS BIGINT) AS r FROM cells GROUP BY 1),
       |ct AS (SELECT b, CAST(sum(c) AS BIGINT) AS cc FROM cells GROUP BY 1),
       |ch AS (SELECT CAST(coalesce(sum(r * cc), 0) AS BIGINT) AS chance
       |       FROM rt JOIN ct ON ct.b = rt.a),
       |t AS (SELECT CAST(sum(c) AS BIGINT) AS n,
       |             CAST(sum(CASE WHEN a = b THEN c ELSE 0 END) AS BIGINT) AS agree
       |      FROM cells)
       |SELECT n, agree,
       |       ((agree * n - chance) * 10000) // (n * n - chance) AS kappa_bp
       |FROM t CROSS JOIN ch""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "eval_kappa_langid" -> (qKappaLangid _),
    "text_stats" -> (qTextStats _),
    "text_langid" -> (qLangId _),
    "text_repetition" -> (qRepetition _),
    "text_fingerprint" -> (qFingerprint _),
    "token_count_bpe" -> (qBpeTokens _))

  val oracleSql: Map[String, String] = Map(
    "eval_kappa_langid" -> qKappaLangidSql,
    "text_stats" -> qTextStatsSql,
    "text_langid" -> qLangIdSql,
    "text_repetition" -> qRepetitionSql,
    "text_fingerprint" -> qFingerprintSql,
    "token_count_bpe" -> qBpeTokensSql)
}
