package graft.llmops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Count-based bigram language-model fluency scoring — the KenLM-shaped
  * quality signal a pretraining pipeline uses to rank documents by how
  * "model-like" their word transitions are (gibberish, boilerplate and
  * OCR noise score low; fluent prose scores high).
  *
  * The LM is trained ON the corpus being scored (self-perplexity, the
  * usual in-pipeline setup): add-one-smoothed bigram probability
  * `p(w2|w1) = (c(w1,w2) + 1) / (c(w1) + V)` with `c(w1)` the context
  * count (occurrences of w1 as a bigram head) and `V` the unigram
  * vocabulary size.
  *
  * DELIBERATE deviation from textbook perplexity: true perplexity is the
  * geometric mean `exp(-Σ ln p / n)`, but cross-engine `ln()` is not
  * bit-reproducible (the repo rule since
  * [[CorpusStats.distinctiveKeywords]] and [[Rank]]'s raw-odds idf), so
  * the shipped score keeps every per-bigram quantity in EXACT integer
  * micro-units: `p_micros = (1e6 · (c12+1)) div (c1+V)` is an integer
  * division — bit-identical on any engine — and per-doc aggregation is
  * integer sum/min. Docs rank by mean (arithmetic) transition
  * probability and by their single most surprising transition
  * (`min_p_micros`, the exact analog of max per-token surprisal, since
  * min over exact integers needs no log). On a cluster deployment where
  * geometric-mean perplexity is required, flip the one `p_micros`
  * expression to `ln` — the plan shape is unchanged.
  *
  * Shape at 100 TB:
  *  - bigram instances never leave their input partition raw: they
  *    pre-aggregate to per-doc (w1, w2, k) multiplicities (map-side
  *    combined groupBy) before anything joins;
  *  - the model tables `c12`/`c1` are corpus-global aggregates of that
  *    SAME frame — at production scale they are corpus-version constants
  *    (train once per snapshot, reuse across scoring runs); here they
  *    ride one plan for self-containment;
  *  - scoring joins per-doc bigrams to `c12` on (w1, w2) and to `c1` on
  *    (w1) — both sides shuffle on the model key, standard hash joins
  *    with no skew beyond natural Zipf heads, which AQE skew-split
  *    handles; `V` is a 1-row broadcast scalar;
  *  - `1e6 · (c12+1)` stays in the 64-bit domain until corpus bigram
  *    counts approach 9.2e12 — beyond that drop Micro to 1e3.
  *
  * Docs with fewer than two tokens have no transitions and are excluded
  * (no score is defined), as are NULL doc_id/text rows — both mirrored
  * by the oracle's WHERE.
  */
object LangModel {

  /** Probability scale: micro-units per bigram. */
  val Micro = 1000000L

  /** Per-doc bigram instance multiplicities (doc_id, [carry...,] w1, w2,
    * k) plus the derived model tables ride this one tokenization.
    * `carry` columns are doc-level metadata (functionally dependent on
    * doc_id) riding the grouping key — the [[QualityRules.gopherRules]]
    * carryCols pattern, so no corpus-sized metadata join downstream. */
  private def bigramInstances(docs: DataFrame,
                              carry: Seq[String] = Nil): DataFrame =
    docs.filter(col("doc_id").isNotNull && col("text").isNotNull)
      .select(col("doc_id").cast("long") +: carry.map(col) :+
        split(col("text"), " ").as("words"): _*)
      .filter(size(col("words")) >= 2)
      .select(col("doc_id") +: carry.map(col) :+
        explode(expr(
          "transform(slice(words, 1, size(words) - 1), " +
            "(w, i) -> struct(w AS w1, words[i + 1] AS w2))")).as("bg"): _*)
      .select(col("doc_id") +: carry.map(col) :+
        col("bg.w1").as("w1") :+ col("bg.w2").as("w2"): _*)
      .groupBy((("doc_id" +: carry) ++ Seq("w1", "w2")).map(col): _*)
      .agg(count(lit(1)).as("k"))

  /** Trained model: the three corpus-global tables scoring needs. At
    * production scale these are corpus-version CONSTANTS — train once per
    * snapshot ([[trainBigramModel]]), persist ([[saveModel]]), then every
    * scoring run ([[scoreWithModel]]) reads the stored tables instead of
    * re-aggregating the corpus; the training pass never repeats. */
  final case class BigramModel(c12: DataFrame, c1: DataFrame, vocab: DataFrame)

  /** One corpus pass producing the model tables: bigram counts `c12`,
    * context counts `c1`, and the 1-row vocabulary size `v`. */
  def trainBigramModel(docs: DataFrame): BigramModel = {
    val perDoc = bigramInstances(docs)
    val c12 = perDoc.groupBy("w1", "w2")
      .agg(sum("k").cast("long").as("c12"))
    val c1 = perDoc.groupBy("w1")
      .agg(sum("k").cast("long").as("c1"))
    val vocab = docs.filter(col("doc_id").isNotNull && col("text").isNotNull)
      .select(explode(split(col("text"), " ")).as("w"))
      .agg(countDistinct(col("w")).as("v"))
    BigramModel(c12, c1, vocab)
  }

  /** The fixture-corpus bigram model as a STAGED artifact, keyed by
    * (session, corpus dir) — the in-process form of the
    * [[saveModel]]/[[loadModel]] "train once per corpus snapshot"
    * contract: `lm_fluency`, `lm_ppl_buckets` and the streaming
    * `q60_stream_lm_gate` all score against the IDENTICAL model, and
    * each used to re-run the three training aggregates over the corpus
    * (the `lang` column other callers carry does not enter the model —
    * it counts bigrams of `text` only). Same immutable-corpus contract
    * as every staged intermediate ([[Dedup.clearShingleIndexCache]]
    * pattern); [[clearModelCache]] is the invalidation hook. */
  private val modelCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), BigramModel]()

  def cachedBigramModel(s: SparkSession, dir: String): BigramModel =
    modelCache.computeIfAbsent((s, dir), _ => {
      val m0 = trainBigramModel(graft.core.Tables.load(s, dir, "documents"))
      // vocab stages as a DRIVER-LOCAL 1-row relation, not a checkpoint:
      // a checkpointed RDD scan hides the scalar-ness from consumers'
      // plans (the scalar-attach crossJoin would read as an unbounded
      // nested-loop side), while a LocalRelation IS the legitimate
      // scalar-attach form — and the count is one long either way.
      val v = m0.vocab.head().getLong(0)
      import s.implicits._
      BigramModel(m0.c12.localCheckpoint(), m0.c1.localCheckpoint(),
        Seq(v).toDF("v"))
    })

  def clearModelCache(): Unit = modelCache.clear()

  /** Persist the model as warehouse tables `<prefix>_c12/_c1/_v` — the
    * "train once per corpus snapshot" half of the contract. */
  def saveModel(wh: graft.core.Warehouse, dataset: String, prefix: String,
                model: BigramModel): Unit = {
    wh.overwrite(dataset, s"${prefix}_c12", model.c12)
    wh.overwrite(dataset, s"${prefix}_c1", model.c1)
    wh.overwrite(dataset, s"${prefix}_v", model.vocab)
  }

  /** Reload a stored model: scoring plans built from this scan the stored
    * parquet fragments — no aggregate over the training corpus appears. */
  def loadModel(wh: graft.core.Warehouse, dataset: String,
                prefix: String): BigramModel =
    BigramModel(
      wh.read(dataset, s"${prefix}_c12"),
      wh.read(dataset, s"${prefix}_c1"),
      wh.read(dataset, s"${prefix}_v"))

  /** Score `docs` against a (possibly stored) model: per-doc bigrams join
    * the model tables on their keys; `v` is a 1-row broadcast scalar.
    * Bigrams absent from the model are dropped (inner join) — scoring a
    * slice of the training corpus sees full-corpus counts. */
  def scoreWithModel(docs: DataFrame, model: BigramModel,
                     carry: Seq[String] = Nil): DataFrame =
    bigramInstances(docs, carry)
      .join(model.c12, Seq("w1", "w2"))
      .join(model.c1, Seq("w1"))
      .crossJoin(broadcast(model.vocab))
      .withColumn("p_micros", expr(s"(${Micro}L * (c12 + 1)) div (c1 + v)"))
      .groupBy(("doc_id" +: carry).map(col): _*)
      .agg(sum(col("k")).cast("long").as("n_bigrams"),
        sum(col("k") * col("p_micros")).cast("long").as("sum_p_micros"),
        min(col("p_micros")).as("min_p_micros"))
      .withColumn("avg_p_micros", expr("sum_p_micros div n_bigrams"))

  /** (doc_id, n_bigrams, sum_p_micros, min_p_micros, avg_p_micros):
    * exact-integer add-one bigram LM fluency per document, self-trained
    * in one plan (the fixture/oracle form; production trains and persists
    * the model once, then calls [[scoreWithModel]] per run). */
  def bigramFluency(docs: DataFrame): DataFrame =
    scoreWithModel(docs, trainBigramModel(docs))

  // --------------------------------------------- trigram stupid backoff

  /** Backoff multiplier 0.4 as the exact rational 2/5 (applied as
    * `(4·x) div 10` and `(16·x) div 100` — integer, engine-identical). */
  private val BackoffNum = 4
  private val BackoffDen = 10

  /** Per-doc trigram instance multiplicities (doc_id, w1, w2, w3, k). */
  private def trigramInstances(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id").isNotNull && col("text").isNotNull)
      .select(col("doc_id").cast("long"), split(col("text"), " ").as("words"))
      .filter(size(col("words")) >= 3)
      .select(col("doc_id"),
        explode(expr(
          "transform(slice(words, 1, size(words) - 2), " +
            "(w, i) -> struct(w AS w1, words[i + 1] AS w2, words[i + 2] AS w3))"))
          .as("tg"))
      .select(col("doc_id"), col("tg.w1").as("w1"), col("tg.w2").as("w2"),
        col("tg.w3").as("w3"))
      .groupBy("doc_id", "w1", "w2", "w3").agg(count(lit(1)).as("k"))

  /** Trigram stupid-backoff fluency (Brants et al. 2007 §4 — the
    * web-scale LM recipe: unnormalized relative frequencies with a
    * fixed 0.4 backoff, no discounting, trivially distributed):
    * score `train`-corpus statistics against `docs`, per trigram
    *
    *   S(w3|w1w2) = c123/c12        when the trigram was seen,
    *              = 0.4·c23/c2      backing off to the bigram,
    *              = 0.4²·c3/N       backing off to the unigram,
    *              = 0               for vocabulary never seen.
    *
    * All counts derive from ONE train-side trigram-instance frame (the
    * trigram event space: docs with ≥3 tokens), so the model is
    * self-consistent; every ratio is pinned to integer micro-units
    * through `div` (the [[Micro]] discipline — no cross-engine float),
    * and the 0.4 factors are exact rationals. Scoring a slice of the
    * training corpus never backs off; scoring UNSEEN text exercises the
    * chain — the oracle query trains on ⅔ of the fixture and scores
    * the held-out ⅓.
    *
    * Shape at 100 TB: the model tables are corpus-global aggregates of
    * the instance frame (train once per snapshot, persist like
    * [[saveModel]]); scoring is four left hash joins on model keys
    * (Zipf heads handled by AQE skew split) + a 1-row broadcast total.
    * Output: (doc_id, n_trigrams, sum_s_micros, min_s_micros,
    * avg_s_micros, n_backoff). */
  def trigramBackoffScores(docs: DataFrame, train: DataFrame): DataFrame = {
    val inst = trigramInstances(train)
    val c123 = inst.groupBy("w1", "w2", "w3")
      .agg(sum("k").cast("long").as("c123"))
    val c12 = inst.groupBy("w1", "w2").agg(sum("k").cast("long").as("c12x"))
    val c23 = inst.groupBy("w2", "w3").agg(sum("k").cast("long").as("c23"))
    val c2 = inst.groupBy("w2").agg(sum("k").cast("long").as("c2"))
    val c3g = inst.groupBy("w3").agg(sum("k").cast("long").as("c3"))
    val total = inst.agg(sum("k").cast("long").as("n"))
    trigramInstances(docs)
      .join(c123, Seq("w1", "w2", "w3"), "left")
      .join(c12, Seq("w1", "w2"), "left")
      .join(c23, Seq("w2", "w3"), "left")
      .join(c2, Seq("w2"), "left")
      .join(c3g, Seq("w3"), "left")
      .crossJoin(broadcast(total))
      .withColumn("s_micros", expr(
        s"""CASE WHEN c123 IS NOT NULL THEN (${Micro}L * c123) div c12x
           |     WHEN c23 IS NOT NULL
           |       THEN ($BackoffNum * ((${Micro}L * c23) div c2)) div $BackoffDen
           |     WHEN c3 IS NOT NULL
           |       THEN (${BackoffNum * BackoffNum} *
           |             ((${Micro}L * c3) div n)) div ${BackoffDen * BackoffDen}
           |     ELSE 0L END""".stripMargin))
      .withColumn("backoff", when(col("c123").isNull, col("k")).otherwise(0L))
      .groupBy("doc_id")
      .agg(sum(col("k")).cast("long").as("n_trigrams"),
        sum(col("k") * col("s_micros")).cast("long").as("sum_s_micros"),
        min(col("s_micros")).as("min_s_micros"),
        sum(col("backoff")).cast("long").as("n_backoff"))
      .withColumn("avg_s_micros", expr("sum_s_micros div n_trigrams"))
      .select(col("doc_id"), col("n_trigrams"), col("sum_s_micros"),
        col("min_s_micros"), col("avg_s_micros"), col("n_backoff"))
  }

  // --------------------------------------------- perplexity bucketing

  /** Sample gate for the bucket-boundary pass: 1/4 of docs. */
  val BucketSampleMod = 4

  /** CCNet-style head/middle/tail LM buckets (Wenzek et al. 2019 §4.3)
    * — the standard corpus partition by language-model score: per
    * LANGUAGE, split documents into equal-population terciles of the
    * fluency score, so downstream mixing can oversample the fluent
    * "head" and drop or down-weight the "tail" without a global rank.
    * Head = most fluent (highest [[scoreWithModel]] `avg_p_micros`;
    * CCNet's lowest-perplexity third).
    *
    * Shape at 100 TB — no per-language funnel anywhere:
    *  - boundaries come from the DETERMINISTIC hash-sampled exact
    *    histogram ([[graft.operators.Quantiles.sampledGroupQuantiles]]
    *    discipline) over the STAGED score table: the corpus scores
    *    once, the sample gate filters the doc-count-sized scores (a
    *    doc's score depends only on the doc and the full-corpus model,
    *    so sampling scores ≡ scoring the sample — the identity the
    *    oracle gates); rank error is sampling noise O(1/√(n/mod)), far
    *    inside a tercile at any production n;
    *  - the model tables localCheckpoint in this self-contained form
    *    (the [[Dedup.semanticDedup]] cellAssignments pattern) so the
    *    boundary and labeling branches both read the materialized
    *    artifact instead of re-aggregating the corpus; production
    *    persists them via [[saveModel]] and buckets from the stored
    *    score table;
    *  - labels attach via a language-count-sized broadcast join and a
    *    map-side comparison chain — ties at a boundary go to the LOWER
    *    bucket on both engines (exact integer equality).
    *
    * Documents in a language absent from the sample are dropped (no
    * boundary is defined); size sampleMod so that cannot happen. Output:
    * (doc_id, lang, avg_p_micros, ppl_bucket). */
  def perplexityBuckets(docs: DataFrame,
                        sampleMod: Int = BucketSampleMod): DataFrame = {
    val m0 = trainBigramModel(docs)
    perplexityBucketsWithModel(docs,
      BigramModel(m0.c12.localCheckpoint(),
        m0.c1.localCheckpoint(), m0.vocab.localCheckpoint()), sampleMod)
  }

  /** The stored-model form ([[loadModel]] / [[cachedBigramModel]]
    * consumers): bucket `docs` against an already-staged model. */
  def perplexityBucketsWithModel(docs: DataFrame, model: BigramModel,
                                 sampleMod: Int = BucketSampleMod): DataFrame = {
    require(sampleMod >= 1, s"sampleMod must be >= 1, got $sampleMod")
    val prepped = docs.withColumn("lang", coalesce(col("lang"), lit("?")))
    // Score the corpus ONCE and stage the (doc-count-sized) score table;
    // boundaries come from FILTERING the staged scores to the hash
    // sample. Scoring the sample ≡ sampling the scores (a doc's score
    // depends only on the doc and the full-corpus model — the identity
    // the oracle already gates), and through r17 the sample's bigram
    // explode + model joins ran as a second pass over 1/sampleMod of
    // the corpus before the full pass re-scored everything anyway.
    val scored = scoreWithModel(prepped, model, carry = Seq("lang"))
      .localCheckpoint()
    val bounds = graft.operators.Quantiles.groupQuantiles(
      scored.filter(
        pmod(Hashing.md5Long(col("doc_id").cast("string")), lit(sampleMod)) === 0),
      "lang", "avg_p_micros", Seq(("b1", 1, 3), ("b2", 2, 3)))
    scored
      .join(broadcast(bounds), Seq("lang"))
      .select(col("doc_id"), col("lang"), col("avg_p_micros"),
        when(col("avg_p_micros") <= col("b1"), lit("tail"))
          .when(col("avg_p_micros") <= col("b2"), lit("middle"))
          .otherwise(lit("head")).as("ppl_bucket"))
  }

  // ------------------------------------------------------------ queries

  def qLmFluency(spark: SparkSession, dir: String): DataFrame =
    scoreWithModel(Tables.load(spark, dir, "documents"),
      cachedBigramModel(spark, dir))

  /** Same counts/smoothing/integer-division tree as the Spark side;
    * DuckDB lists are 1-based so bigram i spans words[i], words[i+1]
    * over generate_series(1, len-1). `//` and Spark's `div` agree on
    * non-negative integers (both floor/truncate identically there). */
  val qLmFluencySql: String =
    s"""WITH t AS MATERIALIZED (
       |  SELECT doc_id, string_split(text, ' ') AS words FROM documents
       |  WHERE doc_id IS NOT NULL AND text IS NOT NULL
       |    AND len(string_split(text, ' ')) >= 2),
       |bg AS (SELECT doc_id, words[i] AS w1, words[i + 1] AS w2
       |       FROM (SELECT doc_id, words,
       |                    unnest(generate_series(1, len(words) - 1)) AS i
       |             FROM t)),
       |perdoc AS MATERIALIZED (
       |  SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS k
       |  FROM bg GROUP BY doc_id, w1, w2),
       |c12 AS (SELECT w1, w2, CAST(sum(k) AS BIGINT) AS c12
       |        FROM perdoc GROUP BY w1, w2),
       |c1 AS (SELECT w1, CAST(sum(k) AS BIGINT) AS c1
       |       FROM perdoc GROUP BY w1),
       |v AS (SELECT count(DISTINCT w) AS v FROM
       |        (SELECT unnest(string_split(text, ' ')) AS w FROM documents
       |         WHERE doc_id IS NOT NULL AND text IS NOT NULL)),
       |scored AS (
       |  SELECT p.doc_id, p.k, ($Micro * (c.c12 + 1)) // (g.c1 + v.v) AS p_micros
       |  FROM perdoc p
       |  JOIN c12 c ON c.w1 = p.w1 AND c.w2 = p.w2
       |  JOIN c1 g ON g.w1 = p.w1
       |  CROSS JOIN v)
       |SELECT doc_id,
       |       CAST(sum(k) AS BIGINT) AS n_bigrams,
       |       CAST(sum(k * p_micros) AS BIGINT) AS sum_p_micros,
       |       CAST(min(p_micros) AS BIGINT) AS min_p_micros,
       |       CAST(sum(k * p_micros) AS BIGINT) // CAST(sum(k) AS BIGINT)
       |         AS avg_p_micros
       |FROM scored GROUP BY doc_id""".stripMargin

  def qPplBuckets(spark: SparkSession, dir: String): DataFrame =
    perplexityBucketsWithModel(Tables.load(spark, dir, "documents"),
      cachedBigramModel(spark, dir))

  /** The lang-carrying fluency algebra (same counts/smoothing/integer
    * division as [[qLmFluencySql]]) + the hash-gated per-language
    * tercile boundaries (ceil-rank over the sampled exact histogram —
    * the [[graft.operators.Quantiles]] idx formula) + the `<=` label
    * chain. Scoring the SAMPLE equals sampling the scores (a doc's
    * score depends only on the doc and the full-corpus model), so the
    * oracle gates f directly. */
  val qPplBucketsSql: String = {
    val gate = graft.llmops.Hashing.md5LongSql("CAST(doc_id AS VARCHAR)")
    s"""WITH t AS MATERIALIZED (
       |  SELECT doc_id, coalesce(lang, '?') AS lang,
       |         string_split(text, ' ') AS words
       |  FROM documents
       |  WHERE doc_id IS NOT NULL AND text IS NOT NULL
       |    AND len(string_split(text, ' ')) >= 2),
       |bg AS (SELECT doc_id, lang, words[i] AS w1, words[i + 1] AS w2
       |       FROM (SELECT doc_id, lang, words,
       |                    unnest(generate_series(1, len(words) - 1)) AS i
       |             FROM t)),
       |perdoc AS MATERIALIZED (
       |  SELECT doc_id, lang, w1, w2, CAST(count(*) AS BIGINT) AS k
       |  FROM bg GROUP BY 1, 2, 3, 4),
       |c12 AS (SELECT w1, w2, CAST(sum(k) AS BIGINT) AS c12
       |        FROM perdoc GROUP BY 1, 2),
       |c1 AS (SELECT w1, CAST(sum(k) AS BIGINT) AS c1
       |       FROM perdoc GROUP BY 1),
       |v AS (SELECT count(DISTINCT w) AS v FROM
       |        (SELECT unnest(string_split(text, ' ')) AS w FROM documents
       |         WHERE doc_id IS NOT NULL AND text IS NOT NULL)),
       |f AS MATERIALIZED (
       |  SELECT p.doc_id, p.lang,
       |         CAST(sum(p.k * (($Micro * (c.c12 + 1)) // (g.c1 + v.v)))
       |              AS BIGINT) // CAST(sum(p.k) AS BIGINT) AS avg_p_micros
       |  FROM perdoc p
       |  JOIN c12 c ON c.w1 = p.w1 AND c.w2 = p.w2
       |  JOIN c1 g ON g.w1 = p.w1
       |  CROSS JOIN v
       |  GROUP BY 1, 2),
       |samp AS (SELECT lang, avg_p_micros AS sv, count(*) AS c FROM f
       |         WHERE $gate % $BucketSampleMod = 0 GROUP BY 1, 2),
       |w AS (SELECT lang, sv,
       |             sum(c) OVER (PARTITION BY lang ORDER BY sv) AS cum,
       |             sum(c) OVER (PARTITION BY lang) AS n
       |      FROM samp),
       |b AS (SELECT lang,
       |             min(CASE WHEN cum >= (n * 1 + 2) // 3 THEN sv END) AS b1,
       |             min(CASE WHEN cum >= (n * 2 + 2) // 3 THEN sv END) AS b2
       |      FROM w GROUP BY 1)
       |SELECT f.doc_id, f.lang, f.avg_p_micros,
       |       CASE WHEN f.avg_p_micros <= b.b1 THEN 'tail'
       |            WHEN f.avg_p_micros <= b.b2 THEN 'middle'
       |            ELSE 'head' END AS ppl_bucket
       |FROM f JOIN b USING (lang)""".stripMargin
  }

  /** Train on doc_id % 3 ≠ 0, score the held-out third — unseen
    * trigrams/bigrams/vocabulary all occur, so every backoff branch
    * (and the 0-score floor) is exercised and hash-gated. */
  def qTrigramBackoff(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    trigramBackoffScores(docs.filter(col("doc_id") % 3 === 0),
      docs.filter(col("doc_id") % 3 =!= 0))
  }

  val qTrigramBackoffSql: String =
    s"""WITH t AS MATERIALIZED (
       |  SELECT doc_id, string_split(text, ' ') AS words FROM documents
       |  WHERE doc_id IS NOT NULL AND text IS NOT NULL
       |    AND len(string_split(text, ' ')) >= 3),
       |tg AS (SELECT doc_id, words[i] AS w1, words[i + 1] AS w2,
       |              words[i + 2] AS w3
       |       FROM (SELECT doc_id, words,
       |                    unnest(generate_series(1, len(words) - 2)) AS i
       |             FROM t)),
       |perdoc AS MATERIALIZED (
       |  SELECT doc_id, w1, w2, w3, CAST(count(*) AS BIGINT) AS k
       |  FROM tg GROUP BY 1, 2, 3, 4),
       |tr AS MATERIALIZED (SELECT * FROM perdoc WHERE doc_id % 3 <> 0),
       |sc AS MATERIALIZED (SELECT * FROM perdoc WHERE doc_id % 3 = 0),
       |c123 AS (SELECT w1, w2, w3, CAST(sum(k) AS BIGINT) AS c123
       |         FROM tr GROUP BY 1, 2, 3),
       |c12 AS (SELECT w1, w2, CAST(sum(k) AS BIGINT) AS c12x
       |        FROM tr GROUP BY 1, 2),
       |c23 AS (SELECT w2, w3, CAST(sum(k) AS BIGINT) AS c23
       |        FROM tr GROUP BY 1, 2),
       |c2 AS (SELECT w2, CAST(sum(k) AS BIGINT) AS c2 FROM tr GROUP BY 1),
       |c3g AS (SELECT w3, CAST(sum(k) AS BIGINT) AS c3 FROM tr GROUP BY 1),
       |tot AS (SELECT CAST(sum(k) AS BIGINT) AS n FROM tr),
       |s AS (
       |  SELECT sc.doc_id, sc.k,
       |         CASE WHEN a.c123 IS NOT NULL THEN ($Micro * a.c123) // b.c12x
       |              WHEN d.c23 IS NOT NULL
       |                THEN ($BackoffNum * (($Micro * d.c23) // e.c2)) // $BackoffDen
       |              WHEN f.c3 IS NOT NULL
       |                THEN (${BackoffNum * BackoffNum} *
       |                      (($Micro * f.c3) // tot.n))
       |                     // ${BackoffDen * BackoffDen}
       |              ELSE 0 END AS s_micros,
       |         CASE WHEN a.c123 IS NULL THEN sc.k ELSE 0 END AS backoff
       |  FROM sc
       |  LEFT JOIN c123 a ON a.w1 = sc.w1 AND a.w2 = sc.w2 AND a.w3 = sc.w3
       |  LEFT JOIN c12 b ON b.w1 = sc.w1 AND b.w2 = sc.w2
       |  LEFT JOIN c23 d ON d.w2 = sc.w2 AND d.w3 = sc.w3
       |  LEFT JOIN c2 e ON e.w2 = sc.w2
       |  LEFT JOIN c3g f ON f.w3 = sc.w3
       |  CROSS JOIN tot)
       |SELECT doc_id,
       |       CAST(sum(k) AS BIGINT) AS n_trigrams,
       |       CAST(sum(k * s_micros) AS BIGINT) AS sum_s_micros,
       |       CAST(min(s_micros) AS BIGINT) AS min_s_micros,
       |       CAST(sum(k * s_micros) AS BIGINT) // CAST(sum(k) AS BIGINT)
       |         AS avg_s_micros,
       |       CAST(sum(backoff) AS BIGINT) AS n_backoff
       |FROM s GROUP BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "lm_fluency" -> (qLmFluency _),
    "lm_ppl_buckets" -> (qPplBuckets _),
    "lm_trigram_backoff" -> (qTrigramBackoff _))

  val oracleSql: Map[String, String] = Map(
    "lm_fluency" -> qLmFluencySql,
    "lm_ppl_buckets" -> qPplBucketsSql,
    "lm_trigram_backoff" -> qTrigramBackoffSql)
}
