package graft.llmops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** DSIR-style importance weights (Xie et al., "Data Selection for
  * Language Models via Importance Resampling", NeurIPS 2023): score every
  * raw document by how much its hashed n-gram profile looks like a TARGET
  * distribution, so the corpus can be resampled toward the target domain.
  *
  * Both bag-of-hashed-ngram models (unigrams + bigrams hashed into
  * [[Buckets]] buckets via the shared 60-bit md5 kernel) are estimated
  * from the data itself — target = the `lang = 'en'` slice here — with
  * add-one smoothing. The paper sums per-feature LOG probability ratios;
  * logs are libm-dependent and not bit-stable cross-engine, so the weight
  * rides the engine's integer micro-unit convention instead: each
  * bucket's smoothed ratio
  * `(ct+1)(Nr+B) · 10^6 div (cr+1)(Nt+B)` is an exact BIGINT (domain
  * bound: (ct+1)·(Nr+B) ≤ 9.2e12, i.e. per-bucket counts to ~10^6 at
  * corpus sizes to ~10^6 tokens per bucket — beyond that the micro scale
  * drops a digit, it never overflows silently into wrong answers at
  * fixture scales), and a document's score is the exact integer sum over
  * its features.
  *
  * Shape at 100 TB: one corpus-sized explode + groupBy(bucket) with
  * map-side combine (B=4096 keys — no skew risk, every partial fits a
  * map), a LEFT join of the two B-row count tables on the driver-adjacent
  * scale, then the corpus-sized scoring pass is a BROADCAST join of the
  * B-row weight table + map-side-combined doc_id sum. Two passes over the
  * tokens, zero corpus-sized shuffles beyond the doc_id agg. */
object Dsir {

  val Buckets = 4096L
  val Micro = 1000000L

  /** (doc_id, n_feats, score_micros): exact integer importance score per
    * document; docs whose text yields no features emit nothing.
    *
    * The documented domain bound ((ct+1)·(Nr+B)·micro within Long range)
    * is ENFORCED, not just documented: the weight table carries a
    * per-bucket guard — overflow-free, via division — that raises a
    * pointed error instead of wrapping into silently wrong scores. The
    * guard costs nothing (B rows, evaluated in the same projection) and
    * `micro` is a parameter so a spec can drive the bound without a
    * 10^12-token corpus. */
  def dsirWeights(docs: DataFrame, targetLang: String = "en",
                  micro: Long = Micro): DataFrame = {
    val base = docs
      .filter(col("doc_id").isNotNull && col("text").isNotNull)
      .select(col("doc_id"), col("lang"),
        filter(split(col("text"), " "), w => w =!= "").as("words"))
    val feats = base.select(col("doc_id"), col("lang"), explode(concat(
      transform(col("words"), w => concat(lit("u:"), w)),
      expr("transform(slice(words, 1, greatest(size(words) - 1, 0)), " +
        "(w, i) -> concat('b:', w, ' ', words[i + 1]))"))).as("feat"))
    val toks = feats
      .select(col("doc_id"), col("lang"),
        pmod(Hashing.md5Long(col("feat")), lit(Buckets)).as("bucket"))
    val raw = toks.groupBy("bucket").agg(count(lit(1)).as("cr"))
    val tgt = toks.filter(col("lang") === targetLang)
      .groupBy("bucket").agg(count(lit(1)).as("ct"))
    val totals = toks.agg(
      count(lit(1)).as("nr"),
      sum(when(col("lang") === targetLang, 1L).otherwise(0L)).as("nt"))
    // safeCap = Long.MaxValue div micro: the largest (ct+1)*(nr+B) whose
    // micro-scaled numerator still fits a Long. Checked as
    // (ct+1) > safeCap div (nr+B) — pure division, cannot itself overflow.
    // The denominator (cr+1)*(nt+B) gets the symmetric check: a bucket with
    // huge raw count but small target count passes the numerator guard yet
    // could wrap the denominator product.
    val safeCap = Long.MaxValue / micro
    val weights = raw.join(tgt, Seq("bucket"), "left")
      .crossJoin(broadcast(totals))
      .select(col("bucket"), expr(
        s"""CASE WHEN coalesce(ct, 0) + 1 > $safeCap div (nr + $Buckets)
           |THEN raise_error(concat('DSIR integer-ratio overflow: bucket ',
           |  bucket, ' target count ', coalesce(ct, 0),
           |  ' with ', nr, ' corpus features — (ct+1)*(Nr+B)*$micro ',
           |  'exceeds Long range; score per shard or lower the micro scale'))
           |WHEN cr + 1 > ${Long.MaxValue}L div (nt + $Buckets)
           |THEN raise_error(concat('DSIR integer-ratio overflow: bucket ',
           |  bucket, ' raw count ', cr, ' with ', nt, ' target features — ',
           |  '(cr+1)*(Nt+B) exceeds Long range; score per shard'))
           |ELSE ((coalesce(ct, 0) + 1) * (nr + $Buckets) * $micro) div
           |     ((cr + 1) * (nt + $Buckets)) END""".stripMargin).as("w_micros"))
    toks.join(broadcast(weights), "bucket")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feats"), sum("w_micros").as("score_micros"))
  }

  // ------------------------------------------------------ resampling

  /** Base acceptance rate for a NEUTRAL document (w_mean = 1.0 in micro
    * units): 50% — target-like docs accept up to 100%, off-target docs
    * proportionally below. */
  val SampleBasePer1M = 500000L

  /** DSIR importance RESAMPLING — the actual selection step the weights
    * exist for (Xie et al. 2023 §3: sample with probability ∝ importance
    * weight): keep a document iff a salted hash draw lands under
    * `min(1, w_mean · base)`, where w_mean is the document's mean
    * per-feature ratio in micro units (`score_micros div n_feats` —
    * exact integer division, so acceptance thresholds are BIGINTs and
    * the draw `md5("dsir:" ++ id) mod 1e6` is the engine-neutral
    * deterministic coin every sampler in this engine uses; the salt
    * keeps acceptance independent of split/shard/sample decisions).
    *
    * Deliberately PARAMETERIZED by the base rate rather than normalized
    * by a corpus aggregate: a derived normalizer would hand Catalyst a
    * second consumer of the whole scoring pipeline (the duplicate-scan
    * trap), and DSIR's contract only needs proportionality — the base
    * rate is the knob that sets expected volume. Per-row arithmetic on
    * the weights output, zero additional shuffles.
    *
    * Output: kept docs as (doc_id, w_mean_micros, accept_per1m). */
  def dsirResample(docs: DataFrame, targetLang: String = "en",
                   basePer1M: Long = SampleBasePer1M): DataFrame = {
    require(basePer1M > 0 && basePer1M <= 1000000L,
      s"basePer1M must be in (0, 1e6], got $basePer1M")
    val accept = least(lit(1000000L),
      expr(s"(score_micros div n_feats) * $basePer1M div 1000000"))
    val draw = pmod(Hashing.md5Long(
      concat(lit("dsir:"), col("doc_id").cast("string"))), lit(1000000L))
    dsirWeights(docs, targetLang)
      .select(col("doc_id"),
        expr("score_micros div n_feats").as("w_mean_micros"),
        accept.cast("long").as("accept_per1m"), draw.as("_draw"))
      .filter(col("_draw") < col("accept_per1m"))
      .drop("_draw")
  }

  // ------------------------------------------------------------ queries

  def qDsir(spark: SparkSession, dir: String): DataFrame =
    dsirWeights(Tables.load(spark, dir, "documents"))

  val dsirSql: String = {
    val h = Hashing.md5LongSql("feat")
    s"""WITH f AS MATERIALIZED (
       |  SELECT doc_id, lang, list_filter(string_split(text, ' '), w -> w <> '') AS words
       |  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
       |toks AS MATERIALIZED (
       |  SELECT doc_id, lang, $h % $Buckets AS bucket
       |  FROM (SELECT doc_id, lang, 'u:' || unnest(words) AS feat FROM f
       |        UNION ALL
       |        SELECT doc_id, lang, 'b:' || words[i] || ' ' || words[i + 1] AS feat
       |        FROM (SELECT doc_id, lang, words,
       |                unnest(generate_series(1, len(words) - 1)) AS i FROM f))),
       |raw AS MATERIALIZED (
       |  SELECT bucket, CAST(count(*) AS BIGINT) AS cr FROM toks GROUP BY 1),
       |tgt AS MATERIALIZED (
       |  SELECT bucket, CAST(count(*) AS BIGINT) AS ct FROM toks
       |  WHERE lang = 'en' GROUP BY 1),
       |tot AS MATERIALIZED (
       |  SELECT CAST(count(*) AS BIGINT) AS nr,
       |         CAST(count(*) FILTER (WHERE lang = 'en') AS BIGINT) AS nt FROM toks),
       |w AS MATERIALIZED (
       |  SELECT r.bucket,
       |         ((coalesce(t.ct, 0) + 1) * (tot.nr + $Buckets) * $Micro)
       |           // ((r.cr + 1) * (tot.nt + $Buckets)) AS w_micros
       |  FROM raw r LEFT JOIN tgt t ON r.bucket = t.bucket CROSS JOIN tot)
       |SELECT k.doc_id, CAST(count(*) AS BIGINT) AS n_feats,
       |       CAST(sum(w.w_micros) AS BIGINT) AS score_micros
       |FROM toks k JOIN w ON k.bucket = w.bucket
       |GROUP BY k.doc_id""".stripMargin
  }

  def qDsirSample(spark: SparkSession, dir: String): DataFrame =
    dsirResample(Tables.load(spark, dir, "documents"))

  /** The weights oracle nested as a CTE, then the same integer
    * acceptance arithmetic and salted draw. */
  val dsirSampleSql: String = {
    val draw = Hashing.md5LongSql("'dsir:' || CAST(doc_id AS VARCHAR)")
    s"""WITH d AS MATERIALIZED (
       |$dsirSql
       |)
       |SELECT doc_id,
       |       CAST(score_micros // n_feats AS BIGINT) AS w_mean_micros,
       |       CAST(least(1000000, (score_micros // n_feats) * $SampleBasePer1M
       |                           // 1000000) AS BIGINT) AS accept_per1m
       |FROM d
       |WHERE $draw % 1000000 <
       |      least(1000000, (score_micros // n_feats) * $SampleBasePer1M
       |                     // 1000000)""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dsir_weights" -> (qDsir _),
    "sample_dsir" -> (qDsirSample _))

  val oracleSql: Map[String, String] = Map(
    "dsir_weights" -> dsirSql,
    "sample_dsir" -> dsirSampleSql)
}
