package graft.llmops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Weighted mixture sampling — composing a training corpus from sources
  * at prescribed rates ("web at 25%, books at 100%, …"). The downsample
  * decision is a deterministic hash threshold, NOT an RNG draw:
  * `md5(source:doc_id) mod 10000 < threshold(source)` keeps exactly the
  * same rows on every run, on any partitioning, on either engine — which
  * is what makes the op oracle-checkable and re-runs reproducible.
  *
  * Shape at 100 TB: the rates table is per-source (tiny, broadcast); the
  * decision is a narrow codegen'd filter. No shuffle anywhere — the plan
  * is scan → broadcast-join → filter, and output partitioning mirrors
  * input partitioning. Thresholds are integers out of 10000 (basis
  * points) so no floating-point rate ever rounds differently across
  * engines.
  */
object Mix {

  /** The query's mixture: rates cycle 25/50/75/100% across the fixture's
    * 20 sources — every rate bucket is exercised, including the
    * keep-everything edge (threshold 10000). */
  val MixThresholds: Seq[(String, Int)] =
    (0 until 20).map(i => (s"src$i", 2500 * (i % 4 + 1)))

  /** Keep rows of `df` whose `(sourceCol, idCol)` hash lands under the
    * source's basis-point threshold. Sources absent from `thresholds`
    * are dropped (inner join) — an explicit mixture is a whitelist. */
  def weightedMix(df: DataFrame, thresholds: Seq[(String, Int)],
                  sourceCol: String = "source",
                  idCol: String = "doc_id"): DataFrame = {
    require(thresholds.nonEmpty, "weightedMix needs at least one source rate")
    require(thresholds.forall { case (_, t) => t >= 0 && t <= 10000 },
      "thresholds are basis points in [0, 10000]")
    val spark = df.sparkSession
    import spark.implicits._
    val rates = thresholds.toDF(sourceCol, "_thresh")
    val h = Hashing.md5Long(
      concat(col(sourceCol), lit(":"), col(idCol).cast("string")))
    df.join(broadcast(rates), Seq(sourceCol))
      .filter(h % 10000 < col("_thresh"))
      .drop("_thresh")
  }

  /** Quota sampling — "cap every source at N documents": keep the N
    * smallest-hash rows per stratum (deterministic, stable under
    * appends of larger-hash rows, engine-neutral).
    *
    * The naive plan — `row_number()` per stratum over ALL rows — sorts
    * every stratum's full data in one task. This is the two-phase
    * rejection shape instead:
    *
    *  1. per-stratum counts (one map-side-combined agg, stratum-sized,
    *     broadcast back);
    *  2. NARROW prefilter `h ≤ (n + slack)/count · 2^60` — keeps an
    *     expected n + slack rows per stratum (slack = 4·√n + 16 puts
    *     the Chernoff miss probability in the noise), discarding the
    *     overwhelming mass map-side;
    *  3. exact `row_number() ≤ n` over the survivors only — the
    *     per-stratum window now sees ~n rows, not the corpus; an
    *     IN-PLAN `raise_error` guard (a count window riding the same
    *     shuffle as the rank window — no extra scan, no extra job)
    *     fails the query loudly if the prefilter undercut a stratum
    *     that still has survivors.
    *
    * Rows with a NULL stratum or id are excluded up front (they cannot
    * hash; leaving them in would silently vanish via the NULL-propagating
    * prefilter while inflating the stratum counts). The one failure the
    * in-plan guard cannot see is a stratum whose rows are ALL rejected —
    * with non-null keys that requires every hash above the threshold,
    * probability ≤ e^−(n+slack) ≤ e^−21: below any practical concern,
    * and stated here rather than silently assumed.
    *
    * The final selection is exactly "N smallest hashes per stratum"
    * regardless of the prefilter, which is what the oracle states. */
  def capPerStratum(df: DataFrame, stratumCol: String, idCol: String,
                    n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    import org.apache.spark.sql.expressions.Window
    val nonNull = df.filter(col(stratumCol).isNotNull && col(idCol).isNotNull)
    val counts = nonNull.groupBy(col(stratumCol)).agg(count(lit(1)).as("_cnt"))
    val h = Hashing.md5Long(
      concat(col(stratumCol), lit(":"), col(idCol).cast("string")))
    val slack = 4.0 * math.sqrt(n.toDouble) + 16.0
    val frac = least(lit(1.0), lit(n + slack) / col("_cnt"))
    val surv = nonNull.withColumn("_h", h)
      .join(broadcast(counts), Seq(stratumCol))
      .filter(col("_h").cast("double") <= frac * lit(TwoPow60))
    val w = Window.partitionBy(stratumCol).orderBy(col("_h"), col(idCol))
    val wAll = Window.partitionBy(stratumCol)
    surv
      .withColumn("_sc", count(lit(1)).over(wAll))
      .filter(when(col("_sc") < least(lit(n.toLong), col("_cnt")),
        raise_error(concat(lit("capPerStratum: prefilter undercut stratum '"),
          col(stratumCol).cast("string"), lit("'; raise the slack margin")))
          .cast("boolean"))
        .otherwise(lit(true)))
      .withColumn("_rank", row_number().over(w))
      .filter(col("_rank") <= n)
      .drop("_h", "_cnt", "_sc", "_rank")
  }

  private val TwoPow60 = 1152921504606846976.0 // 2^60: hash domain

  // -------------------------------------------------------- split assign

  /** Salt for split assignment — independent of every other hash decision
    * in the pipeline (sampling, sharding), so membership in a split never
    * correlates with membership in a sample. */
  val SplitSalt = "split"

  /** Stable train/val/test assignment: `md5(salt:doc_id) mod 100` cut at
    * trainPct / trainPct+valPct. Hash-derived, so every engine, run, and
    * subset assigns each document identically, and appending documents
    * never reassigns an existing one — the property that keeps eval sets
    * uncontaminated across corpus versions. Narrow projection, no
    * shuffle. */
  def withSplit(df: DataFrame, idCol: String = "doc_id",
                trainPct: Int = 90, valPct: Int = 5): DataFrame = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"split percentages must satisfy 0 <= train+val <= 100, " +
        s"got $trainPct+$valPct")
    val b = pmod(Hashing.md5Long(
      concat(lit(SplitSalt + ":"), col(idCol).cast("string"))), lit(100L))
    df.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Leakage-FREE split: [[withSplit]] hashes the document id, so two
    * NEAR-DUPLICATE documents can land on opposite sides of the cut —
    * the eval set then contains near-copies of training documents and
    * benchmark numbers inflate silently (the within-corpus form of the
    * contamination [[Decontaminate]] guards against externally).
    * Assigning by the dedup CLUSTER id instead puts every member of a
    * near-dup cluster on the SAME side by construction, keeping all the
    * [[withSplit]] stability properties (the cluster minimum is itself
    * append-stable while the cluster does not merge; a merge moves the
    * whole cluster together — never one member alone).
    *
    * Output: (doc_id, cluster_id, split). Cost over [[withSplit]] is
    * exactly the clustering ([[Dedup.duplicateClusters]] star rounds);
    * pipelines that already cluster for dedup reuse that artifact. */
  def leakFreeSplit(docs: DataFrame, pairs: DataFrame,
                    trainPct: Int = 90, valPct: Int = 5): DataFrame =
    withSplit(Dedup.duplicateClusters(docs, pairs),
      idCol = "cluster_id", trainPct = trainPct, valPct = valPct)

  // ------------------------------------------------------- epoch shuffle

  /** Deterministic per-epoch training shuffle: every document gets a
    * (shard, pos) address for the epoch — shard by hash, position by
    * hash order within the shard — so a distributed data loader reads
    * shard files independently and still sees a corpus-wide pseudorandom
    * permutation that is DIFFERENT each epoch (the epoch salts the hash)
    * yet identical on every rerun, engine, and worker count.
    *
    * Shape: the hash + shard assignment is a narrow projection; the only
    * shuffle is the per-shard `row_number()` window. Each window
    * partition holds ~corpus/nShards rows, so size `nShards` to the
    * target file size (100 TB / 256 MiB-ish shards), never to the
    * cluster — more shards = smaller, MORE parallel windows. */
  def epochShuffle(df: DataFrame, epoch: Int, nShards: Int,
                   idCol: String = "doc_id"): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    import org.apache.spark.sql.expressions.Window
    val h = Hashing.md5Long(
      concat(lit(s"epoch$epoch:"), col(idCol).cast("string")))
    val w = Window.partitionBy(col("shard")).orderBy(col("_h"), col(idCol))
    df.select(col(idCol), h.as("_h"))
      .withColumn("shard", (col("_h") % nShards).cast("int"))
      .withColumn("pos", row_number().over(w))
      .drop("_h")
  }

  // ----------------------------------------------------------------- query

  def qMix(spark: SparkSession, dir: String): DataFrame =
    weightedMix(Tables.load(spark, dir, "documents"), MixThresholds)
      .select(col("doc_id"), col("source"))

  val qMixSql: String = {
    val values = MixThresholds
      .map { case (s, t) => s"('$s', $t)" }.mkString(", ")
    s"""WITH rates(source, thresh) AS (VALUES $values)
       |SELECT d.doc_id, d.source
       |FROM documents d JOIN rates r USING (source)
       |WHERE ${Hashing.md5LongSql("d.source || ':' || d.doc_id")} % 10000
       |      < r.thresh""".stripMargin
  }

  def qCapped(spark: SparkSession, dir: String): DataFrame =
    capPerStratum(Tables.load(spark, dir, "documents"), "source", "doc_id", 15)
      .select(col("doc_id"), col("source"))

  /** The oracle states the SEMANTICS — N smallest hashes per stratum —
    * with one plain window; the two-phase prefilter must reproduce it
    * exactly. */
  val qCappedSql: String = {
    val h = Hashing.md5LongSql("source || ':' || doc_id")
    s"""SELECT doc_id, source FROM (
       |  SELECT doc_id, source,
       |         row_number() OVER (PARTITION BY source
       |                            ORDER BY $h, doc_id) AS rn
       |  FROM documents)
       |WHERE rn <= 15""".stripMargin
  }

  def qSplit(spark: SparkSession, dir: String): DataFrame =
    withSplit(Tables.load(spark, dir, "documents"))
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))

  val qSplitSql: String = {
    val h = Hashing.md5LongSql(s"'$SplitSalt:' || doc_id")
    s"""WITH s AS (
       |  SELECT source, n_chars,
       |         CASE WHEN $h % 100 < 90 THEN 'train'
       |              WHEN $h % 100 < 95 THEN 'val'
       |              ELSE 'test' END AS split
       |  FROM documents)
       |SELECT source, split, count(*) AS n_docs,
       |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
       |FROM s GROUP BY 1, 2""".stripMargin
  }

  def qLeakFreeSplit(spark: SparkSession, dir: String): DataFrame =
    // consume the STAGED cluster assignment ([[Dedup.cachedSimhashClusters]])
    // instead of re-running the pair build + star loop — the split is a
    // narrow hash projection over the cluster table (r18 opt)
    withSplit(Dedup.cachedSimhashClusters(spark, dir), idCol = "cluster_id")

  /** The dedup_clusters recursive CTE + the [[withSplit]] cut keyed on
    * cluster_id — same salt, same mod-100 thresholds. */
  val qLeakFreeSplitSql: String = {
    val h = Hashing.md5LongSql(s"'$SplitSalt:' || CAST(cluster_id AS VARCHAR)")
    s"""${Dedup.clustersCtes(Dedup.HammingMax)},
       |cl AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id)
       |SELECT doc_id, cluster_id,
       |       CASE WHEN $h % 100 < 90 THEN 'train'
       |            WHEN $h % 100 < 95 THEN 'val'
       |            ELSE 'test' END AS split
       |FROM cl""".stripMargin
  }

  def qEpochShuffle(spark: SparkSession, dir: String): DataFrame =
    epochShuffle(Tables.load(spark, dir, "documents"), epoch = 1,
      nShards = 16)

  /** `% 16` stays in BIGINT on both engines (the 60-bit hash is always
    * non-negative, so no pmod dance is needed). */
  val qEpochShuffleSql: String = {
    val h = Hashing.md5LongSql("'epoch1:' || doc_id")
    s"""WITH s AS (SELECT doc_id, $h AS h, $h % 16 AS shard
       |           FROM documents)
       |SELECT doc_id, shard,
       |       row_number() OVER (PARTITION BY shard ORDER BY h, doc_id)
       |         AS pos
       |FROM s""".stripMargin
  }

  // ------------------------------------------------- token-budget sample

  /** Hash-order bucket width for [[tokenBudgetSample]]'s prefix sum: the
    * 60-bit hash space splits into 2^8 buckets, so phase-1 window tasks
    * are bounded by a bucket, never by a hot source. */
  /** Id-domain audit (r13): every `_h div 2^52` bucket split in this
    * file operates on [[Hashing.md5Long]] values, which are 60-bit
    * NON-NEGATIVE by construction (15 hex chars of the digest) — the
    * quotient is always in [0, 255] and the packing needs no runtime
    * guard, unlike user-supplied ids (see operators/Triangles, which
    * checks its domain because callers pass arbitrary longs). */
  private val BudgetBucketShift = 52

  /** Sample each source down to a TOKEN budget — mixtures are specified
    * in tokens, not document counts ("web: 50B tokens, books: all"), and
    * doc-count sampling ([[weightedMix]], [[capPerStratum]]) over- or
    * under-shoots when length distributions differ across sources.
    *
    * A document is kept while its source's cumulative token count BEFORE
    * it is under the budget (greedy prefix in deterministic hash order —
    * a reproducible shuffle, so re-runs and engines agree row-for-row;
    * the straddling doc is taken, so every source with any document gets
    * at least one). The cumulative count is [[graft.operators.PrefixSum
    * .perKeyRunningSum]] — per-(source, hash-bucket) windows stitched by
    * broadcast offsets, so no task ever sorts a whole source (the
    * hot-key funnel a plain per-source window plans as).
    *
    * Output: (doc_id, source, n_tokens, cum_tokens) for kept docs;
    * tokens are whitespace tokens (the [[TextAnalysis]] convention). */
  def tokenBudgetSample(docs: DataFrame, budgets: Map[String, Long],
                        defaultBudget: Long): DataFrame = {
    require(defaultBudget > 0 && budgets.values.forall(_ > 0),
      "token budgets must be positive")
    val base = docs
      .filter(col("doc_id").isNotNull && col("source").isNotNull &&
        col("text").isNotNull)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        Hashing.md5Long(col("doc_id").cast("string")).as("_h"))
      .withColumn("_bucket", expr(s"_h div ${1L << BudgetBucketShift}"))
    // (_h, doc_id) order matches the oracle's ORDER BY h, doc_id exactly:
    // a 60-bit hash collision (expected around the billion-doc scale)
    // must not make the straddling doc nondeterministic
    val cum = graft.operators.PrefixSum.perKeyRunningSum(
      base, "source", "_bucket", Seq("_h", "doc_id"), "n_tokens", "cum_tokens")
    val budget = budgets.foldLeft(lit(defaultBudget)) {
      case (acc, (src, b)) => when(col("source") === src, lit(b)).otherwise(acc)
    }
    cum.filter(col("cum_tokens") - col("n_tokens") < budget)
      .select(col("doc_id"), col("source"), col("n_tokens"), col("cum_tokens"))
  }

  /** The query's budgets: 400 tokens per source (each fixture source
    * holds ~1500, so the cut is real), with one override exercising the
    * per-source map. */
  val BudgetDefault = 400L
  val BudgetOverrides: Map[String, Long] = Map("src0" -> 1200L)

  def qTokenBudget(spark: SparkSession, dir: String): DataFrame =
    tokenBudgetSample(Tables.load(spark, dir, "documents"),
      BudgetOverrides, BudgetDefault)

  /** The oracle states the SEMANTICS — a per-source running token sum in
    * (hash, doc_id) order with a budget cut — as one plain window; the
    * bucketed two-phase sum must reproduce it exactly (integer sums, so
    * no FP-order hazard; CAST keeps DuckDB's window sum in BIGINT). */
  val qTokenBudgetSql: String = {
    val h = Hashing.md5LongSql("CAST(doc_id AS VARCHAR)")
    val overrides = BudgetOverrides
      .map { case (s, b) => s"WHEN source = '$s' THEN $b" }.mkString(" ")
    s"""WITH t AS (
       |  SELECT doc_id, source,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |         $h AS h
       |  FROM documents
       |  WHERE doc_id IS NOT NULL AND source IS NOT NULL AND text IS NOT NULL),
       |c AS (
       |  SELECT doc_id, source, n_tokens,
       |         CAST(sum(n_tokens) OVER (PARTITION BY source
       |           ORDER BY h, doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |         AS BIGINT) AS cum_tokens
       |  FROM t)
       |SELECT doc_id, source, n_tokens, cum_tokens
       |FROM c
       |WHERE cum_tokens - n_tokens <
       |      (CASE $overrides ELSE $BudgetDefault END)""".stripMargin
  }

  // --------------------------------------- temperature-scaled mixture

  /** Micro-unit pin for the per-source temperature weight: weights ride
    * as `floor(sqrt(tokens) · 1000)` BIGINTs so their SUM is integer
    * arithmetic — order-free, hence bit-identical on any partitioning or
    * engine. (A double weight sum would depend on reduction order.) */
  val TemperatureScale = 1000.0

  /** Temperature-scaled source mixing — the PaLM/DoReMi-style rebalance:
    * instead of sampling each source proportionally to its size (α = 1,
    * big sources dominate) or uniformly (α = 0, tiny sources repeat),
    * give source `s` a token budget ∝ (tokens_s)^α with α = 1/2, then
    * take the greedy hash-order prefix under that budget (the
    * [[tokenBudgetSample]] machinery — budgets COMPUTED from corpus
    * statistics instead of prescribed).
    *
    * α is fixed at 1/2 because `sqrt` is the one member of the α family
    * that is a single IEEE-754 correctly-rounded operation on both
    * engines (`pow` carries no such guarantee), which is what lets a
    * statistics-derived budget hash-gate bit-for-bit: weights pin to
    * integer micro-units ([[TemperatureScale]]), the weight sum is a
    * BIGINT sum, and the final `floor(B · w/Σw)` is three correctly-
    * rounded double ops on integers exactly representable below 2^53
    * (Σw < 2^53 holds until ~10^25 corpus tokens).
    *
    * Shape at 100 TB: per-source token totals are one map-side-combined
    * aggregate (source-sized output); the weight sum is an unpartitioned
    * window over that source-sized frame (one consumer chain — see the
    * in-code note on why an agg + crossJoin splits into two corpus
    * scans); budgets join back broadcast; the greedy prefix is the
    * bucketed two-phase running sum — no task ever sorts a whole source,
    * nothing ever collects the corpus.
    *
    * Output: kept docs as (doc_id, source, n_tokens, cum_tokens,
    * budget_tokens). Every source keeps ≥ 1 document (floor can zero a
    * tiny source's budget; `greatest(1, ·)` keeps the straddling-doc
    * guarantee instead). */
  def temperatureTokenSample(docs: DataFrame, totalBudget: Long): DataFrame = {
    require(totalBudget > 0, s"token budget must be positive, got $totalBudget")
    val base = docs
      .filter(col("doc_id").isNotNull && col("source").isNotNull &&
        col("text").isNotNull)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        Hashing.md5Long(col("doc_id").cast("string")).as("_h"))
      .withColumn("_bucket", expr(s"_h div ${1L << BudgetBucketShift}"))
    val weights = base.groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("_t"))
      .select(col("source"),
        floor(sqrt(col("_t").cast("double")) * lit(TemperatureScale))
          .cast("long").as("_w"))
    // Σw as an UNPARTITIONED window over the source-sized weights frame
    // (catalog-sized — the one place a single-partition window is right):
    // an agg + crossJoin would hand Catalyst two non-identical consumers
    // of `weights`, which column pruning diverges into two corpus scans
    // (the corpusReport lesson); one consumer chain cannot split
    val wAll = org.apache.spark.sql.expressions.Window.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val budgets = weights
      .withColumn("_wsum", sum(col("_w")).over(wAll))
      .select(col("source"),
        greatest(lit(1L),
          floor(lit(totalBudget.toDouble) *
            (col("_w").cast("double") / col("_wsum").cast("double")))
            .cast("long")).as("budget_tokens"))
    val cum = graft.operators.PrefixSum.perKeyRunningSum(
      base, "source", "_bucket", Seq("_h", "doc_id"), "n_tokens", "cum_tokens")
    cum.join(broadcast(budgets), Seq("source"))
      .filter(col("cum_tokens") - col("n_tokens") < col("budget_tokens"))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("cum_tokens"), col("budget_tokens"))
  }

  /** The query's total budget: ~8k tokens against the fixture's ~30k at
    * sf0.01 — every source's sqrt-share (~400 tokens of ~1500 held) makes
    * a real cut, and shares measurably differ across sources (token
    * totals spread ~6.3-8.6k chars), so the temperature formula — not
    * just the prefix cut — is what the hash gates. */
  val TemperatureBudget = 8000L

  def qTemperature(spark: SparkSession, dir: String): DataFrame =
    temperatureTokenSample(Tables.load(spark, dir, "documents"), TemperatureBudget)

  /** Oracle: the same integer-pinned weight algebra stated declaratively —
    * sqrt/·1000/floor per source, BIGINT weight sum, three-op double
    * ratio, then the plain per-source running-sum window the bucketed
    * two-phase sum must reproduce exactly. */
  val qTemperatureSql: String = {
    val h = Hashing.md5LongSql("CAST(doc_id AS VARCHAR)")
    s"""WITH t AS MATERIALIZED (
       |  SELECT doc_id, source,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |         $h AS h
       |  FROM documents
       |  WHERE doc_id IS NOT NULL AND source IS NOT NULL AND text IS NOT NULL),
       |w AS (
       |  SELECT source,
       |         CAST(floor(sqrt(CAST(sum(n_tokens) AS DOUBLE)) * $TemperatureScale)
       |           AS BIGINT) AS w
       |  FROM t GROUP BY source),
       |b AS (
       |  SELECT source,
       |         CAST(greatest(1, CAST(floor(CAST($TemperatureBudget AS DOUBLE) *
       |             (CAST(w AS DOUBLE) /
       |              CAST((SELECT sum(w) FROM w) AS DOUBLE))) AS BIGINT))
       |           AS BIGINT) AS budget_tokens
       |  FROM w),
       |c AS (
       |  SELECT doc_id, source, n_tokens,
       |         CAST(sum(n_tokens) OVER (PARTITION BY source
       |           ORDER BY h, doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |         AS BIGINT) AS cum_tokens
       |  FROM t)
       |SELECT c.doc_id, c.source, c.n_tokens, c.cum_tokens, b.budget_tokens
       |FROM c JOIN b USING (source)
       |WHERE c.cum_tokens - c.n_tokens < b.budget_tokens""".stripMargin
  }

  // --------------------------------------------- source interleaving

  /** Deterministic source-interleaved training order — consecutive
    * positions rotate across sources (round-robin), the data order that
    * keeps a mixture locally stable instead of serving long same-source
    * runs (a hash shuffle gives global balance but no local guarantee;
    * sorted-by-source is the worst case). The order is PURE ARITHMETIC
    * on per-source positions:
    *
    *   global_ord = (ord_in_source − 1) · n_sources + source_idx
    *
    * — injective (positions differ within a source by the stride, across
    * sources by the index), and any n_sources consecutive positions hold
    * at most one document per source. No global sort exists anywhere:
    * ord_in_source is the bucketed per-key running count, source_idx
    * comes from a catalog-sized dense index (the one `row_number` window
    * runs over DISTINCT SOURCES — a frame that is tiny at any corpus
    * scale), and both attach by broadcast. When sources are unequal,
    * exhausted sources leave gaps in `global_ord` — it is an ORDER, not
    * a contiguous id space (feed it to [[graft.operators.GlobalRank]]
    * if contiguity is needed).
    *
    * Output: (doc_id, source, ord_in_source, global_ord). */
  def interleaveSources(docs: DataFrame): DataFrame = {
    val base = docs
      .filter(col("doc_id").isNotNull && col("source").isNotNull)
      .select(col("doc_id"), col("source"),
        Hashing.md5Long(col("doc_id").cast("string")).as("_h"))
      .withColumn("_bucket", expr(s"_h div ${1L << BudgetBucketShift}"))
      .withColumn("_one", lit(1L))
    val pos = graft.operators.PrefixSum.perKeyRunningSum(
      base, "source", "_bucket", Seq("_h", "doc_id"), "_one", "ord_in_source")
    val wS = org.apache.spark.sql.expressions.Window.orderBy(col("source"))
    val wAll = org.apache.spark.sql.expressions.Window.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.unboundedFollowing)
    // the index comes from the RAW docs frame, not from `pos` (distinct
    // over pos would drag the prefix-sum windows into a second corpus
    // execution, where distinct over docs prunes to a narrow scan), and
    // n_sources rides the SAME catalog-sized window chain as the index —
    // an agg + crossJoin would be a second consumer of sidx (the
    // duplicate-scan trap)
    val sidx = docs
      .filter(col("doc_id").isNotNull && col("source").isNotNull)
      .select(col("source")).distinct()
      .withColumn("_sidx", row_number().over(wS).cast("long") - 1L)
      .withColumn("_ns", count(lit(1)).over(wAll))
    pos.join(broadcast(sidx), Seq("source"))
      .select(col("doc_id"), col("source"),
        col("ord_in_source").cast("long").as("ord_in_source"),
        ((col("ord_in_source") - 1L) * col("_ns") + col("_sidx"))
          .cast("long").as("global_ord"))
  }

  /** Curriculum training order — clean data first, source-diverse
    * throughout: documents order by (tier, curriculum_pos) where tier 0
    * is the Gopher-clean slice ([[QualityRules.gopherRules]] `passes`)
    * and tier 1 the rest, and within each tier positions round-robin
    * across sources by the [[interleaveSources]] arithmetic
    * (`(ord_in_cell − 1) · n_sources + source_idx` over the bucketed
    * per-(tier, source) running count). The easy→hard phase structure
    * of curriculum learning with no quality cliff in source diversity —
    * and NO global sort anywhere: the order is pure arithmetic; a
    * writer range-partitions on (tier, curriculum_pos) to lay it out.
    *
    * The verdict kernel runs twice (the prefix sum's window branch and
    * its bucket-offsets aggregate are two consumers) — the deliberate
    * [[Similarity.knnGraph]]-style trade: the Gopher HOF chain is a
    * narrow scan-speed pass, cheaper than checkpointing a corpus-sized
    * verdict frame; a production pipeline stores verdicts as a table
    * and orders from the artifact. Output: (doc_id, source, tier,
    * ord_in_cell, curriculum_pos). */
  def curriculumOrder(docs: DataFrame): DataFrame = {
    val verdicts = QualityRules.gopherRules(
        docs.filter(col("source").isNotNull), carryCols = Seq("source"))
      .select(col("doc_id").cast("long").as("doc_id"), col("source"),
        (lit(1) - col("passes")).cast("int").as("tier"))
    val base = verdicts
      .withColumn("_h", Hashing.md5Long(col("doc_id").cast("string")))
      .withColumn("_bucket", expr(s"_h div ${1L << BudgetBucketShift}"))
      .withColumn("_tkey",
        concat_ws(":", col("tier").cast("string"), col("source")))
      .withColumn("_one", lit(1L))
    val pos = graft.operators.PrefixSum.perKeyRunningSum(
      base, "_tkey", "_bucket", Seq("_h", "doc_id"), "_one", "ord_in_cell")
    val wS = org.apache.spark.sql.expressions.Window.orderBy(col("source"))
    val wAll = org.apache.spark.sql.expressions.Window.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val sidx = docs
      .filter(col("doc_id").isNotNull && col("source").isNotNull)
      .select(col("source")).distinct()
      .withColumn("_sidx", row_number().over(wS).cast("long") - 1L)
      .withColumn("_ns", count(lit(1)).over(wAll))
    pos.join(broadcast(sidx), Seq("source"))
      .select(col("doc_id"), col("source"), col("tier"),
        col("ord_in_cell").cast("long").as("ord_in_cell"),
        ((col("ord_in_cell") - 1L) * col("_ns") + col("_sidx"))
          .cast("long").as("curriculum_pos"))
  }

  def qInterleave(spark: SparkSession, dir: String): DataFrame =
    interleaveSources(Tables.load(spark, dir, "documents"))

  /** Oracle: the same arithmetic over a plain per-source window plus a
    * dense source index. */
  val qInterleaveSql: String = {
    val h = Hashing.md5LongSql("CAST(doc_id AS VARCHAR)")
    s"""WITH t AS MATERIALIZED (
       |  SELECT doc_id, source, $h AS h
       |  FROM documents WHERE doc_id IS NOT NULL AND source IS NOT NULL),
       |p AS (
       |  SELECT doc_id, source,
       |         row_number() OVER (PARTITION BY source ORDER BY h, doc_id)
       |           AS ord_in_source
       |  FROM t),
       |s AS (
       |  SELECT source, row_number() OVER (ORDER BY source) - 1 AS sidx
       |  FROM (SELECT DISTINCT source FROM t)),
       |n AS (SELECT count(*) AS ns FROM s)
       |SELECT p.doc_id, p.source,
       |       CAST(p.ord_in_source AS BIGINT) AS ord_in_source,
       |       CAST((p.ord_in_source - 1) * n.ns + s.sidx AS BIGINT) AS global_ord
       |FROM p JOIN s USING (source) CROSS JOIN n""".stripMargin
  }

  def qCurriculum(spark: SparkSession, dir: String): DataFrame =
    curriculumOrder(Tables.load(spark, dir, "documents"))

  /** The Gopher verdict algebra inlined with source carried (the
    * corpus_report oracle's pattern), tier = 1 − passes, then the
    * interleave arithmetic per (tier, source) cell. */
  val qCurriculumSql: String = {
    val stopsList = QualityRules.RequiredStops
      .map(s => s"'$s'").mkString("[", ", ", "]")
    val symbolPred = QualityRules.SymbolTokens
      .map(s => s"contains(w, '$s')").mkString(" OR ")
    val h = Hashing.md5LongSql("CAST(doc_id AS VARCHAR)")
    s"""WITH f AS (
       |  SELECT doc_id, source,
       |         list_filter(string_split(text, ' '), w -> w <> '') AS words
       |  FROM documents
       |  WHERE doc_id IS NOT NULL AND text IS NOT NULL AND source IS NOT NULL),
       |s AS MATERIALIZED (
       |  SELECT doc_id, source,
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
       |  SELECT doc_id, source,
       |    CASE WHEN n_words BETWEEN ${QualityRules.MinWords} AND ${QualityRules.MaxWords}
       |           AND n_words * 3 <= sum_word_chars AND sum_word_chars <= n_words * 10
       |           AND n_alpha_words * 10 >= n_words * 8
       |           AND n_symbol_words * 10 <= n_words
       |           AND n_stop_hits >= 2 THEN 0 ELSE 1 END AS tier,
       |    $h AS h
       |  FROM s),
       |p AS (
       |  SELECT doc_id, source, tier,
       |         row_number() OVER (PARTITION BY tier, source ORDER BY h, doc_id)
       |           AS ord_in_cell
       |  FROM v),
       |si AS (
       |  SELECT source, row_number() OVER (ORDER BY source) - 1 AS sidx
       |  FROM (SELECT DISTINCT source FROM documents
       |        WHERE doc_id IS NOT NULL AND source IS NOT NULL)),
       |n AS (SELECT count(*) AS ns FROM si)
       |SELECT p.doc_id, p.source, CAST(p.tier AS INT) AS tier,
       |       CAST(p.ord_in_cell AS BIGINT) AS ord_in_cell,
       |       CAST((p.ord_in_cell - 1) * n.ns + si.sidx AS BIGINT)
       |         AS curriculum_pos
       |FROM p JOIN si USING (source) CROSS JOIN n""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mix_weighted" -> (qMix _),
    "order_curriculum" -> (qCurriculum _),
    "interleave_sources" -> (qInterleave _),
    "sample_capped" -> (qCapped _),
    "split_assign" -> (qSplit _),
    "split_leakfree" -> (qLeakFreeSplit _),
    "epoch_shuffle" -> (qEpochShuffle _),
    "sample_token_budget" -> (qTokenBudget _),
    "mix_temperature" -> (qTemperature _))

  val oracleSql: Map[String, String] = Map(
    "mix_weighted" -> qMixSql,
    "interleave_sources" -> qInterleaveSql,
    "order_curriculum" -> qCurriculumSql,
    "sample_capped" -> qCappedSql,
    "split_assign" -> qSplitSql,
    "split_leakfree" -> qLeakFreeSplitSql,
    "epoch_shuffle" -> qEpochShuffleSql,
    "sample_token_budget" -> qTokenBudgetSql,
    "mix_temperature" -> qTemperatureSql)
}
