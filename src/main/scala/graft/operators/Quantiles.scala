package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Exact distributed per-group quantiles — `percentile_disc` semantics
  * (the p-th value IS an element of the group, no interpolation) at a
  * scalable plan shape.
  *
  * The naive exact plan — `row_number()` over each group — sorts every
  * ROW of a group in one task: a funnel at 100 TB (and with 3 group
  * keys, a 3-task query). This instead runs the classic
  * distinct-value-histogram plan:
  *
  *  1. `groupBy(group, value) → count` — one shuffle with map-side
  *     combine; output is DISTINCT (group, value) pairs, typically
  *     orders of magnitude smaller than the input;
  *  2. cumulative counts over the value-ordered distinct rows (window
  *     per group over the histogram, not the rows);
  *  3. the p-quantile is the first value whose cumulative count reaches
  *     `ceil(p·n)` — one `min(when(cum >= idx))` aggregate per
  *     percentile.
  *
  * Rank arithmetic is INTEGER ONLY: `ceil(n·num/den)` is computed as
  * `(n·num + den - 1) div den`, never through a double multiply — so
  * both engines pick the identical element and the oracle hash-matches
  * (`0.9 * n` in IEEE is NOT exactly `9n/10`; `percentile_disc`
  * implementations differ on exactly those boundaries).
  *
  * Interpolating (`percentile_cont`) variants and Spark's
  * `approx_percentile` remain the right answer when the VALUE domain is
  * continuous and unbounded; this operator is the exact, oracle-stable
  * member of that family.
  */
object Quantiles {

  /** (label, num, den): p = num/den. */
  val Percentiles: Seq[(String, Int, Int)] =
    Seq(("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100))

  /** The shared distinct-value histogram both quantile variants pick
    * from: one input-sized rollup, then per-group cumulative (`_cum`)
    * and total (`_n`) counts over the tiny distinct frame. NULLs don't
    * participate (percentile_disc semantics) — and Spark windows order
    * NULLS FIRST while DuckDB orders NULLS LAST, so an unfiltered NULL
    * would also shift the two engines' ranks apart. */
  private def valueHistogram(df: DataFrame, groupCol: String,
                             valueCol: String): DataFrame = {
    val counts = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("_c"))
    counts
      .withColumn("_cum", sum(col("_c"))
        .over(Window.partitionBy(groupCol).orderBy(valueCol)))
      .withColumn("_n", sum(col("_c"))
        .over(Window.partitionBy(groupCol)))
  }

  def groupQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                     percentiles: Seq[(String, Int, Int)] = Percentiles): DataFrame = {
    require(percentiles.nonEmpty, "need at least one percentile")
    require(percentiles.forall { case (_, n, d) => n >= 0 && d > 0 && n <= d },
      "percentiles must satisfy 0 <= num <= den, den > 0")
    val hist = valueHistogram(df, groupCol, valueCol)
    val picks = percentiles.map { case (label, num, den) =>
      val idx = expr(s"(_n * $num + ${den - 1}) div $den")
      min(when(col("_cum") >= idx, col(valueCol))).as(label)
    }
    hist.groupBy(col(groupCol)).agg(picks.head, picks.tail: _*)
  }

  /** Interpolated (percentile_cont-style) group quantiles from the SAME
    * exact distinct-value histogram as [[groupQuantiles]] — the C=1
    * convention: rank h = (n−1)·p zero-based, result = lo + (hi−lo)·frac
    * between the two straddling data elements. Completes the quantile
    * family (disc / sampled / cont).
    *
    * Cross-engine float contract: the fractional part is the exact
    * rational `((n−1)·num mod den) / den` — the ONLY float division, fed
    * by integers, and the interpolation `lo + ((hi−lo)·rem)/den` is an
    * identical IEEE tree on both engines (deliberately NOT DuckDB's
    * quantile_cont, whose internal float path is its own); outputs pin
    * through stableRound(4). Plan shape identical to [[groupQuantiles]]:
    * one input-sized rollup, tiny per-group windows. */
  def groupQuantilesCont(df: DataFrame, groupCol: String, valueCol: String,
                         percentiles: Seq[(String, Int, Int)] = Percentiles): DataFrame = {
    require(percentiles.nonEmpty, "need at least one percentile")
    require(percentiles.forall { case (_, n, d) => n >= 0 && d > 0 && n <= d },
      "percentiles must satisfy 0 <= num <= den, den > 0")
    val hist = valueHistogram(df, groupCol, valueCol)
    val aggs = percentiles.flatMap { case (label, num, den) =>
      val loIdx = expr(s"((_n - 1) * $num) div $den + 1")
      Seq(
        min(when(col("_cum") >= loIdx, col(valueCol))).as(s"_lo_$label"),
        min(when(col("_cum") >= loIdx + 1, col(valueCol))).as(s"_hi_$label"),
        max(expr(s"((_n - 1) * $num) % $den")).as(s"_rem_$label"))
    }
    val agged = hist.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
    val outs = percentiles.map { case (label, _, den) =>
      val lo = col(s"_lo_$label").cast("double")
      val hi = coalesce(col(s"_hi_$label"), col(s"_lo_$label")).cast("double")
      graft.llmops.Hashing.stableRound(
        lo + ((hi - lo) * col(s"_rem_$label")) / lit(den.toDouble), 4).as(label)
    }
    agged.select(col(groupCol) +: outs: _*)
  }

  /** Join-skew diagnostics — the question every 100 TB join plan starts
    * with: how are rows distributed over this key? One row out: key
    * cardinality, row total, the heaviest key's count, and p50/p90/p99
    * of per-key counts. A p99/p50 ratio far above 1 says "salt this key
    * or split its head" before the shuffle does.
    *
    * Everything derives from the COUNT-OF-COUNTS histogram in ONE plan:
    * per-key counts (the only input-sized aggregation), then a tiny
    * `groupBy(count)` whose global window and final scalar agg carry
    * all six outputs — no second pass over the input, and an empty (or
    * all-NULL-key) input yields the same single row of (0, NULLs) the
    * oracle produces. */
  def keyDistribution(df: DataFrame, keyCol: String): DataFrame = {
    val counts = df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol)).agg(count(lit(1)).as("_kc"))
    val h = counts.groupBy(col("_kc")).agg(count(lit(1)).as("_k"))
    // global window over distinct COUNT VALUES — a handful of rows at
    // any input size, so the single partition is free
    val wCum = Window.orderBy("_kc")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    val hist = h
      .withColumn("_cum", sum(col("_k")).over(wCum))
      .withColumn("_n", sum(col("_k")).over(wAll))
    val picks = Percentiles.map { case (label, num, den) =>
      val idx = expr(s"(_n * $num + ${den - 1}) div $den")
      min(when(col("_cum") >= idx, col("_kc"))).as(label)
    }
    val outs = Seq(
      coalesce(sum(col("_k")), lit(0L)).as("n_keys"),
      sum(col("_kc") * col("_k")).as("n_rows"),
      max(col("_kc")).as("max_per_key")) ++ picks
    hist.agg(outs.head, outs.tail: _*)
  }

  /** Approximate quantiles by DETERMINISTIC hash sampling: keep rows
    * whose row-identity hash lands in 1/`mod` of the 60-bit domain,
    * then run the exact histogram on the sample. Rank error is the
    * sampling noise O(1/√(n/mod)) — for mod = 8 on a billion rows,
    * ±0.009% of rank.
    *
    * Why this and not a KLL/t-digest: those sketches compact in
    * ENCOUNTER ORDER, so the estimate changes with partitioning and can
    * never be oracle-hash-checked. The hash sample is order-free,
    * merge-is-union (the sample of a union IS the union of samples —
    * appends never resample old rows), identical on any engine or
    * executor count, and the downstream histogram shuffle shrinks by
    * `mod`×. The sketches remain the right tool when the value space is
    * adversarial or mod-tuning is impossible; this is the reproducible
    * member of the family. */
  def sampledGroupQuantiles(df: DataFrame, groupCol: String,
                            valueCol: String, idCols: Seq[String], mod: Int,
                            percentiles: Seq[(String, Int, Int)] = Percentiles)
  : DataFrame = {
    require(idCols.nonEmpty, "need identity columns to hash-sample on")
    require(mod >= 1, s"mod must be >= 1, got $mod")
    val h = graft.llmops.Hashing.md5Long(
      concat_ws(":", idCols.map(c => col(c).cast("string")): _*))
    groupQuantiles(df.filter(h % mod === 0), groupCol, valueCol, percentiles)
  }

  /** Equi-depth binning — assign every row its quantile bucket WITHOUT
    * the `ntile()` global sort (one task sorting the world). Two jobs:
    * boundary ELEMENTS come from the exact histogram of the
    * hash-SAMPLED rows (`sampleMod` — the [[sampledGroupQuantiles]]
    * gate; a CONTINUOUS value domain makes the full distinct-value
    * histogram input-sized, and its global ordered window would be the
    * very funnel this operator exists to avoid), then every row bins
    * MAP-SIDE against the nBins−1 collected boundaries as a literal
    * comparison chain — scan-speed, embarrassingly parallel, and
    * appends never re-sort anything. Boundary rank error is the
    * sampling noise O(1/√(n/sampleMod)); size sampleMod so the sample
    * is ~10⁶ rows and the error is far below a bin width.
    *
    * bin = #boundaries strictly below the value, so ties at a boundary
    * go to the LOWER bin on both engines (exact double equality on
    * identical elements); NULL values get a NULL bin. `sampleMod = 1`
    * is the exact-histogram degenerate case (discrete/low-cardinality
    * domains, where the histogram IS small).
    *
    * The boundary job's ordered window runs single-partition (Catalyst
    * folds the constant partition key — hence the local WindowExec
    * warning): intentional and BOUNDED — its input is the sampled
    * histogram, never the data; the same tiny-frame argument as
    * [[keyDistribution]]. */
  def equiDepthBins(df: DataFrame, valueCol: String, nBins: Int,
                    idCols: Seq[String], sampleMod: Int): DataFrame = {
    require(nBins >= 2 && nBins <= 1024,
      s"nBins must be in [2, 1024], got $nBins")
    require(df.schema(valueCol).dataType ==
      org.apache.spark.sql.types.DoubleType,
      s"equiDepthBins bins double columns; $valueCol is " +
        df.schema(valueCol).dataType.simpleString)
    val ps = (1 until nBins).map(k => (s"b$k", k, nBins))
    val bRows = sampledGroupQuantiles(df.withColumn("_g", lit(1)),
      "_g", valueCol, idCols, sampleMod, ps).take(1)
    require(bRows.nonEmpty,
      s"equiDepthBins: the 1/$sampleMod hash sample of $valueCol is " +
        "empty (too few non-NULL rows for this sampleMod) — lower " +
        "sampleMod toward 1")
    val b = bRows.head
    val bin = (1 until nBins).map(k =>
      when(col(valueCol) > lit(b.getDouble(k)), 1).otherwise(0))
      .reduce(_ + _)
    df.withColumn("bin",
      when(col(valueCol).isNull, lit(null)).otherwise(bin))
  }

  // ----------------------------------------------------------------- query

  def qQuantiles(spark: SparkSession, dir: String): DataFrame =
    groupQuantiles(Tables.load(spark, dir, "lineitem"),
      "l_returnflag", "l_extendedprice")

  def qQuantilesSampled(spark: SparkSession, dir: String): DataFrame =
    sampledGroupQuantiles(Tables.load(spark, dir, "lineitem"),
      "l_returnflag", "l_extendedprice",
      idCols = Seq("l_orderkey", "l_linenumber"), mod = 8)

  /** The oracle applies the identical hash gate, then the identical
    * exact-histogram quantile — approximation by construction, not by
    * tolerance. */
  val qQuantilesSampledSql: String = {
    val h = graft.llmops.Hashing.md5LongSql("l_orderkey || ':' || l_linenumber")
    s"""WITH c AS (SELECT l_returnflag, l_extendedprice AS v, count(*) AS c
       |           FROM lineitem
       |           WHERE l_extendedprice IS NOT NULL AND $h % 8 = 0
       |           GROUP BY 1, 2),
       |w AS (SELECT l_returnflag, v,
       |             sum(c) OVER (PARTITION BY l_returnflag ORDER BY v) AS cum,
       |             sum(c) OVER (PARTITION BY l_returnflag) AS n
       |      FROM c)
       |SELECT l_returnflag,
       |       min(CASE WHEN cum >= (n * 1 + 1) // 2 THEN v END) AS p50,
       |       min(CASE WHEN cum >= (n * 9 + 9) // 10 THEN v END) AS p90,
       |       min(CASE WHEN cum >= (n * 99 + 99) // 100 THEN v END) AS p99
       |FROM w GROUP BY 1""".stripMargin
  }

  def qSkewReport(spark: SparkSession, dir: String): DataFrame =
    keyDistribution(Tables.load(spark, dir, "lineitem"), "l_partkey")

  val qSkewReportSql: String =
    """WITH c AS (SELECT l_partkey, count(*) AS c FROM lineitem
      |           WHERE l_partkey IS NOT NULL GROUP BY 1),
      |h AS (SELECT c AS v, count(*) AS k FROM c GROUP BY 1),
      |w AS (SELECT v, sum(k) OVER (ORDER BY v) AS cum,
      |             sum(k) OVER () AS n FROM h),
      |q AS (SELECT min(CASE WHEN cum >= (n * 1 + 1) // 2 THEN v END) AS p50,
      |             min(CASE WHEN cum >= (n * 9 + 9) // 10 THEN v END) AS p90,
      |             min(CASE WHEN cum >= (n * 99 + 99) // 100 THEN v END) AS p99
      |      FROM w)
      |SELECT (SELECT count(*) FROM c) AS n_keys,
      |       (SELECT CAST(sum(c) AS BIGINT) FROM c) AS n_rows,
      |       (SELECT max(c) FROM c) AS max_per_key,
      |       p50, p90, p99
      |FROM q""".stripMargin

  /** Mirrors the Spark side's NULL exclusion — without it a NULL value
    * would form a histogram group and shift every rank index. */
  val qQuantilesSql: String =
    """WITH c AS (SELECT l_returnflag, l_extendedprice AS v, count(*) AS c
      |           FROM lineitem WHERE l_extendedprice IS NOT NULL
      |           GROUP BY 1, 2),
      |w AS (SELECT l_returnflag, v,
      |             sum(c) OVER (PARTITION BY l_returnflag ORDER BY v) AS cum,
      |             sum(c) OVER (PARTITION BY l_returnflag) AS n
      |      FROM c)
      |SELECT l_returnflag,
      |       min(CASE WHEN cum >= (n * 1 + 1) // 2 THEN v END) AS p50,
      |       min(CASE WHEN cum >= (n * 9 + 9) // 10 THEN v END) AS p90,
      |       min(CASE WHEN cum >= (n * 99 + 99) // 100 THEN v END) AS p99
      |FROM w GROUP BY 1""".stripMargin

  def qBins(spark: SparkSession, dir: String): DataFrame =
    equiDepthBins(Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice")),
      "l_extendedprice", nBins = 4,
      idCols = Seq("l_orderkey", "l_linenumber"), sampleMod = 16)
      .select(col("l_orderkey"), col("l_linenumber"), col("bin"))

  /** Boundaries restated with the identical hash gate + integer-rank
    * histogram; the comparison chain mirrors the literal when-chain bit
    * for bit (boundaries are exact data elements on both engines). */
  val qBinsSql: String = {
    val h = graft.llmops.Hashing.md5LongSql(
      "l_orderkey || ':' || l_linenumber")
    s"""WITH c AS (SELECT l_extendedprice AS v, count(*) AS c FROM lineitem
      |           WHERE l_extendedprice IS NOT NULL AND $h % 16 = 0
      |           GROUP BY 1),
      |w AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum,
      |             sum(c) OVER () AS n FROM c),
      |b AS (SELECT min(CASE WHEN cum >= (n * 1 + 3) // 4 THEN v END) AS b1,
      |             min(CASE WHEN cum >= (n * 2 + 3) // 4 THEN v END) AS b2,
      |             min(CASE WHEN cum >= (n * 3 + 3) // 4 THEN v END) AS b3
      |      FROM w)
      |SELECT l_orderkey, l_linenumber,
      |       CASE WHEN l_extendedprice IS NULL THEN NULL
      |            ELSE (CASE WHEN l_extendedprice > b1 THEN 1 ELSE 0 END
      |                + CASE WHEN l_extendedprice > b2 THEN 1 ELSE 0 END
      |                + CASE WHEN l_extendedprice > b3 THEN 1 ELSE 0 END)
      |       END AS bin
      |FROM lineitem CROSS JOIN b""".stripMargin
  }

  def qQuantilesCont(spark: SparkSession, dir: String): DataFrame =
    groupQuantilesCont(Tables.load(spark, dir, "lineitem"),
      "l_returnflag", "l_extendedprice")

  /** The identical zero-based-rank algebra: lo/hi straddling elements
    * from the exact histogram, rem/den the only float division, the
    * interpolation tree mirrored term for term. */
  val qQuantilesContSql: String = {
    def pick(label: String, num: Int, den: Int): String =
      s"""min(CASE WHEN cum >= ((n - 1) * $num) // $den + 1 THEN v END) AS _lo_$label,
         |       min(CASE WHEN cum >= ((n - 1) * $num) // $den + 2 THEN v END) AS _hi_$label,
         |       max(((n - 1) * $num) % $den) AS _rem_$label""".stripMargin
    def out(label: String, den: Int): String =
      // e-notation: a decimal-point literal would be DECIMAL in DuckDB
      // and flip the division out of the double domain
      s"""floor((_lo_$label + ((coalesce(_hi_$label, _lo_$label) - _lo_$label)
         |         * _rem_$label) / ${den}e0) * 1e4 + 5e-1) / 1e4
         |         AS $label""".stripMargin
    s"""WITH c AS (SELECT l_returnflag, l_extendedprice AS v, count(*) AS c
       |           FROM lineitem WHERE l_extendedprice IS NOT NULL
       |           GROUP BY 1, 2),
       |w AS (SELECT l_returnflag, v,
       |             sum(c) OVER (PARTITION BY l_returnflag ORDER BY v) AS cum,
       |             sum(c) OVER (PARTITION BY l_returnflag) AS n
       |      FROM c),
       |a AS (SELECT l_returnflag,
       |       ${pick("p50", 1, 2)},
       |       ${pick("p90", 9, 10)},
       |       ${pick("p99", 99, 100)}
       |      FROM w GROUP BY 1)
       |SELECT l_returnflag,
       |       ${out("p50", 2)},
       |       ${out("p90", 10)},
       |       ${out("p99", 100)}
       |FROM a""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "quantiles_cont" -> (qQuantilesCont _),
    "q26_quantiles" -> (qQuantiles _),
    "quantiles_sampled" -> (qQuantilesSampled _),
    "q38_bins" -> (qBins _),
    "skew_report" -> (qSkewReport _))

  val oracleSql: Map[String, String] = Map(
    "quantiles_cont" -> qQuantilesContSql,
    "q26_quantiles" -> qQuantilesSql,
    "quantiles_sampled" -> qQuantilesSampledSql,
    "q38_bins" -> qBinsSql,
    "skew_report" -> qSkewReportSql)
}
