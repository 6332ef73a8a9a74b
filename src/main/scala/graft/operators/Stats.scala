package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.llmops.Hashing

/** Grouped robust statistics — the screening passes a feature pipeline
  * runs before trusting a numeric column: does X move with Y (Pearson
  * correlation per group), and which rows are scale-robust outliers
  * (median/MAD gating)?
  *
  * Reproducibility contract (the [[graft.llmops.Normalize]] discipline):
  * every aggregated moment is an exact INTEGER sum — values ride as
  * cents, co-variates as small ints — so the combine order that varies
  * with partitioning can never change a bit. Float math happens once
  * per GROUP (or once per row for scores) on identical IEEE expression
  * trees in both engines. The outlier THRESHOLD never touches floats at
  * all: `dev · 10 > mad · devNum` is an integer comparison, so there is
  * no rounding boundary on which the two engines could disagree about
  * membership.
  *
  * 100 TB shape: correlation is one map-side-combined aggregate to
  * |groups| rows. The MAD pass is two exact distinct-value histograms
  * (the [[Quantiles]] machinery — input-sized aggregation, tiny window)
  * with the per-group medians broadcast back between them; the final
  * flagging is a narrow scan. Nothing global, nothing ordered.
  */
object Stats {

  /** Per-group Pearson correlation of two integer-domain columns from
    * one pass of six integer moments. Groups with fewer than 2 rows or
    * zero variance in either variable are dropped (r is undefined — and
    * 0/0 NaN semantics differ across engines; the filter pins the
    * contract). Integer-domain guard: |n·Σxy| and the variance terms
    * must stay under 2^63 — with x ≤ 2^16 and y in cents ≤ 2^34 that
    * holds to ~2^13 rows per group beyond any fixture here; at wider
    * domains move the moments to DECIMAL(38,0).
    */
  def corrGrouped(df: DataFrame, groupCol: String, xCol: Column,
                  yCol: Column): DataFrame = {
    val rows = df.select(col(groupCol), xCol.cast("long").as("_x"),
        yCol.cast("long").as("_y"))
      .filter(col(groupCol).isNotNull && col("_x").isNotNull &&
        col("_y").isNotNull)
    val m = rows.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n"), sum(col("_x")).as("_sx"),
      sum(col("_y")).as("_sy"), sum(col("_x") * col("_y")).as("_sxy"),
      sum(col("_x") * col("_x")).as("_sxx"),
      sum(col("_y") * col("_y")).as("_syy"))
    // integer variance terms: n·Σx² − (Σx)², exact in the long domain
    val vx = col("n") * col("_sxx") - col("_sx") * col("_sx")
    val vy = col("n") * col("_syy") - col("_sy") * col("_sy")
    val cov = col("n") * col("_sxy") - col("_sx") * col("_sy")
    m.filter(col("n") >= 2 && vx > 0 && vy > 0)
      .select(col(groupCol), col("n"),
        Hashing.stableRound(
          cov.cast("double") / (sqrt(vx.cast("double")) * sqrt(vy.cast("double"))),
          4).as("r"))
  }

  /** Per-group SPEARMAN rank correlation — the monotone-association
    * screen Pearson misses (a perfectly monotone but curved relation
    * scores |rho| = 1 here and < 1 there). Ranks are `row_number` over
    * (value, idCol) — a TOTAL order both engines replicate — so the
    * no-ties formula `rho = 1 − 6·Σd²/(n(n²−1))` applies exactly, every
    * term an integer until the one final division. (Textbook Spearman
    * averages tied ranks into fractions; the deterministic-tiebreak
    * variant keeps this module's bit-stable integer discipline and
    * converges to it as ties thin out.)
    *
    * Shape: one shuffle on the group key serves both rank windows (two
    * in-partition sorts, groups bounded), then a map-side-combined
    * integer aggregate. Domain guard: n·(n²−1) is exact in the Long and
    * converts exactly to double while n³ < 2^53 (n ≈ 200k rows/group);
    * beyond that move the division to DECIMAL(38,0). */
  def spearmanGrouped(df: DataFrame, groupCol: String, xCol: Column,
                      yCol: Column, idCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rows = df.select(col(groupCol), xCol.cast("long").as("_x"),
        yCol.cast("long").as("_y"), idCol.as("_id"))
      .filter(col(groupCol).isNotNull && col("_x").isNotNull &&
        col("_y").isNotNull && col("_id").isNotNull)
    val wx = Window.partitionBy(col(groupCol)).orderBy(col("_x"), col("_id"))
    val wy = Window.partitionBy(col(groupCol)).orderBy(col("_y"), col("_id"))
    rows
      .withColumn("_rx", row_number().over(wx))
      .withColumn("_ry", row_number().over(wy))
      .withColumn("_d", (col("_rx") - col("_ry")).cast("long"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(col("_d") * col("_d")).as("_sd2"))
      .filter(col("n") >= 2)
      .select(col(groupCol), col("n"),
        Hashing.stableRound(
          lit(1.0) - (lit(6.0) * col("_sd2")) /
            (col("n") * (col("n") * col("n") - 1)).cast("double"),
          4).as("rho"))
  }

  /** Outlier gate: flag when dev·`DevDen` > mad·`DevNum` (dev > 1.9·MAD
    * — ≈2.8σ-equivalent under normality via the 1.4826 consistency
    * constant, and ~5 % of a uniform domain). Rational on purpose: the
    * comparison stays in integers. */
  val DevNum = 19
  val DevDen = 10

  /** Rows whose |value − median(group)| exceeds (DevNum/DevDen)·MAD,
    * with medians computed as exact ceil-rank histogram quantiles
    * ([[Quantiles.groupQuantiles]] — `percentile_disc` semantics, no
    * interpolation, so both engines pick the same ELEMENT). Returns
    * (idCol, groupCol, valueCol, score) where score = dev/MAD. Groups
    * with MAD = 0 are dropped: a majority-constant group makes every
    * off-value infinitely many MADs out, which says nothing — callers
    * wanting those use an exact `!=` screen instead. */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
                  idCol: String): DataFrame = {
    val cents = round(col(valueCol) * 100).cast("long")
    val rows = df.select(col(idCol), col(groupCol), col(valueCol),
        cents.as("_v"))
      .filter(col(groupCol).isNotNull && col("_v").isNotNull)
    val med = Quantiles.groupQuantiles(rows, groupCol, "_v",
      Seq(("_med", 1, 2)))
    val dev = rows.join(broadcast(med), Seq(groupCol))
      .withColumn("_dev", abs(col("_v") - col("_med")))
    val mad = Quantiles.groupQuantiles(
      dev.select(col(groupCol), col("_dev")), groupCol, "_dev",
      Seq(("_mad", 1, 2)))
    dev.join(broadcast(mad.filter(col("_mad") > 0)), Seq(groupCol))
      .filter(col("_dev") * DevDen > col("_mad") * DevNum)
      .select(col(idCol), col(groupCol), col(valueCol),
        Hashing.stableRound(
          col("_dev").cast("double") / col("_mad"), 4).as("score"))
  }

  /** Winsorization clamp percentiles: p05 / p95. */
  val WinsorLo: (String, Int, Int) = ("_lo", 1, 20)
  val WinsorHi: (String, Int, Int) = ("_hi", 19, 20)

  /** Per-group winsorization — clamp `valueCol` into its group's
    * [p05, p95] (exact ceil-rank histogram elements, so the clamp
    * bounds are actual DATA values both engines agree on, never
    * interpolated floats). The standard tail-taming transform before
    * mean-based statistics; unlike [[madOutliers]] it KEEPS every row,
    * moving tail values to the fence. One histogram pass for the
    * fences, broadcast back, then a narrow per-row `least/greatest` —
    * no row ever shuffles. Output value stays in the original double
    * domain (cents fences re-scaled once per row). */
  def winsorize(df: DataFrame, groupCol: String, valueCol: String,
                idCol: String): DataFrame = {
    val cents = round(col(valueCol) * 100).cast("long")
    val rows = df.select(col(idCol), col(groupCol), cents.as("_v"))
      .filter(col(groupCol).isNotNull && col("_v").isNotNull)
    val fences = Quantiles.groupQuantiles(rows, groupCol, "_v",
      Seq(WinsorLo, WinsorHi))
    rows.join(broadcast(fences), Seq(groupCol))
      .select(col(idCol), col(groupCol),
        (greatest(col("_lo"), least(col("_hi"), col("_v")))
          .cast("double") / 100).as("w"))
  }

  /** Chi-square independence statistic over a two-column contingency
    * table — "does event mix depend on time of day?" asked before
    * trusting a grouped model. Computed as `Σ o²·n/(rt·ct) − n` — the
    * algebraic identity for Σ(o−e)²/e over ALL cells — so zero-count
    * cells (absent from the grouped frame) contribute exactly their
    * share without ever materializing the a×b cross product.
    *
    * Reproducibility: counts, totals, and dof are exact integer
    * aggregates; each observed cell's term evaluates ONCE on an
    * identical IEEE tree (explicit multiplies — libm pow() may differ
    * in the last ulp across engines), is pinned to micro-units via the
    * stable floor-round, and the cross-cell reduction is an INTEGER sum
    * — the only order-varying combine operates on longs, so the
    * statistic is bit-stable at any parallelism. (A naive float
    * Σ(o−e)²/e changes with partition order and can't be hash-gated.)
    * Output: one row (observed cells, dof, chi2). */
  def chi2(df: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    // the contingency table feeds FOUR consumers (cells, row totals,
    // column totals, grand total) — stage the tiny |a|×|b| frame once
    // rather than re-scanning the input four times in one plan
    val cells = df.select(aCol.as("_a"), bCol.as("_b"))
      .filter(col("_a").isNotNull && col("_b").isNotNull)
      .groupBy(col("_a"), col("_b")).agg(count(lit(1)).as("o"))
      .localCheckpoint(true)
    val rt = cells.groupBy(col("_a")).agg(sum(col("o")).as("rt"))
    val ct = cells.groupBy(col("_b")).agg(sum(col("o")).as("ct"))
    val n = cells.agg(sum(col("o")).as("n"), count(lit(1)).as("n_cells"),
      countDistinct(col("_a")).as("_na"), countDistinct(col("_b")).as("_nb"))
    val term = col("o").cast("double") * col("o").cast("double") *
      col("n").cast("double") /
      (col("rt").cast("double") * col("ct").cast("double"))
    val result = cells.join(broadcast(rt), Seq("_a")).join(broadcast(ct), Seq("_b"))
      .crossJoin(broadcast(n))
      .select(col("n_cells"), ((col("_na") - 1) * (col("_nb") - 1)).as("dof"),
        col("n"), floor(term * lit(1e6) + lit(0.5)).cast("long").as("_t"))
      .groupBy(col("n_cells"), col("dof"), col("n"))
      .agg((sum(col("_t")).cast("double") / 1e6 - col("n").cast("double"))
        .as("chi2"))
      .drop("n")
    // release the staged contingency table before returning (the
    // Concurrency.maxConcurrency pattern): an orphaned checkpoint per
    // call is the exact block-manager ratchet the r13 bench drift
    // root-caused — the one-row result re-checkpoints first
    val out = result.localCheckpoint(true)
    cells.unpersist()
    out
  }

  /** Two-sample Kolmogorov–Smirnov drift per group: how far each
    * group's distribution of an integer-domain metric sits from the
    * POOLED corpus distribution — the standing drift monitor a training
    * pipeline runs on every snapshot (did src17's document lengths shift
    * this week?). Per-group-vs-pool is deliberately linear in |groups|;
    * all-pairs KS would be quadratic for the same alarm.
    *
    * Exact integer arithmetic end to end: D = max_x |F_g(x) − F_all(x)|
    * is computed as `max |cum_g·n_all − cum_all·n_g|` over the merged
    * evaluation grid, reported with its exact numerator plus a
    * basis-point quotient (`(d_num·10⁴) // (n_g·n_all)`) — no float ever
    * enters, so the statistic is bit-stable under any partitioning.
    *
    * 100 TB shape: the ONLY corpus-scale work is the (group, x) rollup —
    * one map-side-combined aggregate bounded by |groups|·|metric domain|,
    * not by rows. Everything after (grid, cumulative windows, the max)
    * runs on that rollup: the per-group window partitions by group, and
    * the pooled-ECDF window orders the |domain|-sized frame (the
    * documented small-frame exception to the no-global-window rule).
    * Integer-domain guard: cum·n products need n_g·n_all < 2^63 —
    * holds to ~3·10⁹ rows per side; past that, sample the ECDF the way
    * `lm_ppl_buckets` samples its histogram (D converges at √n).
    */
  def ksDrift(df: DataFrame, groupCol: String, valueCol: Column): DataFrame = {
    // rollup feeds four consumers (grid keys, group sizes, pooled ECDF,
    // per-group cumulative) — stage it once
    val c = df.select(col(groupCol).as("g"), valueCol.cast("long").as("x"))
      .filter(col("g").isNotNull && col("x").isNotNull)
      .groupBy(col("g"), col("x")).agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val points = c.select(col("x")).distinct()
    val sizes = c.groupBy(col("g")).agg(sum(col("c")).as("n_g"))
    val tot = c.agg(sum(col("c")).as("n_all"))
    val cumAll = c.groupBy(col("x")).agg(sum(col("c")).as("c_all"))
      .withColumn("cum_all", sum(col("c_all"))
        .over(org.apache.spark.sql.expressions.Window.orderBy("x")))
      .select(col("x"), col("cum_all"))
    val wg = org.apache.spark.sql.expressions.Window.partitionBy("g").orderBy("x")
    val result = points.crossJoin(broadcast(sizes))
      .join(c, Seq("g", "x"), "left")
      .withColumn("cum_g", sum(coalesce(col("c"), lit(0L))).over(wg))
      .join(cumAll, "x")
      .crossJoin(broadcast(tot))
      .groupBy(col("g").as(groupCol), col("n_g"), col("n_all"))
      .agg(max(abs(col("cum_g") * col("n_all") - col("cum_all") * col("n_g")))
        .as("d_num"))
      .withColumn("d_bp", expr("(d_num * 10000) div (n_g * n_all)"))
    // |groups|-row result re-stages, the rollup releases — no orphaned
    // checkpoint per invocation (see chi2)
    val out = result.localCheckpoint(true)
    c.unpersist()
    out
  }

  /** z for the 95% Wilson interval. Written as an exact decimal literal
    * so both engines parse the identical double. */
  val WilsonZ = 1.96

  /** Per-group success-rate ranking by the WILSON LOWER BOUND (Wilson
    * 1927; the "how not to sort by average rating" correction): a group
    * with 2/2 successes must not outrank one with 180/200, so groups
    * rank by the lower confidence limit of their rate, which shrinks
    * small-n groups toward zero.
    *
    * Cross-engine float contract: counts are exact integers from one
    * map-side-combined aggregate; the Wilson formula then runs ONCE PER
    * GROUP as an identical IEEE expression tree on both engines — `+ - *
    * /` and `sqrt` are all correctly-rounded (the reason Wilson is
    * chosen over a log-based interval), and the output goes through
    * [[Hashing.stableRound]]. 100 TB shape: one aggregate to |groups|
    * rows; everything else is per-group scalar math. */
  def wilsonRates(df: DataFrame, groupCol: String, successCol: Column): DataFrame = {
    val z = lit(WilsonZ)
    val agg = df.select(col(groupCol).as("g"),
      when(successCol, lit(1L)).otherwise(lit(0L)).as("s"))
      .filter(col("g").isNotNull)
      .groupBy(col("g")).agg(count(lit(1)).as("n"), sum(col("s")).as("k"))
    val nD = col("n").cast("double")
    val p = col("k").cast("double") / nD
    val z2n = z * z / nD
    val lb = (p + z2n / lit(2.0) -
      z * sqrt(p * (lit(1.0) - p) / nD + z * z / (lit(4.0) * nD * nD))) /
      (lit(1.0) + z2n)
    agg.select(col("g").as(groupCol), col("n"), col("k"),
      Hashing.stableRound(p, 6).as("rate"),
      Hashing.stableRound(lb, 6).as("wilson_lb"))
  }

  /** Per-group ROC-AUC of an integer-domain score against a binary
    * label — EXACTLY, via the Mann-Whitney identity
    * `AUC = (R₊ − n₊(n₊+1)/2) / (n₊·n₋)` with proper tie handling
    * (tied scores take their average rank): the ranking-quality eval a
    * quality-classifier pipeline runs per slice ("does this score
    * actually separate good from bad documents on Tuesday's data?").
    *
    * Everything is integer: per distinct score the doubled average rank
    * is `2·cum − cnt + 1`, the doubled positive rank-sum accumulates as
    * a BIGINT, and the output is basis points by integer division — a
    * float AUC would drift with partition order, this one hash-gates.
    * Plan shape: one (group, score) histogram rollup (map-side
    * combined), a per-group cumulative window over distinct scores, one
    * group-sized final aggregate. Groups missing a class are dropped
    * (AUC undefined). Needs n₊·n₋ < 2^59/10⁴ per group — ~10⁷ rows per
    * class per group; past that sample, AUC converges at √n. */
  def aucGrouped(df: DataFrame, groupCol: Column, labelCol: Column,
                 scoreCol: Column): DataFrame = {
    val base = df.select(groupCol.as("g"),
      when(labelCol, lit(1L)).otherwise(lit(0L)).as("y"),
      scoreCol.cast("long").as("v"))
      .filter(col("g").isNotNull && col("v").isNotNull)
    val h = base.groupBy(col("g"), col("v"))
      .agg(count(lit(1)).as("cnt"), sum(col("y")).as("pos"))
    val wc = org.apache.spark.sql.expressions.Window.partitionBy("g").orderBy("v")
    h.withColumn("cum", sum(col("cnt")).over(wc))
      .groupBy(col("g"))
      .agg(sum(col("pos") * (col("cum") * 2 - col("cnt") + 1)).as("r2"),
        sum(col("pos")).as("n_pos"), sum(col("cnt")).as("n"))
      .withColumn("n_neg", col("n") - col("n_pos"))
      .filter(col("n_pos") > 0 && col("n_neg") > 0)
      .withColumn("auc_bp",
        expr("((r2 - n_pos * (n_pos + 1)) * 10000) div (2 * n_pos * n_neg)"))
      .select(col("g"), col("n_pos"), col("n_neg"), col("auc_bp"))
  }

  /** Calibration (reliability) bins — AUC's companion question: a score
    * can RANK perfectly yet lie about probabilities; per fixed-width
    * score bin this reports observed positive rate against the bin's
    * score range, the reliability-diagram table. Bin assignment is the
    * exact integer `((v − mn)·nBins) div (mx − mn + 1)` over the
    * group-free global [mn, mx] (a 1-row broadcast scalar); rates in
    * basis points by integer division. One rollup, no window. */
  def calibrationBins(df: DataFrame, labelCol: Column, scoreCol: Column,
                      nBins: Int = 10): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    val base = df.select(when(labelCol, lit(1L)).otherwise(lit(0L)).as("y"),
      scoreCol.cast("long").as("v"))
      .filter(col("v").isNotNull)
    val bounds = base.agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
    base.crossJoin(broadcast(bounds))
      .withColumn("bin", expr(s"((v - mn) * $nBins) div (mx - mn + 1)"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"),
        min(col("v")).as("v_lo"), max(col("v")).as("v_hi"))
      .withColumn("pos_bp", expr("(n_pos * 10000) div n"))
  }

  /** Per-group Gini concentration of a non-negative integer measure —
    * the source-dominance diagnostic a corpus datasheet wants ("do 1% of
    * documents carry 90% of this source's tokens?"): 0 = perfectly even,
    * → 1 = one row holds everything.
    *
    * Exact integers on the [[aucGrouped]] histogram: with ties taking
    * average ranks, `2·Σᵢ i·xᵢ = Σ_v v·cnt·(2·cum − cnt + 1)` over
    * distinct values, so `G = (2Σi·xᵢ − (n+1)·Σx) / (n·Σx)` lands in
    * basis points by one integer division. Plan: one (group, value)
    * rollup, a per-group cumulative window over DISTINCT values (never
    * raw rows — a per-row rank window would funnel corpus-sized groups),
    * one group-sized aggregate. Needs `Σ v·cnt·2·cum < 2^63` per group
    * (~10⁹ unit-scale rows); past that, sample. */
  def giniGrouped(df: DataFrame, groupCol: String, valueCol: Column): DataFrame = {
    val base = df.select(col(groupCol).as("g"), valueCol.cast("long").as("v"))
      .filter(col("g").isNotNull && col("v").isNotNull && col("v") >= 0)
    val h = base.groupBy(col("g"), col("v")).agg(count(lit(1)).as("cnt"))
    val wc = org.apache.spark.sql.expressions.Window.partitionBy("g").orderBy("v")
    h.withColumn("cum", sum(col("cnt")).over(wc))
      .groupBy(col("g"))
      .agg(sum(col("v") * col("cnt") * (col("cum") * 2 - col("cnt") + 1)).as("ri2"),
        sum(col("v") * col("cnt")).as("sx"), sum(col("cnt")).as("n"))
      .filter(col("sx") > 0 && col("n") > 1)
      .withColumn("gini_bp",
        expr("((ri2 - (n + 1) * sx) * 10000) div (n * sx)"))
      .select(col("g").as(groupCol), col("n"), col("sx"), col("gini_bp"))
  }

  // ----------------------------------------------------------------- query

  /** Does spend move with time of day, per event type? (x = hour 0-23,
    * y = value in cents — both exact-integer co-variates.) */
  def qCorr(spark: SparkSession, dir: String): DataFrame =
    corrGrouped(Tables.load(spark, dir, "events"), "event_type",
      hour(col("ts")), round(col("value") * 100))

  val qCorrSql: String =
    s"""WITH r AS (SELECT event_type, CAST(hour(ts) AS BIGINT) AS x,
      |                  CAST(round(value * 100) AS BIGINT) AS y
      |           FROM events
      |           WHERE event_type IS NOT NULL AND ts IS NOT NULL
      |             AND value IS NOT NULL),
      |m AS (SELECT event_type, count(*) AS n,
      |             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |             CAST(sum(x * y) AS BIGINT) AS sxy,
      |             CAST(sum(x * x) AS BIGINT) AS sxx,
      |             CAST(sum(y * y) AS BIGINT) AS syy
      |      FROM r GROUP BY 1)
      |SELECT event_type, n,
      |       ${Hashing.stableRoundSql(
        "CAST(n * sxy - sx * sy AS DOUBLE) / " +
          "(sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) * " +
          "sqrt(CAST(n * syy - sy * sy AS DOUBLE)))", 4)} AS r
      |FROM m
      |WHERE n >= 2 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0""".stripMargin

  /** Monotone version of [[qCorr]]'s question, same co-variates; ranks
    * tiebreak on event_id. */
  def qSpearman(spark: SparkSession, dir: String): DataFrame =
    spearmanGrouped(Tables.load(spark, dir, "events"), "event_type",
      hour(col("ts")), round(col("value") * 100), col("event_id"))

  val qSpearmanSql: String =
    s"""WITH r AS (SELECT event_type, CAST(hour(ts) AS BIGINT) AS x,
       |                  CAST(round(value * 100) AS BIGINT) AS y, event_id
       |           FROM events
       |           WHERE event_type IS NOT NULL AND ts IS NOT NULL
       |             AND value IS NOT NULL AND event_id IS NOT NULL),
       |rk AS (SELECT event_type,
       |              row_number() OVER (PARTITION BY event_type
       |                                 ORDER BY x, event_id) AS rx,
       |              row_number() OVER (PARTITION BY event_type
       |                                 ORDER BY y, event_id) AS ry
       |       FROM r),
       |m AS (SELECT event_type, count(*) AS n,
       |             CAST(sum((rx - ry) * (rx - ry)) AS BIGINT) AS sd2
       |      FROM rk GROUP BY 1)
       |SELECT event_type, n,
       |       ${Hashing.stableRoundSql(
        "1.0 - (6.0 * sd2) / CAST(n * (n * n - 1) AS DOUBLE)", 4)} AS rho
       |FROM m WHERE n >= 2""".stripMargin

  def qOutliers(spark: SparkSession, dir: String): DataFrame =
    madOutliers(Tables.load(spark, dir, "events"), "event_type", "value",
      "event_id")

  /** The oracle restates the semantics directly: ceil-rank medians via
    * the count-histogram window (the [[Quantiles]] oracle pattern),
    * integer threshold, one float division per flagged row. */
  val qOutliersSql: String =
    s"""WITH r AS MATERIALIZED (
       |  SELECT event_id, event_type, value,
       |         CAST(round(value * 100) AS BIGINT) AS c
       |  FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL),
       |h AS (SELECT event_type, c AS v, count(*) AS k FROM r GROUP BY 1, 2),
       |w AS (SELECT event_type, v,
       |             sum(k) OVER (PARTITION BY event_type ORDER BY v) AS cum,
       |             sum(k) OVER (PARTITION BY event_type) AS n
       |      FROM h),
       |med AS (SELECT event_type,
       |               min(CASE WHEN cum >= (n + 1) // 2 THEN v END) AS med
       |        FROM w GROUP BY 1),
       |d AS MATERIALIZED (
       |  SELECT r.*, abs(r.c - med.med) AS dev
       |  FROM r JOIN med USING (event_type)),
       |h2 AS (SELECT event_type, dev AS v, count(*) AS k FROM d GROUP BY 1, 2),
       |w2 AS (SELECT event_type, v,
       |              sum(k) OVER (PARTITION BY event_type ORDER BY v) AS cum,
       |              sum(k) OVER (PARTITION BY event_type) AS n
       |       FROM h2),
       |mad AS (SELECT event_type,
       |               min(CASE WHEN cum >= (n + 1) // 2 THEN v END) AS mad
       |        FROM w2 GROUP BY 1)
       |SELECT d.event_id, d.event_type, d.value,
       |       ${Hashing.stableRoundSql("CAST(d.dev AS DOUBLE) / mad.mad", 4)}
       |         AS score
       |FROM d JOIN mad USING (event_type)
       |WHERE mad.mad > 0 AND d.dev * $DevDen > mad.mad * $DevNum""".stripMargin

  /** Is event mix independent of hour of day? One-row report. */
  def qChi2(spark: SparkSession, dir: String): DataFrame =
    chi2(Tables.load(spark, dir, "events")
      .filter(col("ts").isNotNull && col("event_type").isNotNull),
      col("event_type"), hour(col("ts")))

  val qChi2Sql: String =
    """WITH c AS (SELECT event_type AS a, hour(ts) AS b, count(*) AS o
      |           FROM events
      |           WHERE event_type IS NOT NULL AND ts IS NOT NULL
      |           GROUP BY 1, 2),
      |rt AS (SELECT a, CAST(sum(o) AS BIGINT) AS rt FROM c GROUP BY 1),
      |ct AS (SELECT b, CAST(sum(o) AS BIGINT) AS ct FROM c GROUP BY 1),
      |g AS (SELECT CAST(sum(o) AS BIGINT) AS n, count(*) AS n_cells,
      |             count(DISTINCT a) AS na, count(DISTINCT b) AS nb
      |      FROM c),
      |t AS (SELECT g.n_cells, (g.na - 1) * (g.nb - 1) AS dof, g.n,
      |             CAST(floor(CAST(c.o AS DOUBLE) * CAST(c.o AS DOUBLE)
      |                          * CAST(g.n AS DOUBLE)
      |                          / (CAST(rt.rt AS DOUBLE) * CAST(ct.ct AS DOUBLE))
      |                          * 1e6 + 0.5) AS BIGINT) AS tt
      |      FROM c JOIN rt USING (a) JOIN ct USING (b) CROSS JOIN g)
      |SELECT n_cells, dof,
      |       CAST(CAST(sum(tt) AS BIGINT) AS DOUBLE) / 1e6
      |         - CAST(n AS DOUBLE) AS chi2
      |FROM t GROUP BY n_cells, dof, n""".stripMargin

  def qWinsorize(spark: SparkSession, dir: String): DataFrame =
    winsorize(Tables.load(spark, dir, "events"), "event_type", "value",
      "event_id")

  val qWinsorizeSql: String = {
    val (_, lNum, lDen) = WinsorLo
    val (_, hNum, hDen) = WinsorHi
    s"""WITH r AS MATERIALIZED (
       |  SELECT event_id, event_type, CAST(round(value * 100) AS BIGINT) AS c
       |  FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL),
       |h AS (SELECT event_type, c AS v, count(*) AS k FROM r GROUP BY 1, 2),
       |w AS (SELECT event_type, v,
       |             sum(k) OVER (PARTITION BY event_type ORDER BY v) AS cum,
       |             sum(k) OVER (PARTITION BY event_type) AS n
       |      FROM h),
       |f AS (SELECT event_type,
       |             min(CASE WHEN cum >= (n * $lNum + ${lDen - 1}) // $lDen
       |                      THEN v END) AS lo,
       |             min(CASE WHEN cum >= (n * $hNum + ${hDen - 1}) // $hDen
       |                      THEN v END) AS hi
       |      FROM w GROUP BY 1)
       |SELECT r.event_id, r.event_type,
       |       CAST(greatest(f.lo, least(f.hi, r.c)) AS DOUBLE) / 100 AS w
       |FROM r JOIN f USING (event_type)""".stripMargin
  }

  /** Which sources' document-length distributions drift from the corpus
    * pool? (The dataset-mix drift alarm.) */
  def qKs(spark: SparkSession, dir: String): DataFrame =
    ksDrift(Tables.load(spark, dir, "documents"), "source", col("n_chars"))

  val qKsSql: String =
    """WITH c AS MATERIALIZED (
      |  SELECT source AS g, CAST(n_chars AS BIGINT) AS x,
      |         CAST(count(*) AS BIGINT) AS c
      |  FROM documents
      |  WHERE source IS NOT NULL AND n_chars IS NOT NULL
      |  GROUP BY 1, 2),
      |p AS (SELECT DISTINCT x FROM c),
      |gg AS (SELECT g, CAST(sum(c) AS BIGINT) AS n_g FROM c GROUP BY 1),
      |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_all FROM c),
      |cum_all AS (
      |  SELECT x, CAST(sum(c_all) OVER (ORDER BY x) AS BIGINT) AS cum_all
      |  FROM (SELECT x, sum(c) AS c_all FROM c GROUP BY 1)),
      |cg AS (
      |  SELECT grid.g, grid.n_g, grid.x,
      |         CAST(sum(coalesce(c.c, 0)) OVER (
      |           PARTITION BY grid.g ORDER BY grid.x) AS BIGINT) AS cum_g
      |  FROM (SELECT gg.g, gg.n_g, p.x FROM gg CROSS JOIN p) grid
      |  LEFT JOIN c ON c.g = grid.g AND c.x = grid.x)
      |SELECT cg.g AS source, cg.n_g, tot.n_all,
      |       CAST(max(abs(cum_g * n_all - cum_all * n_g)) AS BIGINT) AS d_num,
      |       (CAST(max(abs(cum_g * n_all - cum_all * n_g)) AS BIGINT) * 10000)
      |         // (cg.n_g * tot.n_all) AS d_bp
      |FROM cg JOIN cum_all USING (x) CROSS JOIN tot
      |GROUP BY 1, 2, 3""".stripMargin

  /** Which event types convert (value > 20) reliably, small-sample
    * honest? */
  def qWilson(spark: SparkSession, dir: String): DataFrame =
    wilsonRates(Tables.load(spark, dir, "events"), "event_type",
      col("value") > 20)

  val qWilsonSql: String =
    s"""WITH a AS (
       |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(CASE WHEN value > 20 THEN 1 ELSE 0 END) AS BIGINT) AS k
       |  FROM events WHERE event_type IS NOT NULL GROUP BY 1)
       |SELECT event_type, n, k,
       |       ${Hashing.stableRoundSql("(CAST(k AS DOUBLE) / CAST(n AS DOUBLE))", 6)} AS rate,
       |       ${Hashing.stableRoundSql(
          "((CAST(k AS DOUBLE) / CAST(n AS DOUBLE))" +
            " + (1.96e0 * 1.96e0 / CAST(n AS DOUBLE)) / 2e0" +
            " - 1.96e0 * sqrt((CAST(k AS DOUBLE) / CAST(n AS DOUBLE))" +
            "   * (1e0 - (CAST(k AS DOUBLE) / CAST(n AS DOUBLE)))" +
            "   / CAST(n AS DOUBLE)" +
            "   + 1.96e0 * 1.96e0" +
            "     / (4e0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))" +
            " / (1e0 + 1.96e0 * 1.96e0 / CAST(n AS DOUBLE))", 6)} AS wilson_lb
       |FROM a""".stripMargin

  /** Does spend amount separate purchases from other events, day by
    * day? (The per-slice ranking-quality monitor.) */
  def qAuc(spark: SparkSession, dir: String): DataFrame =
    aucGrouped(Tables.load(spark, dir, "events"),
      to_date(col("ts")).as("day"),
      col("event_type") === "purchase",
      round(col("value") * 100))
      .withColumnRenamed("g", "day")

  val qAucSql: String =
    """WITH b AS (
      |  SELECT CAST(ts AS DATE) AS g,
      |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
      |         CAST(round(value * 100) AS BIGINT) AS v
      |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
      |h AS (SELECT g, v, CAST(count(*) AS BIGINT) AS cnt,
      |             CAST(sum(y) AS BIGINT) AS pos
      |      FROM b GROUP BY 1, 2),
      |c AS (SELECT g, v, cnt, pos,
      |             CAST(sum(cnt) OVER (PARTITION BY g ORDER BY v) AS BIGINT) AS cum
      |      FROM h),
      |a AS (SELECT g, CAST(sum(pos * (2 * cum - cnt + 1)) AS BIGINT) AS r2,
      |             CAST(sum(pos) AS BIGINT) AS n_pos,
      |             CAST(sum(cnt) AS BIGINT) AS n
      |      FROM c GROUP BY 1)
      |SELECT g AS day, n_pos, n - n_pos AS n_neg,
      |       ((r2 - n_pos * (n_pos + 1)) * 10000)
      |         // (2 * n_pos * (n - n_pos)) AS auc_bp
      |FROM a WHERE n_pos > 0 AND n - n_pos > 0""".stripMargin

  /** Is spend calibrated against purchase propensity across its range? */
  def qCalibration(spark: SparkSession, dir: String): DataFrame =
    // raw-column null guard BEFORE the score expression: the generic
    // filter on cast(round(value*100)) can't push to the scan, this can
    calibrationBins(Tables.load(spark, dir, "events")
        .filter(col("value").isNotNull),
      col("event_type") === "purchase", round(col("value") * 100))

  val qCalibrationSql: String =
    """WITH b AS (
      |  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
      |         CAST(round(value * 100) AS BIGINT) AS v
      |  FROM events WHERE value IS NOT NULL),
      |m AS (SELECT min(v) AS mn, max(v) AS mx FROM b)
      |SELECT ((v - mn) * 10) // (mx - mn + 1) AS bin,
      |       count(*) AS n, CAST(sum(y) AS BIGINT) AS n_pos,
      |       min(v) AS v_lo, max(v) AS v_hi,
      |       (CAST(sum(y) AS BIGINT) * 10000) // count(*) AS pos_bp
      |FROM b CROSS JOIN m
      |GROUP BY 1""".stripMargin

  /** How concentrated is document length within each source? */
  def qGini(spark: SparkSession, dir: String): DataFrame =
    giniGrouped(Tables.load(spark, dir, "documents"), "source", col("n_chars"))

  val qGiniSql: String =
    """WITH b AS (SELECT source AS g, CAST(n_chars AS BIGINT) AS v
      |           FROM documents
      |           WHERE source IS NOT NULL AND n_chars IS NOT NULL
      |             AND n_chars >= 0),
      |h AS (SELECT g, v, CAST(count(*) AS BIGINT) AS cnt FROM b GROUP BY 1, 2),
      |c AS (SELECT g, v, cnt,
      |             CAST(sum(cnt) OVER (PARTITION BY g ORDER BY v) AS BIGINT) AS cum
      |      FROM h),
      |a AS (SELECT g, CAST(sum(v * cnt * (2 * cum - cnt + 1)) AS BIGINT) AS ri2,
      |             CAST(sum(v * cnt) AS BIGINT) AS sx,
      |             CAST(sum(cnt) AS BIGINT) AS n
      |      FROM c GROUP BY 1)
      |SELECT g AS source, n, sx,
      |       ((ri2 - (n + 1) * sx) * 10000) // (n * sx) AS gini_bp
      |FROM a WHERE sx > 0 AND n > 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stats_ks" -> (qKs _),
    "stats_gini" -> (qGini _),
    "eval_calibration" -> (qCalibration _),
    "stats_auc" -> (qAuc _),
    "stats_wilson" -> (qWilson _),
    "stats_corr" -> (qCorr _),
    "stats_spearman" -> (qSpearman _),
    "stats_chi2" -> (qChi2 _),
    "outliers_mad" -> (qOutliers _),
    "winsorize" -> (qWinsorize _))

  val oracleSql: Map[String, String] = Map(
    "stats_ks" -> qKsSql,
    "stats_gini" -> qGiniSql,
    "eval_calibration" -> qCalibrationSql,
    "stats_auc" -> qAucSql,
    "stats_wilson" -> qWilsonSql,
    "stats_corr" -> qCorrSql,
    "stats_spearman" -> qSpearmanSql,
    "stats_chi2" -> qChi2Sql,
    "outliers_mad" -> qOutliersSql,
    "winsorize" -> qWinsorizeSql)
}
