package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Point-in-interval range join. Spark plans a raw
  * `l.key = r.key AND l.pt BETWEEN r.lo AND r.hi` as a sort-merge join
  * on the key with the range as a post-filter — fine until a hot key
  * (every interval × every point of that key materializes) — and with
  * no equality key at all it degenerates to BroadcastNestedLoop.
  *
  * The scalable pattern is BINNING: quantize the domain into fixed-width
  * bins; an interval registers in every bin it overlaps (`sequence` +
  * `explode`, fan-out = ceil(len/width)+1), a point registers in exactly
  * one bin, and candidates come from an EQUI-join on (key, bin) with the
  * exact predicate re-checked. A (point, interval) pair can only meet in
  * the point's single bin, so no dedup pass is needed. Size `binWidth`
  * near the typical interval length: wider bins cut interval fan-out,
  * narrower bins cut per-bin candidate counts. */
object RangeJoin {

  /** Inner point-in-interval join on a shared key. `points` must carry
    * (`keys`, `ptCol`); `intervals` (`keys`, `loCol`, `hiCol`). All
    * range columns are integral (epoch micros, days, ids...). Output:
    * every points row × matching intervals row (columns from both, key
    * columns once). */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      keys: Seq[String], ptCol: String,
                      loCol: String, hiCol: String,
                      binWidth: Long,
                      maxBinsPerInterval: Long = 100000L): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(!points.columns.contains("_bin") && !intervals.columns.contains("_bin"),
      "columns named _bin collide with the range join's internal bin key")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet) -- keys
    require(overlap.isEmpty,
      s"non-key columns ${overlap.toSeq.sorted} appear on both sides — " +
        "rename one side before joining (output would be ambiguous)")
    val p = points.withColumn("_bin", floor(col(ptCol) / binWidth))
    val iv = binned(intervals, loCol, hiCol, binWidth, maxBinsPerInterval)
    p.join(iv, keys :+ "_bin")
      .filter(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("_bin")
  }

  /** Fan an interval out to one row per `binWidth` bin it spans — the
    * shared candidate-generation step of both range joins. A
    * pathological interval (open-ended sentinel hi, wrong units) would
    * otherwise materialize millions of bin rows and kill the job with
    * an opaque array/OOM error — fail it with the actual problem
    * instead. One definition so the guard, its message, and the bin
    * arithmetic cannot drift between the point and overlap variants. */
  private def binned(df: DataFrame, lo: String, hi: String,
                     binWidth: Long, maxBinsPerInterval: Long): DataFrame = {
    val nBins = floor(col(hi) / binWidth) - floor(col(lo) / binWidth) + 1
    val bins = when(nBins <= maxBinsPerInterval,
      sequence(floor(col(lo) / binWidth), floor(col(hi) / binWidth)))
      .otherwise(raise_error(concat(
        lit(s"interval spans more than $maxBinsPerInterval bins at binWidth=$binWidth ("),
        col(lo), lit(".."), col(hi),
        lit(") — widen binWidth or clamp open-ended intervals"))).cast("array<bigint>"))
    df.withColumn("_bin", explode(bins))
  }

  /** Interval×interval overlap join — the two-sided sibling of
    * [[pointInInterval]] (concurrent sessions, promo-window × activity-
    * window attribution). Same binning scheme, one extra idea: a pair
    * of overlapping intervals co-registers in EVERY bin their overlap
    * spans, so candidates are kept only in the overlap's FIRST bin
    * (`_bin = floor(max(lo_a, lo_b) / width)` — a bin both sides
    * provably registered), which de-duplicates without a distinct pass.
    * Fan-out and hot-key behavior match [[pointInInterval]]: candidates
    * come from an equi-join on (key, bin), never a nested loop. */
  def intervalOverlap(a: DataFrame, b: DataFrame, keys: Seq[String],
                      aLo: String, aHi: String, bLo: String, bHi: String,
                      binWidth: Long,
                      maxBinsPerInterval: Long = 100000L): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(!a.columns.contains("_bin") && !b.columns.contains("_bin"),
      "columns named _bin collide with the range join's internal bin key")
    val overlapCols = a.columns.toSet.intersect(b.columns.toSet) -- keys
    require(overlapCols.isEmpty,
      s"non-key columns ${overlapCols.toSeq.sorted} appear on both sides — " +
        "rename one side before joining (output would be ambiguous)")
    binned(a, aLo, aHi, binWidth, maxBinsPerInterval)
      .join(binned(b, bLo, bHi, binWidth, maxBinsPerInterval), keys :+ "_bin")
      .filter(col(aLo) <= col(bHi) && col(bLo) <= col(aHi) &&
        col("_bin") === floor(greatest(col(aLo), col(bLo)) / binWidth))
      .drop("_bin")
  }

  // ----------------------------------------------------------------- query

  private val WindowMicros = 7L * 86400L * 1000000L // 7 days
  private val DayMicros = 86400L * 1000000L

  /** Conversion windows: purchases landing within 7 days of each signup
    * event, per user — intervals from signups, points from purchases,
    * day-width bins. Signups with no purchase in window survive with
    * zero counts (left semantics applied after the inner range join). */
  def qRangeWindow(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    val signups = e.filter(col("event_type") === "signup")
      .select(col("user_id"), col("event_id").as("signup_id"),
        unix_micros(col("ts")).as("lo"))
      .withColumn("hi", col("lo") + WindowMicros)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("pt"), col("value"))
    val matched = pointInInterval(purchases, signups,
      keys = Seq("user_id"), ptCol = "pt", loCol = "lo", hiCol = "hi",
      binWidth = DayMicros)
      .groupBy(col("signup_id"))
      .agg(count(lit(1)).as("n_purchases"),
        // stableRound, not round(): a window's sum landing on a .xx5
        // boundary would otherwise round differently across engines
        graft.llmops.Hashing.stableRound(sum(col("value")), 2).as("purchased"))
    signups.select(col("signup_id"), col("user_id"))
      .join(matched, Seq("signup_id"), "left")
      .select(col("signup_id"), col("user_id"),
        coalesce(col("n_purchases"), lit(0L)).as("n_purchases"),
        coalesce(col("purchased"), lit(0.0)).as("purchased"))
  }

  val qRangeSql: String =
    """WITH s AS (SELECT user_id, event_id AS signup_id,
      |                  epoch_us(CAST(ts AS TIMESTAMP)) AS lo
      |           FROM events WHERE event_type = 'signup'),
      |p AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS pt, value
      |      FROM events WHERE event_type = 'purchase'),
      |m AS (SELECT s.signup_id, count(*) AS n_purchases,
      |             floor(sum(p.value) * 100.0 + 0.5) / 100.0 AS purchased
      |      FROM s JOIN p ON p.user_id = s.user_id
      |                   AND p.pt >= s.lo AND p.pt <= s.lo + 604800000000
      |      GROUP BY 1)
      |SELECT s.signup_id, s.user_id,
      |       coalesce(m.n_purchases, 0) AS n_purchases,
      |       coalesce(m.purchased, 0.0) AS purchased
      |FROM s LEFT JOIN m ON m.signup_id = s.signup_id""".stripMargin

  private val HourMicros = 3600L * 1000000L

  /** Same-user click-span × purchase-span overlaps: per (user, day)
    * activity intervals on each side, hour-width bins. Spans are
    * integral epoch micros end to end — no timestamp arithmetic to
    * diverge between engines. */
  def qIntervalOverlap(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
    def spans(eventType: String, prefix: String): DataFrame =
      e.filter(col("event_type") === eventType)
        .groupBy(col("user_id"), to_date(col("ts")).as(s"${prefix}_day"))
        .agg(min(unix_micros(col("ts"))).as(s"${prefix}_lo"),
          max(unix_micros(col("ts"))).as(s"${prefix}_hi"))
    intervalOverlap(spans("click", "a"), spans("purchase", "b"),
      keys = Seq("user_id"), aLo = "a_lo", aHi = "a_hi",
      bLo = "b_lo", bHi = "b_hi", binWidth = HourMicros)
      .select(col("user_id"), col("a_day"), col("a_lo"), col("a_hi"),
        col("b_day"), col("b_lo"), col("b_hi"))
  }

  val qIntervalOverlapSql: String =
    """WITH a AS (SELECT user_id, CAST(ts AS DATE) AS a_day,
      |                  min(epoch_us(CAST(ts AS TIMESTAMP))) AS a_lo,
      |                  max(epoch_us(CAST(ts AS TIMESTAMP))) AS a_hi
      |           FROM events
      |           WHERE event_type = 'click' AND user_id IS NOT NULL
      |             AND ts IS NOT NULL
      |           GROUP BY 1, 2),
      |b AS (SELECT user_id, CAST(ts AS DATE) AS b_day,
      |             min(epoch_us(CAST(ts AS TIMESTAMP))) AS b_lo,
      |             max(epoch_us(CAST(ts AS TIMESTAMP))) AS b_hi
      |      FROM events
      |      WHERE event_type = 'purchase' AND user_id IS NOT NULL
      |        AND ts IS NOT NULL
      |      GROUP BY 1, 2)
      |SELECT user_id, a_day, a_lo, a_hi, b_day, b_lo, b_hi
      |FROM a JOIN b USING (user_id)
      |WHERE a_lo <= b_hi AND b_lo <= a_hi""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q23_range_join" -> (qRangeWindow _),
    "q45_interval_join" -> (qIntervalOverlap _))

  val oracleSql: Map[String, String] = Map(
    "q23_range_join" -> qRangeSql,
    "q45_interval_join" -> qIntervalOverlapSql)
}
