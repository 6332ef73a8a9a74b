package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables

/** Multi-touch attribution — split each conversion's credit across the
  * touches that preceded it in the lookback window (the marketing-
  * analytics sibling of the funnel: the funnel asks "did the path
  * happen", attribution asks "who gets paid for it").
  *
  * Credit is INTEGER basis points: each touch gets `10000 div n`, the
  * most recent touch absorbs the remainder — per-conversion credit sums
  * to exactly 10000 with no float shares to round differently across
  * engines (a double 1/3 split can't be hash-gated; 3333/3333/3334
  * can). Remainder-to-most-recent is the documented tiebreak, ordered
  * by (touch time, touch id) — total and engine-agreed.
  *
  * Shape: touch→conversion matching is the binned
  * [[RangeJoin.pointInInterval]] equi-join (no per-user theta
  * explosion); the credit split is two window functions sharing ONE
  * conversion-keyed shuffle. Group size is a conversion's touches in
  * the window — bounded by user activity, not corpus size. */
object Attribution {

  /** (conversionId, touchId, n_touches, credit_bp) for every touch in
    * `[conversion − windowMicros, conversion]` on the same `keyCol`.
    * Conversions with zero touches emit nothing (no credit to assign). */
  def linearCredit(touches: DataFrame, conversions: DataFrame,
                   keyCol: String, tsCol: String, idCol: String,
                   windowMicros: Long, binWidthMicros: Long): DataFrame = {
    val pts = touches.select(col(keyCol), col(idCol).as("touch_id"),
      unix_micros(col(tsCol)).as("_pt"))
    val iv = conversions.select(col(keyCol), col(idCol).as("conversion_id"),
      (unix_micros(col(tsCol)) - windowMicros).as("_lo"),
      unix_micros(col(tsCol)).as("_hi"))
    val matched = RangeJoin.pointInInterval(pts, iv, keys = Seq(keyCol),
      ptCol = "_pt", loCol = "_lo", hiCol = "_hi",
      binWidth = binWidthMicros)
    val byConv = Window.partitionBy("conversion_id")
    val recency = byConv.orderBy(col("_pt").desc, col("touch_id").desc)
    matched
      .withColumn("n_touches", count(lit(1)).over(byConv))
      .withColumn("_rn", row_number().over(recency))
      .select(col("conversion_id"), col("touch_id"), col("n_touches"),
        expr("10000L div n_touches").as("_base"),
        when(col("_rn") === 1, lit(10000L) % col("n_touches"))
          .otherwise(lit(0L)).as("_rem"))
      .select(col("conversion_id"), col("touch_id"), col("n_touches"),
        (col("_base") + col("_rem")).as("credit_bp"))
  }

  /** Every standard credit model over ONE matched frame and ONE
    * conversion-keyed shuffle (the window specs share the partition key,
    * so Catalyst plans a single exchange with re-sorts, not N shuffles):
    *
    *   - `linear_bp`  — `10000 div n`, remainder to the newest touch
    *   - `first_bp`   — all 10000 to the oldest touch
    *   - `last_bp`    — all 10000 to the newest touch
    *   - `ushape_bp`  — position-based 40/20/40: 4000 to oldest + newest,
    *     the middle 2000 split evenly, remainder to the newest middle
    *     (n=1 → 10000, n=2 → 5000/5000)
    *   - `decay_bp`   — time decay QUANTIZED to half-life steps: a touch
    *     `s = (conversion − touch) div halfLifeMicros` steps back weighs
    *     `2^(maxSteps − s)` where `maxSteps = window div halfLife`;
    *     credit is `10000·w div Σw`, remainder to the newest touch.
    *
    * Integer basis points end-to-end — shifts and `div`, no floats — so
    * each model conserves exactly 10000 bp per conversion and the whole
    * frame hash-gates cross-engine. Scale shape is identical to
    * [[linearCredit]]: binned range join, per-conversion group sizes. */
  def creditModels(touches: DataFrame, conversions: DataFrame,
                   keyCol: String, tsCol: String, idCol: String,
                   windowMicros: Long, binWidthMicros: Long,
                   halfLifeMicros: Long): DataFrame = {
    val maxSteps = windowMicros / halfLifeMicros
    // Bound 45, not 63: decay credit computes 10000·2^maxSteps (needs 14
    // bits of headroom over the weight) and _sumw sums up to n weights of
    // 2^maxSteps each — at 45 that still leaves 2^18 ≈ 262k equal-max-
    // weight touches per conversion before Long overflow, vs silent
    // wraparound at 50+ with as few as 8 touches.
    require(halfLifeMicros > 0 && maxSteps >= 1 && maxSteps <= 45,
      s"window div halfLife must be in [1, 45] (got $maxSteps) — " +
        "10000*2^steps and per-conversion weight sums must fit a long")
    val pts = touches.select(col(keyCol), col(idCol).as("touch_id"),
      unix_micros(col(tsCol)).as("_pt"))
    val iv = conversions.select(col(keyCol), col(idCol).as("conversion_id"),
      (unix_micros(col(tsCol)) - windowMicros).as("_lo"),
      unix_micros(col(tsCol)).as("_hi"))
    val matched = RangeJoin.pointInInterval(pts, iv, keys = Seq(keyCol),
      ptCol = "_pt", loCol = "_lo", hiCol = "_hi", binWidth = binWidthMicros)
    val byConv = Window.partitionBy("conversion_id")
    val newest = byConv.orderBy(col("_pt").desc, col("touch_id").desc)
    val oldest = byConv.orderBy(col("_pt").asc, col("touch_id").asc)
    matched
      .withColumn("n_touches", count(lit(1)).over(byConv))
      .withColumn("_rn_new", row_number().over(newest))
      .withColumn("_rn_old", row_number().over(oldest))
      .withColumn("_w", expr(
        s"shiftleft(1L, cast($maxSteps - (_hi - _pt) div ${halfLifeMicros}L as int))"))
      .withColumn("_sumw", sum(col("_w")).over(byConv))
      .withColumn("_decay_base", expr("(10000L * _w) div _sumw"))
      .withColumn("_sum_base", sum(col("_decay_base")).over(byConv))
      .select(col("conversion_id"), col("touch_id"), col("n_touches"),
        (expr("10000L div n_touches") +
          when(col("_rn_new") === 1, lit(10000L) % col("n_touches"))
            .otherwise(0L)).as("linear_bp"),
        when(col("_rn_old") === 1, 10000L).otherwise(0L).as("first_bp"),
        when(col("_rn_new") === 1, 10000L).otherwise(0L).as("last_bp"),
        when(col("n_touches") === 1, 10000L)
          .when(col("n_touches") === 2, 5000L)
          .when(col("_rn_old") === 1 || col("_rn_new") === 1, 4000L)
          .otherwise(expr("2000L div (n_touches - 2)") +
            when(col("_rn_new") === 2, expr("2000L % (n_touches - 2)"))
              .otherwise(0L)).as("ushape_bp"),
        (col("_decay_base") +
          when(col("_rn_new") === 1, lit(10000L) - col("_sum_base"))
            .otherwise(0L)).as("decay_bp"))
  }

  // ----------------------------------------------------------------- query

  private val WeekMicros = 7L * 86400L * 1000000L
  private val DayMicros = 86400L * 1000000L

  /** Clicks get credit for same-user purchases within 7 days. */
  def qAttribution(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
    linearCredit(
      e.filter(col("event_type") === "click"),
      e.filter(col("event_type") === "purchase"),
      keyCol = "user_id", tsCol = "ts", idCol = "event_id",
      windowMicros = WeekMicros, binWidthMicros = DayMicros)
  }

  val qAttributionSql: String =
    s"""WITH c AS (SELECT user_id, event_id AS touch_id,
       |                  epoch_us(CAST(ts AS TIMESTAMP)) AS pt
       |           FROM events
       |           WHERE event_type = 'click' AND user_id IS NOT NULL
       |             AND ts IS NOT NULL),
       |p AS (SELECT user_id, event_id AS conversion_id,
       |             epoch_us(CAST(ts AS TIMESTAMP)) AS hi
       |      FROM events
       |      WHERE event_type = 'purchase' AND user_id IS NOT NULL
       |        AND ts IS NOT NULL),
       |m AS (SELECT p.conversion_id, c.touch_id, c.pt
       |      FROM p JOIN c ON c.user_id = p.user_id
       |                   AND c.pt >= p.hi - $WeekMicros AND c.pt <= p.hi),
       |r AS (SELECT conversion_id, touch_id,
       |             count(*) OVER (PARTITION BY conversion_id) AS n_touches,
       |             row_number() OVER (PARTITION BY conversion_id
       |               ORDER BY pt DESC, touch_id DESC) AS rn
       |      FROM m)
       |SELECT conversion_id, touch_id, n_touches,
       |       10000 // n_touches
       |         + CASE WHEN rn = 1 THEN 10000 % n_touches ELSE 0 END
       |         AS credit_bp
       |FROM r""".stripMargin

  /** All four credit models on the click→purchase frame of q49 —
    * half-life 1 day over the 7-day lookback (maxSteps = 7). */
  def qAttributionModels(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
    creditModels(
      e.filter(col("event_type") === "click"),
      e.filter(col("event_type") === "purchase"),
      keyCol = "user_id", tsCol = "ts", idCol = "event_id",
      windowMicros = WeekMicros, binWidthMicros = DayMicros,
      halfLifeMicros = DayMicros)
  }

  val qAttributionModelsSql: String =
    s"""WITH c AS (SELECT user_id, event_id AS touch_id,
       |                  epoch_us(CAST(ts AS TIMESTAMP)) AS pt
       |           FROM events
       |           WHERE event_type = 'click' AND user_id IS NOT NULL
       |             AND ts IS NOT NULL),
       |p AS (SELECT user_id, event_id AS conversion_id,
       |             epoch_us(CAST(ts AS TIMESTAMP)) AS hi
       |      FROM events
       |      WHERE event_type = 'purchase' AND user_id IS NOT NULL
       |        AND ts IS NOT NULL),
       |m AS (SELECT p.conversion_id, c.touch_id, c.pt, p.hi
       |      FROM p JOIN c ON c.user_id = p.user_id
       |                   AND c.pt >= p.hi - $WeekMicros AND c.pt <= p.hi),
       |r AS (SELECT conversion_id, touch_id,
       |             CAST(count(*) OVER byc AS BIGINT) AS n_touches,
       |             row_number() OVER (PARTITION BY conversion_id
       |               ORDER BY pt DESC, touch_id DESC) AS rn_new,
       |             row_number() OVER (PARTITION BY conversion_id
       |               ORDER BY pt ASC, touch_id ASC) AS rn_old,
       |             (CAST(1 AS BIGINT) << CAST(7 - (hi - pt) // $DayMicros AS INTEGER)) AS w
       |      FROM m
       |      WINDOW byc AS (PARTITION BY conversion_id)),
       |d AS (SELECT *, CAST(sum(w) OVER (PARTITION BY conversion_id) AS BIGINT) AS sumw
       |      FROM r),
       |e AS (SELECT *, (10000 * w) // sumw AS decay_base,
       |             CAST(sum((10000 * w) // sumw)
       |                  OVER (PARTITION BY conversion_id) AS BIGINT) AS sum_base
       |      FROM d)
       |SELECT conversion_id, touch_id, n_touches,
       |       CAST(10000 // n_touches
       |         + CASE WHEN rn_new = 1 THEN 10000 % n_touches ELSE 0 END
       |         AS BIGINT) AS linear_bp,
       |       CAST(CASE WHEN rn_old = 1 THEN 10000 ELSE 0 END AS BIGINT) AS first_bp,
       |       CAST(CASE WHEN rn_new = 1 THEN 10000 ELSE 0 END AS BIGINT) AS last_bp,
       |       CAST(CASE WHEN n_touches = 1 THEN 10000
       |                 WHEN n_touches = 2 THEN 5000
       |                 WHEN rn_old = 1 OR rn_new = 1 THEN 4000
       |                 ELSE 2000 // (n_touches - 2)
       |                   + CASE WHEN rn_new = 2 THEN 2000 % (n_touches - 2)
       |                          ELSE 0 END
       |            END AS BIGINT) AS ushape_bp,
       |       CAST(decay_base
       |         + CASE WHEN rn_new = 1 THEN 10000 - sum_base ELSE 0 END
       |         AS BIGINT) AS decay_bp
       |FROM e""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q49_attribution" -> (qAttribution _),
    "q50_attribution_models" -> (qAttributionModels _))

  val oracleSql: Map[String, String] = Map(
    "q49_attribution" -> qAttributionSql,
    "q50_attribution_models" -> qAttributionModelsSql)
}
