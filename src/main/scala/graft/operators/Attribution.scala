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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q49_attribution" -> (qAttribution _))

  val oracleSql: Map[String, String] = Map(
    "q49_attribution" -> qAttributionSql)
}
