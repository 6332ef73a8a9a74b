package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Ordered-funnel analysis — how many entities completed step 1, then
  * step 2 strictly after it, then step 3 after that ("signup → click →
  * purchase"). The naive rewrite — one self-join per step — multiplies
  * the fact by itself k−1 times; at 100 TB that plan is dead on
  * arrival.
  *
  * This is the single-shuffle shape instead: one window partitioning by
  * entity, ordered by (time, event id) — the id tiebreak makes
  * same-instant ordering total and engine-identical — carrying a
  * running "reached step k so far" flag per step over STRICTLY EARLIER
  * rows (`ROWS … 1 PRECEDING`, so a step never satisfies itself with a
  * same-row match). An event marks step k iff its type matches and the
  * step-(k−1) flag already held. The chained flags stack as Window
  * operators over ONE Exchange + Sort (PlanSpec-gated), and the final
  * count-distinct-per-step aggregate is a single row.
  *
  * Strictness is the semantic choice: a purchase simultaneous with its
  * click does NOT count (the order tiebreak decides same-instant
  * sequences deterministically instead of silently double-counting).
  */
object Funnel {

  /** One row: `step1_users … stepN_users`, monotone non-increasing.
    *
    * `windowMicros` time-bounds each hop: step k counts only when step
    * k−1 completed within the trailing window (real funnels expire —
    * a purchase a year after the click is not attribution). The carry
    * is the LATEST prior qualifying timestamp (not a boolean), so the
    * bound checks against the best candidate and the ROWS frame keeps
    * same-instant strictness intact; `None` is the unbounded funnel. */
  def funnel(events: DataFrame, keyCol: String, tsCol: String,
             idCol: String, typeCol: String,
             steps: Seq[String],
             windowMicros: Option[Long] = None): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    require(steps.distinct.size == steps.size, "funnel steps must be unique")
    require(windowMicros.forall(_ > 0), "the hop window must be positive")
    val wPrev = Window.partitionBy(keyCol)
      .orderBy(col("ts_us"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    var df = events.select(col(keyCol), col(idCol),
      unix_micros(col(tsCol)).as("ts_us"), col(typeCol))
      .withColumn("m0",
        when(col(typeCol) === steps.head, 1).otherwise(0))
    for (k <- 1 until steps.size) {
      val inWindow = windowMicros match {
        case None => lit(true)
        case Some(w) => col("ts_us") - col(s"r${k - 1}") <= w
      }
      df = df
        .withColumn(s"r${k - 1}",
          max(when(col(s"m${k - 1}") === 1, col("ts_us"))).over(wPrev))
        .withColumn(s"m$k", when(
          col(typeCol) === steps(k) && col(s"r${k - 1}").isNotNull &&
            inWindow,
          1).otherwise(0))
    }
    val aggs = steps.indices.map(k =>
      countDistinct(when(col(s"m$k") === 1, col(keyCol)))
        .as(s"step${k + 1}_users"))
    df.agg(aggs.head, aggs.tail: _*)
  }

  // ----------------------------------------------------------------- query

  val Steps: Seq[String] = Seq("signup", "click", "purchase")

  def qFunnel(spark: SparkSession, dir: String): DataFrame =
    funnel(Tables.load(spark, dir, "events"),
      "user_id", "ts", "event_id", "event_type", Steps)

  val qFunnelSql: String =
    """WITH e AS (SELECT user_id, event_id, event_type,
      |                  epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
      |           FROM events),
      |s0 AS (SELECT *, CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END
      |                   AS m0 FROM e),
      |s1 AS (SELECT *, coalesce(max(m0) OVER w, 0) AS b0 FROM s0
      |       WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
      |                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      |s2 AS (SELECT *, CASE WHEN event_type = 'click' AND b0 = 1
      |                      THEN 1 ELSE 0 END AS m1 FROM s1),
      |s3 AS (SELECT *, coalesce(max(m1) OVER w, 0) AS b1 FROM s2
      |       WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
      |                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      |s4 AS (SELECT *, CASE WHEN event_type = 'purchase' AND b1 = 1
      |                      THEN 1 ELSE 0 END AS m2 FROM s3)
      |SELECT count(DISTINCT CASE WHEN m0 = 1 THEN user_id END) AS step1_users,
      |       count(DISTINCT CASE WHEN m1 = 1 THEN user_id END) AS step2_users,
      |       count(DISTINCT CASE WHEN m2 = 1 THEN user_id END) AS step3_users
      |FROM s4""".stripMargin

  /** Same funnel with a 3-day hop expiry. */
  val HopMicros: Long = 3L * 86400L * 1000000L

  def qFunnelWindowed(spark: SparkSession, dir: String): DataFrame =
    funnel(Tables.load(spark, dir, "events"),
      "user_id", "ts", "event_id", "event_type", Steps, Some(HopMicros))

  val qFunnelWindowedSql: String =
    s"""WITH e AS (SELECT user_id, event_id, event_type,
      |                  epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
      |           FROM events),
      |s0 AS (SELECT *, CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END
      |                   AS m0 FROM e),
      |s1 AS (SELECT *, max(CASE WHEN m0 = 1 THEN ts_us END) OVER w AS r0
      |       FROM s0
      |       WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
      |                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      |s2 AS (SELECT *, CASE WHEN event_type = 'click' AND r0 IS NOT NULL
      |                       AND ts_us - r0 <= $HopMicros
      |                      THEN 1 ELSE 0 END AS m1 FROM s1),
      |s3 AS (SELECT *, max(CASE WHEN m1 = 1 THEN ts_us END) OVER w AS r1
      |       FROM s2
      |       WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
      |                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      |s4 AS (SELECT *, CASE WHEN event_type = 'purchase' AND r1 IS NOT NULL
      |                       AND ts_us - r1 <= $HopMicros
      |                      THEN 1 ELSE 0 END AS m2 FROM s3)
      |SELECT count(DISTINCT CASE WHEN m0 = 1 THEN user_id END) AS step1_users,
      |       count(DISTINCT CASE WHEN m1 = 1 THEN user_id END) AS step2_users,
      |       count(DISTINCT CASE WHEN m2 = 1 THEN user_id END) AS step3_users
      |FROM s4""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q34_funnel" -> (qFunnel _),
    "q42_funnel_windowed" -> (qFunnelWindowed _))

  val oracleSql: Map[String, String] = Map(
    "q34_funnel" -> qFunnelSql,
    "q42_funnel_windowed" -> qFunnelWindowedSql)
}
