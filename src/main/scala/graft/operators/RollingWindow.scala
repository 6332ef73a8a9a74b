package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Rolling time-range aggregates — "activity in the trailing hour" per
  * entity, evaluated AT EVERY EVENT (reference analog: the rolling
  * freshness/activity views the incremental models maintain,
  * `dbtwiz/model/generate.py` date-window family; here generalized to an
  * arbitrary trailing interval).
  *
  * Shape: ONE `Window.partitionBy(key).orderBy(time).rangeBetween(-w, 0)`
  * — a single shuffle on the entity key, then each partition computes its
  * sliding frames with a sorted scan. No self-join (the classic
  * `e1 JOIN e2 ON e2.ts BETWEEN e1.ts - w AND e1.ts` rewrite multiplies
  * rows by the average window population — quadratic in hot windows),
  * and no per-row subquery.
  *
  * At 100 TB the only hazard is a HOT ENTITY: a key with billions of
  * events makes one partition's sorted scan the straggler. The fix is
  * range-partitioning by (key, coarse time bucket) with frame-width
  * overlap stitching — left out until a real key histogram
  * ([[Quantiles.keyDistribution]]) says it's needed.
  *
  * Money rides as integer CENTS (`round(value·100)::long`) so the
  * sliding sums are exact integer arithmetic — the frame-by-frame
  * float-accumulation order (Spark rescans, DuckDB uses segment trees)
  * can never produce cross-engine drift.
  *
  * Time rides as epoch MICROS — matching the engine's timestamp
  * resolution, so the frame boundary `[t - 1h, t]` is exact; RANGE
  * frames include ties (same-instant events see each other) on both
  * engines by SQL semantics.
  */
object RollingWindow {

  val HourMicros: Long = 3600L * 1000000L

  /** Per `keyCol` entity, trailing-`windowMicros` event count and cents
    * sum at every event. `tsCol` must be a TimestampType column. */
  def rollingByKey(events: DataFrame, keyCol: String, tsCol: String,
                   valueCol: String,
                   windowMicros: Long = HourMicros): DataFrame = {
    require(windowMicros > 0, s"window must be positive, got $windowMicros")
    val w = Window.partitionBy(keyCol).orderBy(col("ts_us"))
      .rangeBetween(-(windowMicros - 1), 0) // (t - w, t]: w distinct instants
    events
      .select(col("event_id"), col(keyCol),
        unix_micros(col(tsCol)).as("ts_us"),
        round(col(valueCol) * 100).cast("long").as("_cents"))
      .withColumn("roll_n", count(lit(1)).over(w))
      .withColumn("roll_cents", sum(col("_cents")).over(w))
      .drop("_cents")
  }

  // ----------------------------------------------------------------- query

  /** Trailing-hour activity per user over the events fixture. */
  def qRolling(spark: SparkSession, dir: String): DataFrame =
    rollingByKey(Tables.load(spark, dir, "events"),
      "user_id", "ts", "value")

  /** `CAST(ts AS TIMESTAMP)` truncates DuckDB's TIMESTAMP_NS to micros —
    * the same floor the Spark loader applies (`Tables.loadEvents`), so
    * both engines window over identical instants. The window sum of
    * BIGINT promotes to HUGEINT in DuckDB → cast back (driver hash is
    * type-sensitive outside int64). */
  val qRollingSql: String =
    """SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
      |       count(*) OVER w AS roll_n,
      |       CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT)
      |         AS roll_cents
      |FROM events
      |WINDOW w AS (PARTITION BY user_id
      |             ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
      |             RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW)"""
      .stripMargin

  /** Day-over-day deltas per event type — the lag() member of the
    * window family (trend monitoring over a daily rollup). The window
    * partitions by key and orders by day AFTER the rollup, so the sort
    * touches |keys|×|days| rows, never raw events; pct change is
    * NULL on each key's first day (no prior — a 0 would fake a flat
    * day) and stable-rounded where defined. */
  def qDailyDelta(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.load(spark, dir, "events")
      .filter(col("event_type").isNotNull && col("ts").isNotNull)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("event_type").orderBy("day")
    val lagN = lag(col("n"), 1).over(w)
    daily.select(col("event_type"), col("day"), col("n"),
      (col("n") - lagN).as("delta"),
      graft.llmops.Hashing.stableRound(
        (col("n") - lagN).cast("double") / lagN, 4).as("pct"))
  }

  val qDailyDeltaSql: String =
    s"""WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
       |           FROM events
       |           WHERE event_type IS NOT NULL AND ts IS NOT NULL
       |           GROUP BY 1, 2)
       |SELECT event_type, day, n,
       |       n - lag(n) OVER w AS delta,
       |       ${graft.llmops.Hashing.stableRoundSql(
        "CAST(n - lag(n) OVER w AS DOUBLE) / lag(n) OVER w", 4)} AS pct
       |FROM d
       |WINDOW w AS (PARTITION BY event_type ORDER BY day)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q30_rolling" -> (qRolling _),
    "q47_daily_delta" -> (qDailyDelta _))

  val oracleSql: Map[String, String] = Map(
    "q30_rolling" -> qRollingSql,
    "q47_daily_delta" -> qDailyDeltaSql)
}
