package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Batch sessionization — gaps-and-islands over an event stream: a new
  * session starts where the gap to the previous event of the same key
  * REACHES `gapMicros` (`>=`). The BATCH twin of the streaming
  * `session_window` aggregation (`streaming/StreamingIncremental`,
  * `q27_stream_sessions`): identical session semantics, for replays and
  * backfills over data already at rest — including the exact-boundary
  * gap, where Spark's half-open [t, t+gap) session windows do NOT
  * overlap at diff == gap, so the islands predicate must be `>=`, not
  * `>` (the same boundary rule runSessions' oracle documents).
  *
  * Shape: one shuffle on the key; the lag, the running session counter,
  * and the final per-session rollup all ride the same (key, time)
  * sort — Spark plans one Exchange + one Sort and stacks the Window
  * operators on top (PlanSpec-gated). The per-session aggregate is
  * map-side combined. Ordering ties break on the event id so the
  * session assignment is total and engine-identical.
  *
  * Hot keys: a device looping one event/second for a year is bounded by
  * the same per-key funnel as every windowed operator here —
  * [[Quantiles.keyDistribution]] is the detector; (key, coarse bucket)
  * pre-splitting with boundary stitching is the escape hatch when a
  * histogram demands it.
  */
object Sessionize {

  val HourMicros: Long = 3600L * 1000000L

  /** One row per session: (key, session_seq, n_events, start_us,
    * end_us). `session_seq` is 1-based in time order per key. */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
                 idCol: String,
                 gapMicros: Long = HourMicros): DataFrame = {
    require(gapMicros > 0, s"gap must be positive, got $gapMicros")
    val w = Window.partitionBy(keyCol).orderBy(col("ts_us"), col(idCol))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col("ts_us"), 1).over(w)
    events
      .select(col(keyCol), col(idCol), unix_micros(col(tsCol)).as("ts_us"))
      .withColumn("_new", when(
        prev.isNull || col("ts_us") - prev >= gapMicros, 1L).otherwise(0L))
      .withColumn("session_seq", sum(col("_new")).over(wRun))
      .groupBy(col(keyCol), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"), max(col("ts_us")).as("end_us"))
  }

  // ----------------------------------------------------------------- query

  def qSessions(spark: SparkSession, dir: String): DataFrame =
    sessionize(Tables.load(spark, dir, "events"),
      "user_id", "ts", "event_id")

  val qSessionsSql: String =
    """WITH e AS (SELECT user_id, event_id,
      |                  epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
      |           FROM events),
      |g AS (SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
      |                       OR ts_us - lag(ts_us) OVER w >= 3600000000
      |                     THEN 1 ELSE 0 END AS new_s
      |      FROM e
      |      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
      |s AS (SELECT *, CAST(sum(new_s) OVER (PARTITION BY user_id
      |                     ORDER BY ts_us, event_id
      |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |                AS BIGINT) AS session_seq
      |      FROM g)
      |SELECT user_id, session_seq, count(*) AS n_events,
      |       min(ts_us) AS start_us, max(ts_us) AS end_us
      |FROM s GROUP BY 1, 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q33_sessions" -> (qSessions _))

  val oracleSql: Map[String, String] = Map(
    "q33_sessions" -> qSessionsSql)
}
