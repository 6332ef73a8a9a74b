package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Interval-overlap aggregation — "how many sessions were open at
  * once, and when did the peak first happen": the sweep-line count over
  * interval endpoints.
  *
  * The sweep needs an ORDERED GLOBAL PREFIX SUM of +1/−1 endpoint
  * deltas — the same scale trap as sequence packing
  * ([[graft.llmops.Pack]]), and the same two-phase scan defeats it:
  * per-TIME-BUCKET prefix sums in parallel, then #buckets driver-scanned
  * base offsets broadcast back. Endpoint deltas first collapse by
  * `groupBy(ts)` (map-side combined), so the swept frame is
  * distinct-instant-sized, not 2× intervals; the peak row then needs a
  * max plus an earliest-instant-at-max — two tiny aggregates over the
  * swept frame, deterministic (no `arg_max`, whose tie choice is
  * engine-defined).
  *
  * Intervals are CLOSED ([lo, hi]): the −1 lands at hi+1, so an
  * interval ending exactly where another starts still overlaps it for
  * that instant — the convention session windows expect.
  */
object Concurrency {

  val DayMicros: Long = 86400L * 1000000L

  /** One row: (max_concurrent, at_ts) — the peak simultaneous open
    * intervals and the EARLIEST instant it is first reached. Intervals
    * with a NULL endpoint are excluded up front (they cannot sweep; a
    * half-NULL row would otherwise leave an unmatched ±1 corrupting
    * every count after it). `materialize = false` keeps the full lazy
    * plan for inspection — and recomputes the delta pipeline once per
    * downstream action; the default persists the (distinct-instant-
    * sized) delta frame across the sweep's three actions and releases
    * it before returning the one-row result. */
  def maxConcurrency(intervals: DataFrame, loCol: String, hiCol: String,
                     bucketMicros: Long = DayMicros,
                     materialize: Boolean = true): DataFrame = {
    require(bucketMicros > 0, s"bucket width must be positive")
    val nonNull = intervals
      .filter(col(loCol).isNotNull && col(hiCol).isNotNull)
    val deltasPlan = nonNull.select(col(loCol).as("ts"), lit(1L).as("d"))
      .unionByName(nonNull.select((col(hiCol) + 1).as("ts"),
        lit(-1L).as("d")))
      .groupBy(col("ts")).agg(sum(col("d")).as("d"))
      .withColumn("bucket", expr(s"ts div $bucketMicros"))
    val deltas = if (materialize) deltasPlan.persist() else deltasPlan
    val swept = graft.operators.PrefixSum.bucketedRunningSum(deltas,
      "bucket", "ts", "d", "conc")
      .select(col("ts"), col("conc"))
    val mx = swept.agg(max(col("conc")).as("mx"))
    val peak = swept.crossJoin(broadcast(mx))
      .filter(col("conc") === col("mx"))
      .agg(max(col("conc")).as("max_concurrent"),
        min(col("ts")).as("at_ts"))
    if (!materialize) peak
    else {
      val out = peak.localCheckpoint(true) // one row
      deltas.unpersist()
      out
    }
  }

  // ----------------------------------------------------------------- query

  /** Peak simultaneous user sessions (1-hour-gap sessions over the
    * events fixture) — sessionize feeds the sweep in one plan. */
  def qConcurrency(spark: SparkSession, dir: String): DataFrame =
    maxConcurrency(
      Sessionize.qSessions(spark, dir), "start_us", "end_us")

  /** The oracle states the sweep with one plain global window over the
    * same session frame (the two-phase plan must reproduce it
    * exactly). */
  val qConcurrencySql: String =
    """WITH e AS (SELECT user_id, event_id,
      |                  epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
      |           FROM events),
      |g AS (SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
      |                       OR ts_us - lag(ts_us) OVER w >= 3600000000
      |                     THEN 1 ELSE 0 END AS new_s
      |      FROM e
      |      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
      |s AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id
      |                 ORDER BY ts_us, event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |              AS sid
      |      FROM g),
      |iv AS (SELECT min(ts_us) AS lo, max(ts_us) AS hi
      |       FROM s GROUP BY user_id, sid),
      |d AS (SELECT ts, CAST(sum(d) AS BIGINT) AS d FROM (
      |        SELECT lo AS ts, 1 AS d FROM iv
      |        UNION ALL SELECT hi + 1 AS ts, -1 AS d FROM iv)
      |      GROUP BY 1),
      |p AS MATERIALIZED (
      |      SELECT ts, CAST(sum(d) OVER (ORDER BY ts) AS BIGINT) AS conc
      |      FROM d)
      |SELECT max(conc) AS max_concurrent,
      |       min(CASE WHEN conc = (SELECT max(conc) FROM p) THEN ts END)
      |         AS at_ts
      |FROM p""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q37_concurrency" -> (qConcurrency _))

  val oracleSql: Map[String, String] = Map(
    "q37_concurrency" -> qConcurrencySql)
}
