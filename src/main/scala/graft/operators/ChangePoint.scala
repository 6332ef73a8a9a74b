package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** CUSUM change-point detection over per-key daily series — the "when
  * did this stream's behavior shift" diagnostic for ingest monitoring
  * (a source whose volume regime changes mid-corpus usually changed
  * collection policy; the day matters more than the fact).
  *
  * Statistic: for each key's daily counts c_d over n days with total S,
  * the scaled deviations `dev_d = n·c_d − S` (integer, mean-free by
  * construction — no float mean ever exists) accumulate in day order;
  * the change point is the day with the maximum |cusum| (ties break to
  * the EARLIEST day — deterministic cross-engine), and the magnitude is
  * published raw (units: count·days), exact.
  *
  * Shape: one map-side-combined (key, day) rollup bounded by keys×days,
  * per-key window aggregates for (n, S), one ordered running sum, one
  * argmax window — all on the rollup, never the raw events. */
object ChangePoint {

  /** Per key: (key, change_day, max_abs_cusum, n_days). `df` must have
    * the key column, a date column `day`, and a count column `c`. */
  def cusumChangePoint(df: DataFrame, keyCol: String): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol))
    val ordered = byKey.orderBy(col("day"))
    val run = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = df
      .withColumn("_n", count(lit(1)).over(byKey))
      .withColumn("_s", sum(col("c")).over(byKey))
      .withColumn("_cusum", sum(col("_n") * col("c") - col("_s")).over(run))
    val pick = Window.partitionBy(col(keyCol))
      .orderBy(abs(col("_cusum")).desc, col("day"))
    scored.withColumn("_rn", row_number().over(pick))
      .filter(col("_rn") === 1)
      .select(col(keyCol), col("day").as("change_day"),
        abs(col("_cusum")).as("max_abs_cusum"), col("_n").as("n_days"))
  }

  // ----------------------------------------------------------------- query

  /** Change point of each event type's daily volume. */
  def qTsCusum(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.load(spark, dir, "events")
      .filter(col("event_type").isNotNull && col("ts").isNotNull)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
    cusumChangePoint(daily, "event_type")
  }

  val qTsCusumSql: String =
    """WITH daily AS MATERIALIZED (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |         CAST(count(*) AS BIGINT) AS c
      |  FROM events
      |  WHERE event_type IS NOT NULL AND ts IS NOT NULL
      |  GROUP BY 1, 2),
      |stats AS (
      |  SELECT event_type, day, c,
      |         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
      |         CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS s
      |  FROM daily),
      |scored AS (
      |  SELECT event_type, day, n,
      |         CAST(sum(n * c - s)
      |              OVER (PARTITION BY event_type ORDER BY day
      |                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cusum
      |  FROM stats)
      |SELECT event_type, day AS change_day,
      |       CAST(abs(cusum) AS BIGINT) AS max_abs_cusum,
      |       n AS n_days
      |FROM (SELECT event_type, day, n, cusum,
      |             row_number() OVER (PARTITION BY event_type
      |                                ORDER BY abs(cusum) DESC, day) AS rn
      |      FROM scored)
      |WHERE rn = 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts_cusum" -> (qTsCusum _))

  val oracleSql: Map[String, String] = Map(
    "ts_cusum" -> qTsCusumSql)
}
