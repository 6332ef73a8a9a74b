package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Cohort retention — the "day-N retention by signup cohort" matrix:
  * cohort = an entity's FIRST active day; each cell counts entities of
  * that cohort active again `day_offset` days later.
  *
  * Shape discipline: the input collapses to DISTINCT (entity, day)
  * FIRST — one map-side-combined aggregate that shrinks an event
  * firehose to at most entities × days rows — and everything after
  * (first-day reduce, self-attach of the cohort day, cell counts) runs
  * on that reduced frame. The join is entity-keyed on an
  * entity-per-row frame: orders of magnitude under the event count,
  * and co-partitioned with the distinct's output so AQE usually elides
  * the second shuffle. Nothing here ever re-touches raw events.
  *
  * The cell metric is `count(*)` over (entity, day)-distinct rows —
  * equal to count-distinct users by construction, without a second
  * expand-distinct shuffle.
  */
object Retention {

  /** (cohort_day, day_offset, n_users), offset 0 = the cohort day. */
  def retentionCohorts(events: DataFrame, keyCol: String,
                       tsCol: String): DataFrame = {
    val days = events
      .select(col(keyCol), to_date(col(tsCol)).as("d")).distinct()
    val first = days.groupBy(col(keyCol)).agg(min(col("d")).as("cohort_day"))
    days.join(first, Seq(keyCol))
      .groupBy(col("cohort_day"),
        datediff(col("d"), col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  // ----------------------------------------------------------------- query

  def qRetention(spark: SparkSession, dir: String): DataFrame =
    retentionCohorts(Tables.load(spark, dir, "events"), "user_id", "ts")

  val qRetentionSql: String =
    """WITH d AS (SELECT DISTINCT user_id,
      |                  CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d
      |           FROM events),
      |f AS (SELECT user_id, min(d) AS cohort_day FROM d GROUP BY 1)
      |SELECT f.cohort_day,
      |       date_diff('day', f.cohort_day, d.d) AS day_offset,
      |       count(*) AS n_users
      |FROM d JOIN f USING (user_id)
      |GROUP BY 1, 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q35_retention" -> (qRetention _))

  val oracleSql: Map[String, String] = Map(
    "q35_retention" -> qRetentionSql)
}
