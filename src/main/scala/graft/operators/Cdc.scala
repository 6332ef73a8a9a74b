package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Change-data-capture apply — collapse an insert/update/delete
  * changelog into current table state: per key, the highest-version
  * change wins, and a key whose last change is a DELETE vanishes. The
  * batch half of the CDC story ([[graft.streaming.StreamingIncremental]]
  * holds the streaming upserts; [[graft.materialize.Materialize]]'s SCD2
  * keeps history — this one produces the LATEST-STATE snapshot a
  * changelog consumer materializes).
  *
  * The plan is deliberately an AGGREGATE, not a window: per-key argmax
  * as `max(struct(version…, payload))` gets map-side partial
  * aggregation — the shuffle carries at most one candidate row per key
  * per input partition — where `row_number() OVER (PARTITION BY key
  * ORDER BY version DESC)` shuffles and SORTS every change row. On a
  * 100 TB changelog with hot keys (the whole point of CDC compaction)
  * that difference is the job. Correctness requires the version columns
  * to totally order each key's changes (standard CDC contract: a
  * log-sequence number, or (ts, unique id)); the struct comparison
  * never reaches the payload fields when they do.
  */
object Cdc {

  /** Latest surviving row per key: `versionCols` break ties in order,
    * rows whose final `opCol` equals `deleteOp` are dropped, and
    * `payloadCols` ride along. NULL keys/versions are excluded up front
    * (they cannot be ordered). */
  def cdcApply(changes: DataFrame, keyCols: Seq[String],
               versionCols: Seq[String], opCol: String,
               payloadCols: Seq[String],
               deleteOp: String = "D"): DataFrame = {
    require(keyCols.nonEmpty && versionCols.nonEmpty,
      "cdcApply needs key and version columns")
    val notNull = (keyCols ++ versionCols)
      .map(col(_).isNotNull).reduce(_ && _)
    val packed: Column = struct(
      (versionCols.map(col) ++ Seq(col(opCol)) ++ payloadCols.map(col)): _*)
    changes.filter(notNull)
      .groupBy(keyCols.map(col): _*)
      .agg(max(packed).as("_last"))
      .filter(col(s"_last.$opCol") =!= deleteOp)
      .select(keyCols.map(col) ++
        versionCols.map(c => col(s"_last.$c").as(s"last_$c")) ++
        payloadCols.map(c => col(s"_last.$c").as(s"last_$c")): _*)
  }

  // ----------------------------------------------------------------- query

  /** The events table read as a user-state changelog: signup inserts,
    * activity updates, error tombstones — current state per user, with
    * users whose latest event is an error compacted away. */
  def qCdcApply(spark: SparkSession, dir: String): DataFrame = {
    val changes = Tables.load(spark, dir, "events")
      .withColumn("op",
        when(col("event_type") === "error", lit("D"))
          .when(col("event_type") === "signup", lit("I"))
          .otherwise(lit("U")))
    cdcApply(changes, keyCols = Seq("user_id"),
      versionCols = Seq("ts", "event_id"), opCol = "op",
      payloadCols = Seq("value"))
  }

  val qCdcApplySql: String =
    """WITH c AS (SELECT user_id, ts, event_id, value,
      |                  CASE WHEN event_type = 'error' THEN 'D'
      |                       WHEN event_type = 'signup' THEN 'I'
      |                       ELSE 'U' END AS op
      |           FROM events
      |           WHERE user_id IS NOT NULL AND ts IS NOT NULL
      |             AND event_id IS NOT NULL),
      |r AS (SELECT *, row_number() OVER (PARTITION BY user_id
      |                 ORDER BY ts DESC, event_id DESC) AS rn
      |      FROM c)
      |SELECT user_id, ts AS last_ts, event_id AS last_event_id,
      |       value AS last_value
      |FROM r WHERE rn = 1 AND op <> 'D'""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cdc_apply" -> (qCdcApply _))

  val oracleSql: Map[String, String] = Map(
    "cdc_apply" -> qCdcApplySql)
}
