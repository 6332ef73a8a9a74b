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
    * (they cannot be ordered).
    *
    * CONTRACT (enforced where cheap, checkable where not): version and
    * payload columns must be name-disjoint — a shared name would emit two
    * `last_<c>` output columns (rejected eagerly below). Version columns
    * must totally order each key's changes; when they DON'T (duplicate
    * (key, version) tuples), the struct-max falls through to comparing op
    * and payload bytes and the "survivor" is whichever row compares
    * highest — silently different from a row_number engine's arbitrary
    * pick. That check needs a pass over the data, so it lives in
    * [[versionViolations]] for callers/specs to run, not on the hot
    * path. */
  def cdcApply(changes: DataFrame, keyCols: Seq[String],
               versionCols: Seq[String], opCol: String,
               payloadCols: Seq[String],
               deleteOp: String = "D"): DataFrame = {
    require(keyCols.nonEmpty && versionCols.nonEmpty,
      "cdcApply needs key and version columns")
    val outNames = versionCols ++ payloadCols
    require(outNames.distinct.size == outNames.size,
      s"version/payload columns must be distinct names, got $outNames " +
        "(a shared name would emit duplicate last_<c> output columns)")
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

  /** (key, version) tuples appearing more than once — the rows on which
    * [[cdcApply]]'s survivor is decided by op/payload comparison instead
    * of the version order, i.e. the inputs violating the total-order
    * contract. Empty output = contract holds. Run it in a data test /
    * spec lane (one extra aggregate), not inline: at 100 TB the check
    * costs a full shuffle the compaction itself doesn't need. */
  def versionViolations(changes: DataFrame, keyCols: Seq[String],
                        versionCols: Seq[String]): DataFrame = {
    val notNull = (keyCols ++ versionCols)
      .map(col(_).isNotNull).reduce(_ && _)
    changes.filter(notNull)
      .groupBy((keyCols ++ versionCols).map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") > 1)
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
