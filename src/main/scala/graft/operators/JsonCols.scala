package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Semi-structured JSON columns — extracting typed fields from
  * string-typed JSON payloads (the `props` bag every event pipeline
  * carries).
  *
  * `get_json_object` is a codegen'd path evaluation per row — a NARROW
  * projection that rides the scan, no UDF, no shuffle. For MANY fields
  * from the same payload prefer one `from_json` with an explicit struct
  * schema (one parse per row instead of one per field); for a single
  * field the path form avoids declaring a schema at all. Fields that are
  * absent or unparsable yield NULL — exactly SQL's json_extract
  * contract, so downstream aggregates skip them without ceremony.
  */
object JsonCols {

  /** `$.field` extracted as BIGINT (NULL when absent/malformed). */
  def jsonLong(payload: Column, field: String): Column =
    get_json_object(payload, s"$$.$field").cast("long")

  // ----------------------------------------------------------------- query

  /** Typed rollup over the JSON bag: per event type, count + sum/min/max
    * of `props.k` — one scan, one map-side-combined aggregate. */
  def qJsonProps(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .select(col("event_type"), jsonLong(col("props"), "k").as("k"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n_with_k"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))

  // json_valid guards the oracle because DuckDB's json_extract ERRORS on
  // malformed JSON where Spark's get_json_object returns NULL — the guard
  // makes both engines follow the documented absent-or-unparsable→NULL
  // contract instead of only the Spark side.
  val qJsonPropsSql: String =
    """WITH ev AS MATERIALIZED (
      |  SELECT event_type,
      |         CASE WHEN props IS NOT NULL AND json_valid(props)
      |              THEN CAST(json_extract(props, '$.k') AS BIGINT) END AS k
      |  FROM events)
      |SELECT event_type,
      |       count(k) AS n_with_k,
      |       CAST(sum(k) AS BIGINT) AS sum_k,
      |       min(k) AS min_k,
      |       max(k) AS max_k
      |FROM ev GROUP BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q32_json_props" -> (qJsonProps _))

  val oracleSql: Map[String, String] = Map(
    "q32_json_props" -> qJsonPropsSql)
}
