package graft.core

import org.apache.spark.sql.SparkSession

/** One place to construct engine sessions with the confs the engine
  * requires, so no operator has to mutate shared session state mid-query.
  *
  *  - `spark.sql.legacy.parquet.nanosAsLong=true`: the `events` fixture
  *    stores `ts` as Parquet TIMESTAMP(NANOS), which the Spark reader
  *    otherwise rejects ([PARQUET_TYPE_ILLEGAL]). Applied at construction —
  *    not inside the read — so concurrent loads never race on session conf
  *    (ADVICE r1).
  *  - UTC timezone: oracle comparisons are timezone-stable.
  *  - shuffle.partitions sized to the core count (local[N] harness), not
  *    the 200 default; on a real cluster this would be AQE-advised.
  */
object GraftSession {

  val requiredConfs: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    // The fixtures' timestamp columns are Parquet TIMESTAMP(MICROS) with
    // isAdjustedToUTC=false, which Spark 4 otherwise infers as
    // TIMESTAMP_NTZ — a type unix_micros/watermarks reject. Reading them
    // as session-TZ (UTC) TimestampType at the SCAN keeps the wall-clock
    // identical to the DuckDB oracle's naive read AND keeps filter
    // pushdown on those columns (a post-scan cast would not).
    "spark.sql.parquet.inferTimestampNTZ.enabled" -> "false",
    // Write timestamps as INT64 MICROS, not the legacy INT96 default:
    // INT96 column chunks carry NO min/max footer statistics, so every
    // timestamp column the warehouse writes would be invisible to zone
    // maps — range probes on event time (the single most common
    // predicate at 100 TB) would silently scan the whole table. MICROS
    // also round-trips bit-exactly with the fixtures and DuckDB.
    "spark.sql.parquet.outputTimestampType" -> "TIMESTAMP_MICROS",
    "spark.sql.session.timeZone" -> "UTC")

  def builder(cpus: String): SparkSession.Builder = {
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
    requiredConfs.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }
  }
}
