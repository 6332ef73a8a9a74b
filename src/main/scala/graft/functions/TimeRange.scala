package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** First-class TIME and RANGE types (SURVEY §1.2 — the two reference
  * warehouse types Spark lacks natively; previously a documented
  * string/struct approximation, now a typed surface with operators).
  *
  * TIME (reference `bigquery.py:570-602` maps BQ TIME): represented as
  * MICROSECONDS-SINCE-MIDNIGHT in a `LongType` column — the exact
  * resolution BigQuery's TIME carries, totally ordered, zone-free, and
  * codegen-friendly (every operator below is built from Spark's own
  * arithmetic/date functions; no UDF, no CodegenFallback anywhere).
  *
  * RANGE (BQ `RANGE<T>`): `struct(start, end)` with HALF-OPEN
  * [start, end) semantics, matching BigQuery's definition. NULL start
  * or end = unbounded on that side, also per BigQuery. The operators
  * (contains / overlaps / intersect) compile to plain comparisons and
  * CASE — whole-stage-codegen territory, safe inside 100 TB scans and
  * join conditions (an overlaps-join is a range join; pair it with a
  * bucketed equi-prefilter at scale, as `AsOfJoin` does).
  */
object TimeRange {

  val MicrosPerSecond: Long = 1000000L
  val MicrosPerDay: Long = 86400L * MicrosPerSecond

  // ------------------------------------------------------------- TIME

  /** Time-of-day (micros since midnight) of a timestamp, in the SESSION
    * time zone — `TIME(ts)` in the reference. */
  def timeOfDay(ts: Column): Column = {
    // seconds-of-day from the zone-aware calendar fields, micros from
    // the timestamp's own sub-second fraction (zone shifts are whole
    // minutes; unix_micros is zone-free so its fraction is exact)
    val secs = hour(ts).cast(LongType) * 3600L +
      minute(ts).cast(LongType) * 60L + second(ts).cast(LongType)
    val micros = pmod(unix_micros(ts), lit(MicrosPerSecond))
    (secs * MicrosPerSecond + micros).cast(LongType)
  }

  /** Construct a TIME from components — `TIME(h, m, s)`. */
  def makeTime(h: Column, m: Column, s: Column): Column =
    ((h.cast(LongType) * 3600L + m.cast(LongType) * 60L + s.cast(LongType)) *
      MicrosPerSecond).cast(LongType)

  /** Parse 'HH:MM:SS[.ffffff]' into a TIME. Invalid input → NULL
    * (cast semantics, like the engine's other parsers). Round-trips
    * through the calendar fields, so the session zone cancels. */
  def parseTime(s: Column): Column = {
    // try_to_timestamp: invalid text is NULL even under ANSI mode
    val t = try_to_timestamp(concat(lit("1970-01-01 "), s))
    when(t.isNotNull,
      timeOfDay(t)).cast(LongType)
  }

  /** Render a TIME back to 'HH:MM:SS' (truncating sub-second). All
    * divisions go through an explicit Long cast BEFORE rendering:
    * Column `/` is DOUBLE division, and lpad of "0.0" silently
    * truncates to "0." — the string must come from an integer. */
  def formatTime(t: Column): Column = {
    val secs = (t / MicrosPerSecond).cast(LongType)
    concat(
      lpad((secs / 3600L).cast(LongType).cast(StringType), 2, "0"), lit(":"),
      lpad(((secs % 3600L) / 60L).cast(LongType).cast(StringType), 2, "0"), lit(":"),
      lpad((secs % 60L).cast(LongType).cast(StringType), 2, "0"))
  }

  /** `TIME_TRUNC(t, part)` — part ∈ hour | minute | second. */
  def timeTrunc(t: Column, part: String): Column = {
    val unit = part.toLowerCase match {
      case "hour" => 3600L * MicrosPerSecond
      case "minute" => 60L * MicrosPerSecond
      case "second" => MicrosPerSecond
      case other => throw new IllegalArgumentException(
        s"TIME_TRUNC part must be hour|minute|second, got '$other'")
    }
    (t.cast(LongType) / unit).cast(LongType) * unit
  }

  /** `TIME_ADD` with wrap-around at midnight (BQ TIME_ADD wraps). */
  def timeAdd(t: Column, deltaMicros: Column): Column =
    (((t.cast(LongType) + deltaMicros.cast(LongType)) % MicrosPerDay +
      MicrosPerDay) % MicrosPerDay).cast(LongType)

  /** Signed `TIME_DIFF` in micros (no wrap — a plain difference). */
  def timeDiff(a: Column, b: Column): Column =
    a.cast(LongType) - b.cast(LongType)

  // ------------------------------------------------------------ RANGE

  /** Build a RANGE struct — half-open [start, end); NULL bound =
    * unbounded on that side. Refuses inverted ranges LOUDLY at eval
    * (BQ errors on RANGE(2, 1) too) via a NULL-safe check folded into
    * the value: an inverted range would silently flip every operator,
    * so it must never construct. */
  def range(start: Column, end: Column): Column = {
    val ok = start.isNull || end.isNull || start <= end
    when(ok, struct(start.as("start"), end.as("end")))
      .otherwise(raise_error(lit("RANGE start must be <= end")))
  }

  private def rs(r: Column): Column = r.getField("start")
  private def re(r: Column): Column = r.getField("end")

  /** `RANGE_CONTAINS(r, x)`: start <= x < end, NULL bound = unbounded.
    * NULL x → NULL (SQL three-valued logic). */
  def rangeContains(r: Column, x: Column): Column =
    when(x.isNull, lit(null).cast(BooleanType))
      .otherwise((rs(r).isNull || rs(r) <= x) && (re(r).isNull || x < re(r)))

  /** `RANGE_OVERLAPS(a, b)`: the half-open intersection is non-empty. */
  def rangeOverlaps(a: Column, b: Column): Column =
    (rs(a).isNull || re(b).isNull || rs(a) < re(b)) &&
      (rs(b).isNull || re(a).isNull || rs(b) < re(a))

  /** `RANGE_INTERSECT(a, b)`: the overlap as a RANGE, NULL when the
    * ranges do not overlap (BQ errors; NULL composes better with
    * aggregation and keeps the operator total). */
  def rangeIntersect(a: Column, b: Column): Column = {
    val start = when(rs(a).isNull, rs(b))
      .when(rs(b).isNull, rs(a))
      .otherwise(greatest(rs(a), rs(b)))
    val end = when(re(a).isNull, re(b))
      .when(re(b).isNull, re(a))
      .otherwise(least(re(a), re(b)))
    when(rangeOverlaps(a, b), struct(start.as("start"), end.as("end")))
  }

  /** Width of a bounded range in the element's own units (micros for
    * timestamps via unix_micros upstream, numeric difference
    * otherwise); NULL when either side is unbounded. */
  def rangeWidth(r: Column): Column =
    when(rs(r).isNotNull && re(r).isNotNull, re(r) - rs(r))
}
