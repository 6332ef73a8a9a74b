package graft.core

import java.time.{LocalDate, LocalDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter

/** Multi-format timestamp parsing for time-travel reads (F5,
  * admin/restore.py:12-57): user-facing snapshot timestamps arrive as
  * epoch milliseconds or one of six datetime shapes, tried in order.
  * The reference converts via the machine's local timezone
  * (`datetime.timestamp()`); this port pins UTC so the same string means
  * the same snapshot on every executor and in every test environment. */
object TimeParse {

  /** `.%f` fractional variants accept 1-6 digits, as Python's strptime
    * does (a fixed "SSSSSS" pattern would reject "10:30:00.5"). */
  private def withFraction(base: String): DateTimeFormatter =
    new java.time.format.DateTimeFormatterBuilder()
      .appendPattern(base)
      .appendFraction(java.time.temporal.ChronoField.MICRO_OF_SECOND, 1, 6, true)
      .toFormatter

  private val formats: Seq[(DateTimeFormatter, Boolean)] = Seq(
    DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss") -> false,
    DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss") -> false,
    withFraction("yyyy-MM-dd'T'HH:mm:ss") -> false,
    withFraction("yyyy-MM-dd HH:mm:ss") -> false,
    DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss'Z'") -> false,
    DateTimeFormatter.ofPattern("yyyy-MM-dd") -> true)

  /** parse_timestamp (restore.py:12-57): epoch-ms digits first, then the
    * format fallback chain. Throws IllegalArgumentException with the
    * reference's message shape when nothing matches. */
  def parseTimestamp(raw: String): Long = {
    val s = raw.trim
    if (s.nonEmpty && s.forall(_.isDigit) && s.length <= 18) return s.toLong // > 18 digits overflows Long → format error below
    formats.iterator.flatMap { case (fmt, dateOnly) =>
      try {
        val dt = if (dateOnly) LocalDate.parse(s, fmt).atStartOfDay()
                 else LocalDateTime.parse(s, fmt)
        Some(dt.toInstant(ZoneOffset.UTC).toEpochMilli)
      } catch { case _: Exception => None }
    }.nextOption().getOrElse(
      throw new IllegalArgumentException(
        s"Invalid timestamp format: $s. Supported formats: epoch " +
          "milliseconds, ISO 8601 (YYYY-MM-DDTHH:MM:SS), or date format " +
          "(YYYY-MM-DD HH:MM:SS)"))
  }

  /** _validate_timestamp_age (restore.py:60-70): snapshots older than the
    * 7-day time-travel window are not restorable. */
  def withinTimeTravelWindow(tsMillis: Long, nowMillis: Long): Boolean =
    nowMillis - tsMillis <= SnapshotLog.TimeTravelWindowMillis
}
