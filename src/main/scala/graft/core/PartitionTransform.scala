package graft.core

import java.time.{Instant, LocalDate, ZoneId}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg-style HIDDEN partition transforms (Iceberg spec §Partitioning;
  * same surface Delta calls generated partition columns): the partition
  * value is DERIVED from a source data column at write time, lives only
  * in the directory layout + manifest, and never surfaces as a data
  * column. Queries filter on the SOURCE column; pruning is the engine's
  * job, not the user's. This kills the classic un-hidden failure mode at
  * 100 TB — a query filtering `evt_ts` but not the redundant `evt_date`
  * column scans the whole table because the optimizer can't connect the
  * two.
  *
  * Pruning contract per transform:
  *  - [[PartitionTransform.Days]]/[[PartitionTransform.Months]]: zone
  *    maps on the source column subsume partition pruning (each
  *    partition dir's footer stats bound the source column to its
  *    day/month), so range AND equality predicates on the source prune
  *    at both entry and file level with zero new machinery.
  *  - [[PartitionTransform.Bucket]]: zone stats are USELESS (every
  *    bucket spans the full source domain) — the value is equality/IN
  *    probe pruning, done transform-side: hash the literal on the
  *    driver, keep only the matching bucket dir ([[dirValue]] must be
  *    bit-identical to [[expr]]; both funnel through the engine's
  *    shared md5-60 kernel, [[graft.llmops.Kernels.md5Long]]).
  *  - [[PartitionTransform.Truncate]]: zone maps subsume range pruning
  *    (like Days); the transform adds the clustered layout.
  *
  * Derived values are pure functions of the source value, so
  * insert-overwrite partition replacement, TTL expiry on day partitions,
  * and per-partition compaction all compose unchanged. */
sealed trait PartitionTransform {
  /** Meta-file rendering (`partition.transform` property). */
  def render: String

  /** The derived partition column (write-time). `dt` is the source
    * column's declared type — transforms are type-checked here so an
    * unsupported pairing fails the WRITE loudly, never corrupts the
    * layout. `zone` is the session time zone (timestamp→date mapping
    * must agree between the Spark plan and driver-side [[dirValue]]). */
  def expr(src: Column, dt: DataType, zone: ZoneId): Column

  /** Hive-dir value (the string after `field=`) for a source-column
    * equality literal in CATALYST internal representation (UTF8String /
    * Long micros / Int days / integral), or None when this transform
    * (or this literal shape) cannot derive one — None always means
    * "don't prune", never "prune everything". */
  def dirValue(v: Any, dt: DataType, zone: ZoneId): Option[String]
}

object PartitionTransform {

  /** `days(src)`: timestamp/date source → one dir per calendar day
    * (`2024-01-05`), the shape TTL expiry and day-grain replacement
    * want. Timestamps convert in the session time zone (same rule as
    * Spark's `to_date`). */
  case object Days extends PartitionTransform {
    val render = "days"
    def expr(src: Column, dt: DataType, zone: ZoneId): Column = dt match {
      case TimestampType | TimestampNTZType | DateType => to_date(src)
      case other => throw new IllegalArgumentException(
        s"days() needs a timestamp/date source, got ${other.sql}")
    }
    def dirValue(v: Any, dt: DataType, zone: ZoneId): Option[String] = (v, dt) match {
      case (l: java.lang.Long, TimestampType) =>
        Some(Instant.ofEpochSecond(Math.floorDiv(l.longValue, 1000000L))
          .atZone(zone).toLocalDate.toString)
      case (i: java.lang.Integer, DateType) =>
        Some(LocalDate.ofEpochDay(i.longValue).toString)
      case _ => None
    }
  }

  /** `months(src)`: one dir per calendar month, rendered as the first
    * of the month (`2024-01-01` — a real date, so the value stays
    * order-comparable and TTL-parseable). */
  case object Months extends PartitionTransform {
    val render = "months"
    def expr(src: Column, dt: DataType, zone: ZoneId): Column = dt match {
      case TimestampType | TimestampNTZType | DateType => trunc(to_date(src), "month")
      case other => throw new IllegalArgumentException(
        s"months() needs a timestamp/date source, got ${other.sql}")
    }
    def dirValue(v: Any, dt: DataType, zone: ZoneId): Option[String] = (v, dt) match {
      case (l: java.lang.Long, TimestampType) =>
        Some(Instant.ofEpochSecond(Math.floorDiv(l.longValue, 1000000L))
          .atZone(zone).toLocalDate.withDayOfMonth(1).toString)
      case (i: java.lang.Integer, DateType) =>
        Some(LocalDate.ofEpochDay(i.longValue).withDayOfMonth(1).toString)
      case _ => None
    }
  }

  /** `bucket(n, src)`: `pmod(md5_60(cast(src as string)), n)` over a
    * STRING or INTEGRAL source — the co-location transform for
    * point-probed keys. The hash is the engine's shared md5-60 kernel,
    * so the driver-side literal hash in [[dirValue]] is bit-identical
    * to the executor-side column hash by construction (one kernel, two
    * call sites). Non-integral/non-string sources are refused: their
    * CAST-to-string rendering has no JVM `toString` twin, and a mismatch
    * here would prune LIVE rows. */
  final case class Bucket(n: Int) extends PartitionTransform {
    require(n > 1, s"bucket(n) needs n > 1, got $n")
    val render = s"bucket[$n]"
    def expr(src: Column, dt: DataType, zone: ZoneId): Column = dt match {
      case StringType | ByteType | ShortType | IntegerType | LongType =>
        pmod(graft.llmops.Hashing.md5Long(src.cast(StringType)), lit(n.toLong))
      case other => throw new IllegalArgumentException(
        s"bucket($n) needs a string/integral source, got ${other.sql}")
    }
    def dirValue(v: Any, dt: DataType, zone: ZoneId): Option[String] = {
      val s: Option[String] = v match {
        case u: UTF8String => Some(u.toString)
        case l: java.lang.Long => Some(l.toString)
        case i: java.lang.Integer => Some(i.toString)
        case sh: java.lang.Short => Some(sh.toString)
        case b: java.lang.Byte => Some(b.toString)
        case _ => None
      }
      s.map(str => (graft.llmops.Kernels.md5Long(
        graft.llmops.Kernels.newMd5(), str) % n).toString)
    }
  }

  /** `truncate(w, src)`: strings → first `w` chars; integrals → floor
    * to a multiple of `w` (floored, not truncated-toward-zero, so
    * negative values land in their own left-closed bin and the dirs
    * stay order-isomorphic with the source). */
  final case class Truncate(w: Int) extends PartitionTransform {
    require(w > 0, s"truncate(w) needs w > 0, got $w")
    val render = s"truncate[$w]"
    def expr(src: Column, dt: DataType, zone: ZoneId): Column = dt match {
      case StringType => substring(src, 1, w)
      case ByteType | ShortType | IntegerType | LongType =>
        src.cast(LongType) - pmod(src.cast(LongType), lit(w.toLong))
      case other => throw new IllegalArgumentException(
        s"truncate($w) needs a string/integral source, got ${other.sql}")
    }
    def dirValue(v: Any, dt: DataType, zone: ZoneId): Option[String] = v match {
      case u: UTF8String =>
        val s = u.toString
        Some(if (s.length <= w) s else s.substring(0, w))
      case l: java.lang.Long => Some((l - Math.floorMod(l, w.toLong)).toString)
      case i: java.lang.Integer =>
        val l = i.longValue; Some((l - Math.floorMod(l, w.toLong)).toString)
      case _ => None
    }
  }

  /** Parse the meta-file rendering; inverse of [[PartitionTransform.render]]. */
  def parse(s: String): PartitionTransform = {
    val B = """bucket\[(\d+)\]""".r
    val T = """truncate\[(\d+)\]""".r
    s match {
      case "days" => Days
      case "months" => Months
      case B(n) => Bucket(n.toInt)
      case T(w) => Truncate(w.toInt)
      case other => throw new IllegalArgumentException(
        s"unknown partition transform: $other")
    }
  }
}
