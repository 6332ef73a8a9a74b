package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.{PartitionTransform, TableMeta, Warehouse}

/** Hidden partitioning (Iceberg-style partition transforms): the
  * partition value derives from a source column at write time, never
  * surfaces as a data column, prunes probes on the SOURCE column
  * (bucket equality transform-side; days/truncate via zone maps), and
  * composes with insert-overwrite replacement, row-level ops, TTL
  * expiry, and compaction. */
class HiddenPartitionSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private def freshWh(): Warehouse =
    new Warehouse(spark, Files.createTempDirectory("hidden_spec").toString)

  private val dayMeta = TableMeta(
    partitionField = Some("p_day"), partitionType = "date",
    partitionTransform = Some("days"), partitionSource = Some("ts"))

  private def events(rows: (String, Long, Double)*): DataFrame =
    rows.toSeq.toDF("tss", "uid", "amt")
      .select(to_timestamp(col("tss")).as("ts"), col("uid"), col("amt"))

  private val threeDays = events(
    ("2024-01-05 08:00:00", 1L, 10.0), ("2024-01-05 17:30:00", 2L, 20.0),
    ("2024-01-06 09:10:00", 3L, 30.0),
    ("2024-01-07 23:59:59", 4L, 40.0), ("2024-01-07 00:00:00", 5L, 50.0))

  test("days(): synthetic column never surfaces; layout is one dir per day") {
    val wh = freshWh()
    wh.overwrite("d", "ev", threeDays, dayMeta)
    val got = wh.read("d", "ev")
    assert(got.columns.toSeq == Seq("ts", "uid", "amt"),
      s"hidden column leaked: ${got.columns.mkString(",")}")
    assert(got.count() == 5L)
    val parts = wh.log("d", "ev").latest.get.entries.map(_.partition).sorted
    assert(parts == Seq("2024-01-05", "2024-01-06", "2024-01-07"))
    // readWhere on the source column ≡ read().filter
    val pred = col("ts") >= lit("2024-01-06")
    assert(wh.readWhere("d", "ev", pred).count() ==
      got.filter(pred).count())
  }

  test("days(): insertOverwrite replaces exactly the derived day partitions") {
    val wh = freshWh()
    wh.overwrite("d", "ev", threeDays, dayMeta)
    // day 06 re-lands with doubled amounts; 05/07 untouched
    wh.insertOverwrite("d", "ev", events(("2024-01-06 12:00:00", 30L, 300.0)))
    val got = wh.read("d", "ev").orderBy("uid").collect()
    assert(got.length == 5)
    assert(got.map(_.getLong(1)).toSeq == Seq(1L, 2L, 4L, 5L, 30L))
    // partition dirs unchanged in count; day-06 entry path changed
    val parts = wh.log("d", "ev").latest.get.entries.map(_.partition).sorted
    assert(parts == Seq("2024-01-05", "2024-01-06", "2024-01-07"))
  }

  test("days(): zone maps prune day partitions on a source-column range") {
    val wh = freshWh()
    wh.overwrite("d", "ev", threeDays, dayMeta)
    val (scanned, total) = wh.scanFootprint("d", "ev",
      col("ts").between(lit("2024-01-06 00:00:00"), lit("2024-01-06 23:59:59")))
    assert(total >= 3, s"expected >=3 files, got $total")
    assert(scanned < total, s"range probe must prune: $scanned/$total")
  }

  test("days(): TTL expiry drops old derived partitions") {
    val wh = freshWh()
    wh.overwrite("d", "ev", threeDays,
      dayMeta.copy(partitionExpirationDays = Some(10)))
    val dropped = wh.expirePartitions("d", "ev",
      today = java.time.LocalDate.parse("2024-01-16"))
    assert(dropped == Seq("2024-01-05"))
    assert(wh.read("d", "ev").count() == 3L)
  }

  private val bucketMeta = TableMeta(
    partitionField = Some("p_b"), partitionType = "int64",
    partitionTransform = Some("bucket[8]"), partitionSource = Some("k"))

  private def keyed(n: Int): DataFrame =
    spark.range(n.toLong).select(col("id").as("k"),
      concat(lit("v"), col("id")).as("payload"))

  test("bucket[8]: equality probe on the source prunes to ONE bucket dir") {
    val wh = freshWh()
    wh.overwrite("d", "kv", keyed(400), bucketMeta)
    val entries = wh.log("d", "kv").latest.get.entries
    assert(entries.size == 8, s"expected 8 buckets, got ${entries.size}")
    // every key readable, equality ≡ filter
    val probe = wh.readWhere("d", "kv", col("k") === 137L)
    assert(probe.count() == 1L)
    assert(probe.head().getString(1) == "v137")
    val (scanned, total) = wh.scanFootprint("d", "kv", col("k") === 137L)
    assert(scanned * 8 <= total,
      s"bucket probe must open one bucket: $scanned/$total")
    // the JVM literal hash and the executor column hash agree: the kept
    // bucket really contains the key (count above proves no false prune)
  }

  test("bucket[8]: IN-list probe keeps the union of buckets; OR with another column keeps all") {
    val wh = freshWh()
    wh.overwrite("d", "kv", keyed(400), bucketMeta)
    val in = wh.readWhere("d", "kv", col("k").isin(3L, 77L, 205L))
    assert(in.count() == 3L)
    val (s1, t1) = wh.scanFootprint("d", "kv", col("k").isin(3L, 77L, 205L))
    assert(s1 < t1, s"IN probe should prune: $s1/$t1")
    // OR against an unbounded column: the TRANSFORM must not prune
    // (zone maps on payload may still refute some files — that's
    // theirs); correctness is the gate: both disjuncts' rows surface
    assert(wh.readWhere("d", "kv",
      col("k") === 3L || col("payload") === "v9").count() == 2L)
    // conjunction: either side may prune alone
    val (s3, t3) = wh.scanFootprint("d", "kv",
      col("k") === 3L && col("payload") === "v3")
    assert(s3 * 8 <= t3, s"AND keeps the equality prune: $s3/$t3")
  }

  test("bucket: string source; deleteWhere rewrites only the hit bucket") {
    val wh = freshWh()
    val m = TableMeta(partitionField = Some("p_b"), partitionType = "int64",
      partitionTransform = Some("bucket[4]"), partitionSource = Some("name"))
    val df = Seq(("alice", 1), ("bob", 2), ("carol", 3), ("dave", 4),
      ("erin", 5), ("frank", 6)).toDF("name", "x")
    wh.overwrite("d", "s", df, m)
    val res = wh.deleteWhere("d", "s", col("name") === "carol")
    assert(res.deletedRows == 1L)
    assert(res.rewritten.size == 1, s"one bucket rewritten: ${res.rewritten}")
    val left = wh.read("d", "s").select("name").as[String].collect().sorted
    assert(left.toSeq == Seq("alice", "bob", "dave", "erin", "frank"))
  }

  test("truncate[100] on a long key: layout clusters, range probes prune via zones") {
    val wh = freshWh()
    val m = TableMeta(partitionField = Some("p_t"), partitionType = "int64",
      partitionTransform = Some("truncate[100]"), partitionSource = Some("k"))
    wh.overwrite("d", "tr", keyed(1000), m)
    val parts = wh.log("d", "tr").latest.get.entries.map(_.partition).toSet
    assert(parts == (0 until 10).map(i => (i * 100).toString).toSet)
    val (scanned, total) = wh.scanFootprint("d", "tr",
      col("k").between(250L, 260L))
    assert(scanned < total, s"zone maps should prune truncate dirs: $scanned/$total")
    assert(wh.readWhere("d", "tr", col("k").between(250L, 260L)).count() == 11L)
  }

  test("mergeInto composes: upsert through a hidden bucket layout") {
    val wh = freshWh()
    wh.overwrite("d", "kv", keyed(40), bucketMeta)
    val src = Seq((7L, "UPDATED"), (1000L, "NEW")).toDF("k", "payload")
    val r = wh.mergeInto("d", "kv", src, keys = Seq("k"))
    assert(r.matchedRows == 1L)
    val got = wh.read("d", "kv")
    assert(got.count() == 41L)
    assert(got.filter(col("k") === 7L).head().getString(1) == "UPDATED")
    assert(got.filter(col("k") === 1000L).head().getString(1) == "NEW")
    assert(got.columns.toSeq == Seq("k", "payload"), "no synthetic leak via merge")
  }

  test("compact preserves a hidden layout and its pruning") {
    val wh = freshWh()
    wh.overwrite("d", "kv", keyed(100), bucketMeta)
    wh.mergeInto("d", "kv", Seq((2000L, "a"), (2001L, "b")).toDF("k", "payload"),
      keys = Seq("k"))
    wh.compact("d", "kv", targetBytes = 1L << 30)
    val got = wh.read("d", "kv")
    assert(got.count() == 102L)
    assert(got.columns.toSeq == Seq("k", "payload"))
    val (scanned, total) = wh.scanFootprint("d", "kv", col("k") === 55L)
    assert(scanned < total, s"post-compact probe still prunes: $scanned/$total")
    assert(wh.readWhere("d", "kv", col("k") === 55L).count() == 1L)
  }

  test("write-time validation is loud: bad source column, type, collision") {
    val wh = freshWh()
    // missing source column
    val e1 = intercept[IllegalArgumentException] {
      wh.overwrite("d", "x1", Seq((1L, "a")).toDF("id", "v"),
        dayMeta) // source 'ts' absent
    }
    assert(e1.getMessage.contains("ts"))
    // unsupported type for days()
    val e2 = intercept[IllegalArgumentException] {
      wh.overwrite("d", "x2", Seq((1L, "a")).toDF("ts", "v"), dayMeta)
    }
    assert(e2.getMessage.contains("days()"))
    // synthetic name shadowing a data column
    val e3 = intercept[IllegalArgumentException] {
      wh.overwrite("d", "x3",
        events(("2024-01-05 08:00:00", 1L, 1.0)).withColumn("p_day", lit(1)),
        dayMeta)
    }
    assert(e3.getMessage.contains("collides"))
    // UNIQUE key on a hidden table must contain the SOURCE column
    val e4 = intercept[IllegalArgumentException] {
      wh.overwrite("d", "x4", events(("2024-01-05 08:00:00", 1L, 1.0)),
        dayMeta.copy(uniqueKey = Seq("uid")))
    }
    assert(e4.getMessage.contains("ts"))
    // ...and passes when it does
    wh.overwrite("d", "x5", events(("2024-01-05 08:00:00", 1L, 1.0)),
      dayMeta.copy(uniqueKey = Seq("ts", "uid")))
    assert(wh.read("d", "x5").count() == 1L)
    // renaming the source column is refused
    val e5 = intercept[IllegalArgumentException] {
      wh.renameColumn("d", "x5", "ts", "ts2")
    }
    assert(e5.getMessage.contains("hidden partition"))
  }

  test("transform parse/render round-trips; dirValue mirrors expr for bucket") {
    for (s <- Seq("days", "months", "bucket[16]", "truncate[3]"))
      assert(PartitionTransform.parse(s).render == s)
    intercept[IllegalArgumentException](PartitionTransform.parse("hours"))
    // driver-side literal hash == executor-side column hash, both sources
    val t = PartitionTransform.Bucket(8)
    val zone = java.time.ZoneId.of("UTC")
    val viaExpr = Seq("alice", "bob", "42", "x").toDF("s")
      .select(t.expr(col("s"), org.apache.spark.sql.types.StringType, zone))
      .as[Long].collect().toSeq
    val viaJvm = Seq("alice", "bob", "42", "x").map(s =>
      t.dirValue(org.apache.spark.unsafe.types.UTF8String.fromString(s),
        org.apache.spark.sql.types.StringType, zone).get.toLong)
    assert(viaExpr == viaJvm)
    val le = Seq(42L, -7L, 0L).toDF("k")
      .select(t.expr(col("k"), org.apache.spark.sql.types.LongType, zone))
      .as[Long].collect().toSeq
    val lj = Seq(42L, -7L, 0L).map(v =>
      t.dirValue(java.lang.Long.valueOf(v),
        org.apache.spark.sql.types.LongType, zone).get.toLong)
    assert(le == lj)
  }

  test("months(): one dir per month, rendered as first-of-month") {
    val wh = freshWh()
    val m = dayMeta.copy(partitionTransform = Some("months"),
      partitionField = Some("p_mon"))
    wh.overwrite("d", "mv", events(
      ("2024-01-05 08:00:00", 1L, 1.0), ("2024-01-25 08:00:00", 2L, 2.0),
      ("2024-02-01 00:00:00", 3L, 3.0)), m)
    val parts = wh.log("d", "mv").latest.get.entries.map(_.partition).sorted
    assert(parts == Seq("2024-01-01", "2024-02-01"))
    assert(wh.read("d", "mv").count() == 3L)
  }
}
