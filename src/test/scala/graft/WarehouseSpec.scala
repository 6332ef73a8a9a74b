package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.{SnapshotLog, TableMeta, Warehouse}
import graft.materialize.Materialize
import graft.plans.RequirePartitionFilter

/** Warehouse layer: snapshot log, time travel, restore-of-deleted,
  * incremental overwrite, schema evolution, expiry, clustering, and the
  * require_partition_filter check rule. */
class WarehouseSpec extends AnyFunSuite {
  import TestSession._

  private def freshWh(): Warehouse =
    new Warehouse(spark, Files.createTempDirectory("wh_spec").toString)

  private def df(rows: (Int, String)*) = {
    import spark.implicits._
    rows.toDF("id", "v")
  }

  test("overwrite/read round-trip and dataset/table listing (S1/S2/S11)") {
    val wh = freshWh()
    wh.overwrite("raw", "t1", df(1 -> "a", 2 -> "b"))
    wh.overwrite("mart", "t2", df(3 -> "c"))
    assert(wh.listDatasets() === Seq("mart", "raw"))
    assert(wh.listTables("raw") === Seq("t1"))
    assert(wh.read("raw", "t1").orderBy("id").collect().map(_.getInt(0)).toSeq === Seq(1, 2))
  }

  test("time travel: readVersion and readAsOf honor the commit history (S9)") {
    val wh = freshWh()
    wh.overwrite("raw", "t", df(1 -> "a"))
    wh.overwrite("raw", "t", df(1 -> "a", 2 -> "b"))
    assert(wh.readVersion("raw", "t", 1).count() === 1)
    assert(wh.read("raw", "t").count() === 2)
    val ts1 = wh.log("raw", "t").commits.head.tsMillis
    assert(wh.readAsOf("raw", "t", ts1, nowMillis = ts1 + 1000).count() === 1)
    // outside the 7-day window → rejected (restore.py:60-70)
    assertThrows[IllegalArgumentException] {
      wh.readAsOf("raw", "t", ts1, nowMillis = ts1 + 8L * 24 * 3600 * 1000)
    }
  }

  test("restore-of-deleted works because the log outlives the table") {
    val wh = freshWh()
    wh.overwrite("raw", "gone", df(1 -> "a"))
    val ts = wh.log("raw", "gone").commits.head.tsMillis
    wh.drop("raw", "gone")
    assert(!wh.exists("raw", "gone"))
    assert(wh.listTables("raw").isEmpty)
    wh.restore("raw", "gone", ts, "raw", "recovered", nowMillis = ts + 1000)
    assert(wh.read("raw", "recovered").count() === 1)
  }

  test("copy clones data server-side (S8)") {
    val wh = freshWh()
    wh.overwrite("raw", "src", df(1 -> "a", 2 -> "b"),
      TableMeta(description = Some("d")))
    wh.copy("raw", "src", "mart", "dst")
    assert(wh.read("mart", "dst").count() === 2)
    assert(wh.meta("mart", "dst").description === Some("d"))
    wh.drop("raw", "src")
    assert(wh.read("mart", "dst").count() === 2) // independent of source
  }

  test("copy and restore preserve the hive partition layer of partitioned tables") {
    import spark.implicits._
    val wh = freshWh()
    val init = Seq(("2025-01-01", 1), ("2025-01-02", 2))
      .toDF("day", "n").withColumn("day", col("day").cast("date"))
    wh.overwrite("mart", "psrc", init,
      TableMeta(partitionField = Some("day"), partitionExpirationDays = Some(30)))
    // copy: the partition column must survive (partitionBy strips it from
    // the data files — the field=value dir name is the only source)
    wh.copy("mart", "psrc", "mart", "pdst")
    val copied = wh.read("mart", "pdst").orderBy("day")
      .collect().map(r => (r.getDate(0).toString, r.getInt(1))).toSeq
    assert(copied === Seq(("2025-01-01", 1), ("2025-01-02", 2)))
    assert(wh.meta("mart", "pdst").partitionField === Some("day"))
    assert(wh.meta("mart", "pdst").partitionExpirationDays === Some(30))
    // restore-of-deleted of a partitioned table
    val ts = wh.log("mart", "psrc").commits.head.tsMillis
    wh.drop("mart", "psrc")
    wh.restore("mart", "psrc", ts, "mart", "precov", nowMillis = ts + 1000)
    val recov = wh.read("mart", "precov").orderBy("day")
      .collect().map(r => (r.getDate(0).toString, r.getInt(1))).toSeq
    assert(recov === Seq(("2025-01-01", 1), ("2025-01-02", 2)))
    // incremental on the copy keeps working (entries point at real dirs)
    val incr = Seq(("2025-01-03", 3)).toDF("day", "n")
      .withColumn("day", col("day").cast("date"))
    wh.insertOverwrite("mart", "pdst", incr)
    assert(wh.read("mart", "pdst").count() === 3)
  }

  test("overwrite without meta preserves the existing TableMeta") {
    val wh = freshWh()
    wh.overwrite("raw", "keep", df(1 -> "a"),
      TableMeta(clusteringFields = Seq("id"), partitionExpirationDays = Some(7),
        description = Some("keep me")))
    wh.overwrite("raw", "keep", df(2 -> "b")) // no meta → keep current
    val m = wh.meta("raw", "keep")
    assert(m.clusteringFields === Seq("id"))
    assert(m.partitionExpirationDays === Some(7))
    assert(m.description === Some("keep me"))
  }

  test("schema rewrites carry over column descriptions (overwrite + insertOverwrite)") {
    import spark.implicits._
    val wh = freshWh()
    val init = Seq(("2025-01-01", 1)).toDF("day", "n")
      .withColumn("day", col("day").cast("date"))
    wh.overwrite("mart", "desc", init, TableMeta(partitionField = Some("day")))
    wh.setColumnDescriptions("mart", "desc", Map("n" -> "the count"))
    val incr = Seq(("2025-01-02", 2)).toDF("day", "n")
      .withColumn("day", col("day").cast("date"))
    wh.insertOverwrite("mart", "desc", incr)
    val afterIncr = wh.schema("mart", "desc")
    assert(afterIncr("n").metadata.getString("comment") === "the count")
    wh.overwrite("mart", "desc", init) // full refresh, no meta
    assert(wh.schema("mart", "desc")("n").metadata.getString("comment") === "the count")
  }

  test("insertOverwrite replaces only the partitions present in the frame") {
    import spark.implicits._
    val wh = freshWh()
    val init = Seq(("2025-01-01", 1), ("2025-01-02", 2))
      .toDF("day", "n").withColumn("day", col("day").cast("date"))
    wh.overwrite("mart", "daily", init, TableMeta(partitionField = Some("day")))
    val incr = Seq(("2025-01-02", 20), ("2025-01-03", 30))
      .toDF("day", "n").withColumn("day", col("day").cast("date"))
    wh.insertOverwrite("mart", "daily", incr)
    val got = wh.read("mart", "daily").orderBy("day")
      .collect().map(r => (r.getDate(0).toString, r.getInt(1))).toSeq
    assert(got === Seq(("2025-01-01", 1), ("2025-01-02", 20), ("2025-01-03", 30)))
    // history: v1 still readable (2 rows, day2=2)
    assert(wh.readVersion("mart", "daily", 1).count() === 2)
  }

  test("partition expiry drops partitions older than the TTL") {
    import spark.implicits._
    val wh = freshWh()
    val init = Seq(("2025-01-01", 1), ("2025-03-01", 2))
      .toDF("day", "n").withColumn("day", col("day").cast("date"))
    wh.overwrite("mart", "ttl", init,
      TableMeta(partitionField = Some("day"), partitionExpirationDays = Some(30)))
    val dropped = wh.expirePartitions("mart", "ttl",
      today = java.time.LocalDate.parse("2025-03-15"))
    assert(dropped === Seq("2025-01-01"))
    assert(wh.read("mart", "ttl").count() === 1)
  }

  test("vacuum reclaims fragments outside the retention window") {
    val wh = freshWh()
    wh.overwrite("raw", "v", df(1 -> "a"))
    wh.overwrite("raw", "v", df(2 -> "b"))
    val lg = wh.log("raw", "v")
    val removed = lg.vacuum(retainMillis = 0,
      nowMillis = System.currentTimeMillis() + 10000)
    assert(removed.nonEmpty)
    assert(wh.read("raw", "v").count() === 1) // latest commit survives
  }

  test("compact: appended fragments collapse to target-sized files; time travel survives") {
    val wh = freshWh()
    wh.overwrite("raw", "t", df(1 -> "a"))
    (2 to 6).foreach(i => wh.append("raw", "t", df(i -> "x")))
    val lg = wh.log("raw", "t")
    val before = lg.latest.get
    assert(before.entries.length === 6) // one fragment per append
    val compacted = wh.compact("raw", "t") // 128 MB target >> data: 1 file
    assert(compacted === Seq(""))
    val after = lg.latest.get
    assert(after.version === before.version + 1)
    assert(after.entries.length === 1)
    // same rows, one commit later
    assert(wh.read("raw", "t").orderBy("id").collect().map(_.getInt(0)).toSeq
      === (1 to 6))
    // pre-compaction version still reads: fragments are immutable, the
    // compaction commit references new files without deleting old ones
    assert(wh.readVersion("raw", "t", before.version)
      .orderBy("id").collect().map(_.getInt(0)).toSeq === (1 to 6))
    // already-compacted table: nothing to do, NO new commit
    assert(wh.compact("raw", "t") === Seq.empty)
    assert(lg.latest.get.version === after.version)
  }

  test("exportSymlinkManifest pins the current snapshot; manifest reader matches; re-export tracks compaction") {
    import scala.jdk.CollectionConverters._
    val wh = freshWh()
    wh.overwrite("raw", "t", df(1 -> "a"))
    (2 to 3).foreach(i => wh.append("raw", "t", df(i -> "x")))
    val out1 = Files.createTempDirectory("mani1").toString
    val m1 = wh.exportSymlinkManifest("raw", "t", out1)
    assert(m1.length === 1) // unpartitioned: one manifest
    val files1 = Files.readAllLines(m1.head).asScala.toSeq
    assert(files1.nonEmpty && files1.forall(_.endsWith(".parquet")))
    // an engine with no commit-log knowledge reads the EXACT snapshot
    val ext = spark.read.parquet(files1: _*)
    assert(ext.orderBy("id").collect().map(_.getInt(0)).toSeq === (1 to 3))
    // compaction rewrites; a fresh export follows the new commit while
    // the old manifest's files stay readable until vacuumed
    assert(wh.compact("raw", "t") === Seq(""))
    val out2 = Files.createTempDirectory("mani2").toString
    val files2 = Files.readAllLines(
      wh.exportSymlinkManifest("raw", "t", out2).head).asScala.toSeq
    assert(files2.toSet !== files1.toSet)
    assert(spark.read.parquet(files2: _*)
      .orderBy("id").collect().map(_.getInt(0)).toSeq === (1 to 3))
    assert(spark.read.parquet(files1: _*).count() === 3) // pre-vacuum pin
  }

  test("exportSymlinkManifest partitioned: one manifest per partition dir") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val wh = freshWh()
    val rows = (1 to 20).map(i =>
      (i, if (i % 2 == 0) "2024-01-01" else "2024-01-02"))
    wh.overwrite("raw", "t", rows.toDF("id", "day"),
      graft.core.TableMeta(partitionField = Some("day")))
    val out = Files.createTempDirectory("mani3")
    val ms = wh.exportSymlinkManifest("raw", "t", out.toString)
    assert(ms.map(_.getParent.getFileName.toString).sorted ===
      Seq("2024-01-01", "2024-01-02"))
    // per-partition manifests reference only that partition's rows
    val evens = Files.readAllLines(
      out.resolve("2024-01-01").resolve("manifest")).asScala.toSeq
    assert(spark.read.parquet(evens: _*)
      .collect().map(_.getInt(0)).forall(_ % 2 == 0))
  }

  test("maintainDataset sweeps every table: compaction + vacuum, data intact") {
    val wh = freshWh()
    for (t <- Seq("t1", "t2")) {
      wh.overwrite("raw", t, df(1 -> "a"))
      (2 to 4).foreach(i => wh.append("raw", t, df(i -> "x")))
    }
    // retention 0 and a future 'now' via the per-table vacuum contract is
    // not reachable through the sweep (it passes wall-clock now), so give
    // fragments a moment to age under a tiny retention window instead
    Thread.sleep(10)
    val reports = wh.maintainDataset("raw", retainMillis = 1)
      .sortBy(_.table)
    assert(reports.map(_.table) === Seq("t1", "t2"))
    reports.foreach { r =>
      assert(r.compactedPartitions === Seq("")) // unpartitioned: one group
      assert(r.vacuumedFragments > 0) // pre-compaction fragments reclaimed
      assert(r.expiredPartitions === Seq.empty) // no expiration policy set
    }
    for (t <- Seq("t1", "t2"))
      assert(wh.read("raw", t).orderBy("id").collect().map(_.getInt(0)).toSeq
        === (1 to 4))
    // second sweep: nothing left to compact, sweep still reports cleanly
    val again = wh.maintainDataset("raw", retainMillis = 1)
    assert(again.forall(_.compactedPartitions.isEmpty))
  }

  test("compact partitioned: multi-file partitions collapse; hive layer and untouched partitions survive") {
    import spark.implicits._
    val wh = freshWh()
    // disable AQE so the rebalance write fans one partition's rows across
    // several shuffle tasks -> several files per partition dir (the shape
    // a 1000-task production job writes and compaction exists to fix)
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val shuf = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      val rows = (1 to 40).map(i => (i, if (i % 2 == 0) "2024-01-01" else "2024-01-02"))
      wh.overwrite("raw", "t", rows.toDF("id", "day"),
        graft.core.TableMeta(partitionField = Some("day")))
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.shuffle.partitions", shuf)
    }
    val lg = wh.log("raw", "t")
    def filesOf(part: String): Int = {
      val e = lg.latest.get.entries.find(_.partition == part).get
      import scala.jdk.CollectionConverters._
      val root = java.nio.file.Paths.get(wh.root).resolve("raw").resolve("t").resolve(e.path)
      java.nio.file.Files.walk(root).iterator().asScala
        .count(p => p.getFileName.toString.endsWith(".parquet"))
    }
    assert(filesOf("2024-01-01") > 1, "fixture failed to produce a multi-file partition")
    val compacted = wh.compact("raw", "t")
    assert(compacted.toSet === Set("2024-01-01", "2024-01-02"))
    assert(filesOf("2024-01-01") === 1)
    // the hive partition layer survives: partition column re-attaches and
    // partition-pruned reads still resolve
    val byDay = wh.read("raw", "t").groupBy("day").count()
      .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap
    assert(byDay === Map("2024-01-01" -> 20L, "2024-01-02" -> 20L))
    assert(wh.readPartitions("raw", "t", Seq("2024-01-01")).count() === 20L)
  }

  test("compact: a group superseded mid-compaction is abandoned — survivors-only return, orphans cleaned") {
    import spark.implicits._
    val wh = freshWh()
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val shuf = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      val rows = (1 to 40).map(i => (i, if (i % 2 == 0) "2024-01-01" else "2024-01-02"))
      wh.overwrite("raw", "t", rows.toDF("id", "day"),
        graft.core.TableMeta(partitionField = Some("day")))
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.shuffle.partitions", shuf)
    }
    val lg = wh.log("raw", "t")
    val v1 = lg.latest.get
    val td = java.nio.file.Paths.get(wh.root).resolve("raw").resolve("t")
    // pre-stage the concurrent writer's replacement fragment for day 1
    // (data file excludes the hive partition column, like any writer)
    val rFrag = lg.newFragmentDir()
    Seq(101).toDF("id").coalesce(1).write
      .parquet(rFrag.resolve("day=2024-01-01").toString)
    val dataDir = td.resolve("_data")
    import scala.jdk.CollectionConverters._
    def dirs(): Set[String] = Files.list(dataDir).iterator().asScala
      .map(_.getFileName.toString).toSet
    val known = dirs()
    val rEntry = SnapshotLog.Entry("2024-01-01",
      td.relativize(rFrag.resolve("day=2024-01-01")).toString)
    // the racer lands its day-1 rewrite as soon as compact's output
    // fragment dir appears — i.e. between compact's plan and its commit
    @volatile var raced = false
    val racer = new Thread(() => {
      while (dirs() == known) Thread.sleep(1)
      lg.commit("write",
        v1.entries.filterNot(_.partition == "2024-01-01") :+ rEntry)
      raced = true
    })
    racer.setDaemon(true)
    racer.start()
    val compacted = wh.compact("raw", "t")
    racer.join(20000)
    assert(raced, "racer never landed — compact created no new fragment dir?")
    // the superseded group is NOT reported compacted (callers may retry it)
    assert(compacted === Seq("2024-01-02"))
    // day 1 serves the racer's data — the stale compaction never lands
    assert(wh.read("raw", "t").filter(col("day") === "2024-01-01")
      .select("id").collect().map(_.getInt(0)).toSeq === Seq(101))
    assert(wh.read("raw", "t").filter(col("day") === "2024-01-02").count() === 20)
    // and the abandoned group's freshly written files were cleaned up:
    // every parquet under _data is referenced by SOME commit, so vacuum's
    // retention accounting sees everything
    val allRefs = lg.commits.flatMap(_.entries.map(_.path)).toSet
    val orphans = Files.walk(dataDir).iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(".parquet"))
      .filter { p =>
        val rel = td.relativize(p)
        !allRefs.exists(r => rel.startsWith(java.nio.file.Paths.get(r)))
      }.toSeq
    assert(orphans.isEmpty, s"unreferenced compaction leftovers: $orphans")
  }

  test("compact preserves additively-evolved schemas (pad-on-read survives the rewrite)") {
    import spark.implicits._
    val wh = freshWh()
    wh.overwrite("raw", "t", df(1 -> "a"))
    wh.append("raw", "t", Seq((2, "b", 9L)).toDF("id", "v", "extra"))
    val compacted = wh.compact("raw", "t")
    assert(compacted === Seq(""))
    val got = wh.read("raw", "t").orderBy("id")
      .collect().map(r => (r.getInt(0), r.getAs[Any]("extra"))).toSeq
    assert(got === Seq((1, null), (2, 9L))) // padded null materialized, not lost
  }

  test("recluster rewrites ordered by clustering columns") {
    import spark.implicits._
    val wh = freshWh()
    val data = Seq((3, "c"), (1, "a"), (2, "b")).toDF("k", "v")
    wh.overwrite("mart", "cl", data, TableMeta(clusteringFields = Seq("k")))
    wh.recluster("mart", "cl")
    assert(wh.read("mart", "cl").count() === 3)
    assert(wh.log("mart", "cl").latest.get.version === 2)
  }

  test("incremental materialization evolves schema additively (append_new_columns)") {
    import spark.implicits._
    val wh = freshWh()
    val mat = new Materialize(wh)
    val v1 = Seq(("2025-01-01", 1)).toDF("day", "a")
      .withColumn("day", col("day").cast("date"))
    mat.incremental("mart", "ev", v1, partitionField = "day")
    val v2 = Seq(("2025-01-02", 2, "x")).toDF("day", "a", "b")
      .withColumn("day", col("day").cast("date"))
    mat.incremental("mart", "ev", v2)
    val out = wh.read("mart", "ev")
    assert(out.schema.fieldNames.toSet === Set("day", "a", "b"))
    val jan1 = out.filter(col("day") === "2025-01-01").head()
    assert(jan1.getAs[String]("b") === null) // old partition gains null column
  }

  test("append evolves unpartitioned schema additively; no fragment's values are lost") {
    import spark.implicits._
    val wh = freshWh()
    wh.overwrite("ops", "apev", Seq((1L, "a")).toDF("id", "v"))
    wh.append("ops", "apev", Seq((2L, "b")).toDF("id", "v"))
    // evolution append: new column w arrives in the THIRD fragment only —
    // schema inference over multiple fragments must not pick a narrow
    // footer and null out w (pad-on-read must go per-fragment)
    wh.append("ops", "apev", Seq((3L, "c", "W3")).toDF("id", "v", "w"))
    val out = wh.read("ops", "apev")
    assert(out.schema.fieldNames.toSeq === Seq("id", "v", "w"))
    val rows = out.collect().map(r =>
      r.getLong(0) -> ((r.getString(1), r.getAs[String]("w")))).toMap
    assert(rows === Map(1L -> (("a", null)), 2L -> (("b", null)),
      3L -> (("c", "W3"))))
  }

  test("additive evolution is metadata-only: zero pre-existing data files touched") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val wh = freshWh()
    val mat = new Materialize(wh)
    val v1 = Seq(("2025-01-01", 1), ("2025-01-02", 2)).toDF("day", "a")
      .withColumn("day", col("day").cast("date"))
    mat.incremental("mart", "evm", v1, partitionField = "day")
    def dataFiles(): Map[String, java.nio.file.attribute.FileTime] = {
      val data = java.nio.file.Paths.get(wh.root, "mart", "evm", "_data")
      Files.walk(data).iterator().asScala
        .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
        .map(p => p.toString -> Files.getLastModifiedTime(p)).toMap
    }
    val before = dataFiles()
    // evolution batch: new column b, only the 2025-01-03 partition
    val v2 = Seq(("2025-01-03", 3, "x")).toDF("day", "a", "b")
      .withColumn("day", col("day").cast("date"))
    mat.incremental("mart", "evm", v2)
    val after = dataFiles()
    // every pre-existing file survives byte-identical (same mtime, no rewrite)
    before.foreach { case (path, mtime) =>
      assert(after.contains(path), s"evolution deleted pre-existing file $path")
      assert(after(path) === mtime, s"evolution rewrote pre-existing file $path")
    }
    assert(after.size > before.size) // only the new partition's files were added
    // pad-on-read: old partitions serve the union schema with typed nulls
    val out = wh.read("mart", "evm")
    assert(out.schema.fieldNames.toSeq === Seq("day", "a", "b"))
    assert(out.filter(col("day") === "2025-01-01").head().getAs[String]("b") === null)
    assert(out.filter(col("day") === "2025-01-03").head().getAs[String]("b") === "x")
    // time travel to the pre-evolution commit serves the OLD schema
    val old = wh.readVersion("mart", "evm", 1)
    assert(old.schema.fieldNames.toSeq === Seq("day", "a"))
  }

  test("scd2 collapses unchanged runs and tracks validity intervals") {
    import spark.implicits._
    val wh = freshWh()
    val mat = new Materialize(wh)
    val snap = Seq(
      (1, 1L, "A"), (1, 2L, "A"), (1, 3L, "B"), (2, 1L, "C")
    ).toDF("pk", "seq", "status")
    val hist = mat.scd2Frame(snap, pk = Seq("pk"), orderCol = "seq",
      tracked = Seq("status"))
    val rows = hist.orderBy("pk", "valid_from")
      .select("pk", "status", "valid_from", "valid_to", "is_current")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getBoolean(4))).toSeq
    assert(rows === Seq(
      (1, "A", 1L, Some(3L), false),
      (1, "B", 3L, None, true),
      (2, "C", 1L, None, true)))
  }

  test("scd2 merge rewrites only touched pk buckets and equals a full rebuild") {
    import spark.implicits._
    val wh = freshWh()
    val mat = new Materialize(wh)
    val all = Seq(
      (1, 1L, "A"), (1, 2L, "A"), (1, 3L, "B"), (2, 1L, "C"),
      (1, 5L, "C"), (3, 4L, "X"), (3, 6L, "X"), (3, 7L, "Y")
    ).toDF("pk", "seq", "status")
    val batch1 = all.filter(col("seq") <= 3)
    val batch2 = all.filter(col("seq") > 3)
    mat.scd2("mart", "hist", batch1, pk = Seq("pk"), orderCol = "seq",
      tracked = Seq("status"), buckets = 8)
    val v1Entries = wh.log("mart", "hist").latest.get.entries
    mat.scd2("mart", "hist", batch2, pk = Seq("pk"), orderCol = "seq",
      tracked = Seq("status"), buckets = 8)
    val v2Entries = wh.log("mart", "hist").latest.get.entries
    // the merged history equals an scd2 build over the full stream
    val got = wh.read("mart", "hist")
      .select("pk", "status", "valid_from", "valid_to", "is_current")
      .orderBy("pk", "valid_from").collect().toSeq
    val want = mat.scd2Frame(all, pk = Seq("pk"), orderCol = "seq",
      tracked = Seq("status"))
      .select("pk", "status", "valid_from", "valid_to", "is_current")
      .orderBy("pk", "valid_from").collect().toSeq
    assert(got === want)
    // partition-scoped: buckets whose keys batch2 didn't touch keep their
    // ORIGINAL fragment paths in the merge commit (metadata carry-over,
    // no rewrite); touched buckets point at new fragments
    val bucketOf = Seq(1, 2, 3).toDF("pk")
      .select(col("pk"), pmod(xxhash64(col("pk")), lit(8)).cast("int").as("b"))
      .collect().map(r => r.getInt(0) -> r.getInt(1).toString).toMap
    val touchedBuckets = Set(bucketOf(1), bucketOf(3)) // keys in batch2
    // guard the fixture's bucket layout: under a different hash/bucketing
    // both branches below could be silently vacuous (all buckets touched,
    // or key 2 colliding into a touched bucket)
    assert(!touchedBuckets(bucketOf(2)),
      s"fixture degenerate: key 2 (bucket ${bucketOf(2)}) collides with a touched bucket $touchedBuckets")
    assert(v2Entries.exists(e => touchedBuckets(e.partition)),
      "no touched bucket present in the merge commit")
    assert(v2Entries.exists(e => !touchedBuckets(e.partition)),
      "no untouched bucket present — carry-over path not exercised")
    val v1ByPart = v1Entries.map(e => e.partition -> e.path).toMap
    v2Entries.foreach { e =>
      if (touchedBuckets(e.partition))
        assert(!v1ByPart.get(e.partition).contains(e.path),
          s"touched bucket ${e.partition} was not rewritten")
      else
        assert(v1ByPart.get(e.partition).contains(e.path),
          s"untouched bucket ${e.partition} was rewritten")
    }
  }

  test("scd2 merge rejects out-of-order snapshots (monotone orderCol gate)") {
    import spark.implicits._
    val wh = freshWh()
    val mat = new Materialize(wh)
    // batch1 sees key 1 through seq 3 (seq 2 is a dropped value-duplicate
    // of the seq-1 change row); a late seq-1.5-style row must be refused —
    // the dropped duplicate that would re-assert A after it is gone, so a
    // merge would silently diverge from a full rebuild.
    val batch1 = Seq((1, 1L, "A"), (1, 2L, "A"), (1, 3L, "B"))
      .toDF("pk", "seq", "status")
    mat.scd2("mart", "hist", batch1, pk = Seq("pk"), orderCol = "seq",
      tracked = Seq("status"), buckets = 8)
    val late = Seq((1, 2L, "Z")).toDF("pk", "seq", "status")
    val ex = intercept[IllegalArgumentException] {
      mat.scd2("mart", "hist", late, pk = Seq("pk"), orderCol = "seq",
        tracked = Seq("status"), buckets = 8)
    }
    assert(ex.getMessage.contains("out-of-order"))
    // in-order rows at the boundary (> max seen) still merge fine
    mat.scd2("mart", "hist", Seq((1, 4L, "Z")).toDF("pk", "seq", "status"),
      pk = Seq("pk"), orderCol = "seq", tracked = Seq("status"), buckets = 8)
    val cur = wh.read("mart", "hist").filter(col("is_current"))
      .select("status").collect().map(_.getString(0)).toSeq
    assert(cur === Seq("Z"))
  }

  test("require_partition_filter check rule rejects unfiltered scans") {
    import spark.implicits._
    val wh = freshWh()
    val init = Seq(("2025-01-01", 1)).toDF("day", "n")
      .withColumn("day", col("day").cast("date"))
    wh.overwrite("mart", "guarded", init,
      TableMeta(partitionField = Some("day"), requirePartitionFilter = true))
    val tableDir = java.nio.file.Paths.get(wh.root, "mart", "guarded").toString
    RequirePartitionFilter.flagPath("file:" + tableDir, "day")
    try {
      val unfiltered = wh.read("mart", "guarded")
      val e = intercept[Exception] { unfiltered.collect() }
      assert(e.getMessage.contains("require_partition_filter"))
      // a filter on the partition column makes it legal
      assert(wh.read("mart", "guarded").filter(col("day") === "2025-01-01").count() === 1)
    } finally RequirePartitionFilter.clear()
  }

  test("streaming upsert: latest value wins, untouched day partitions keep fragments") {
    import spark.implicits._
    import graft.streaming.StreamingIncremental.upsertHourly
    val wh = freshWh()
    def batch(rows: (String, String, Long, Double)*) =
      rows.toSeq.toDF("hour", "event_type", "n", "sum_value")
        .withColumn("hour", col("hour").cast("timestamp"))
    // batch 1: two days
    upsertHourly(wh, "mart", "hourly", batch(
      ("2024-01-01 10:00:00", "click", 5L, 1.0),
      ("2024-01-02 10:00:00", "click", 7L, 2.0)))
    val v1 = wh.log("mart", "hourly").latest.get.entries
    // batch 2: updates day 2's window and adds a new key; day 1 untouched
    upsertHourly(wh, "mart", "hourly", batch(
      ("2024-01-02 10:00:00", "click", 9L, 3.0),
      ("2024-01-02 11:00:00", "view", 1L, 4.0)))
    val v2 = wh.log("mart", "hourly").latest.get.entries
    val out = wh.read("mart", "hourly")
      .select(col("hour").cast("string"), col("event_type"), col("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(out === Set(
      ("2024-01-01 10:00:00", "click", 5L),  // carried through untouched
      ("2024-01-02 10:00:00", "click", 9L),  // updated (latest wins)
      ("2024-01-02 11:00:00", "view", 1L)))  // new key in touched day
    val v1ByPart = v1.map(e => e.partition -> e.path).toMap
    assert(v2.find(_.partition == "2024-01-01").map(_.path) ===
      v1ByPart.get("2024-01-01"), "untouched day was rewritten")
    assert(v2.find(_.partition == "2024-01-02").exists(e =>
      !v1ByPart.get("2024-01-02").contains(e.path)), "touched day not rewritten")
    // empty batch is a no-op, not a failure
    upsertHourly(wh, "mart", "hourly", batch().filter(lit(false)))
    assert(wh.log("mart", "hourly").latest.get.entries === v2)
  }

  test("snapshot log commit versions are monotonic and readable") {
    val dir = Files.createTempDirectory("snap_spec")
    val lg = new SnapshotLog(dir)
    val c1 = lg.commit("write", Seq(SnapshotLog.Entry("", "_data/x")), tsMillis = 100)
    val c2 = lg.commit("write", Seq(SnapshotLog.Entry("", "_data/y")), tsMillis = 200)
    assert(c1.version === 1 && c2.version === 2)
    assert(lg.asOf(150).get.version === 1)
    assert(lg.asOf(250).get.version === 2)
    assert(lg.asOf(50).isEmpty)
  }

  test("asOf tolerates non-monotonic commit timestamps") {
    val dir = Files.createTempDirectory("snap_skew")
    val lg = new SnapshotLog(dir)
    lg.commit("write", Seq(SnapshotLog.Entry("", "_data/x")), tsMillis = 200)
    lg.commit("write", Seq(SnapshotLog.Entry("", "_data/y")), tsMillis = 100) // clock skew
    // v2 carries the earlier timestamp; a takeWhile would stop at v1=200>150
    // and miss it — the filter must find v2.
    assert(lg.asOf(150).get.version === 2)
    assert(lg.asOf(250).get.version === 2)
  }

  test("latest resolves via pointer + checkpoint tail without listing the log") {
    val dir = Files.createTempDirectory("snap_ptr")
    val lg = new SnapshotLog(dir)
    val n = SnapshotLog.CheckpointInterval + 5 // one checkpoint + a tail
    (1 to n).foreach(i =>
      lg.commit("write", Seq(SnapshotLog.Entry("", s"_data/v$i")), tsMillis = i * 100L))
    val logDir = dir.resolve("_log")
    assert(Files.readString(logDir.resolve(SnapshotLog.LatestPointer)).trim === n.toString)
    // Prove the happy path needs only pointer + the delta tail back to
    // the nearest CHECKPOINT (v20 is full state): delete every manifest
    // BEFORE the checkpoint — a listing-based latest would now fail;
    // the pointer + tail path must still serve the newest version.
    (1 until SnapshotLog.CheckpointInterval).foreach(i =>
      Files.delete(logDir.resolve(f"v$i%05d.manifest")))
    assert(lg.latest.get.version === n)
    // full-replace commits: the replayed state is exactly the newest entry
    assert(lg.latest.get.entries === Seq(SnapshotLog.Entry("", s"_data/v$n")),
      "tail replay over the checkpoint")
  }

  test("a stale or corrupt _latest pointer never loses commits") {
    val dir = Files.createTempDirectory("snap_stale")
    val lg = new SnapshotLog(dir)
    (1 to 4).foreach(i =>
      lg.commit("write", Seq(SnapshotLog.Entry("", s"_data/v$i")), tsMillis = i * 100L))
    val ptr = dir.resolve("_log").resolve(SnapshotLog.LatestPointer)
    // stale: a writer crashed after manifest v4 but before the pointer move
    Files.writeString(ptr, "2")
    assert(lg.latest.get.version === 4) // forward probe recovers
    // corrupt: fall back to the full listing
    Files.writeString(ptr, "not-a-version")
    assert(lg.latest.get.version === 4)
  }

  test("commitWith re-bases on a lost race instead of dropping the winner's state") {
    import SnapshotLog.Entry
    val dir = Files.createTempDirectory("snap_race")
    val lg = new SnapshotLog(dir)
    lg.commit("write", Seq(Entry("p1", "_data/a/d=p1")))
    // Writer A re-writes p1; mid-commit, writer B lands p2 and steals A's
    // version number. A must retry AND recompute from B's state, so p2
    // survives in A's final commit (the round-2 lost-update bug).
    var interleaved = false
    val result = lg.commitWith("write", cur => {
      if (!interleaved) {
        interleaved = true
        lg.commit("write", cur.get.entries :+ Entry("p2", "_data/b/d=p2"))
      }
      cur.map(_.entries).getOrElse(Seq.empty)
        .filterNot(_.partition == "p1") :+ Entry("p1", "_data/c/d=p1")
    })
    assert(result.version === 3)
    val parts = result.entries.map(e => e.partition -> e.path).toMap
    assert(parts("p2") === "_data/b/d=p2") // winner's partition kept
    assert(parts("p1") === "_data/c/d=p1") // loser's rewrite applied
  }

  test("snapshotDiff: added/removed/changed classified, unchanged absent") {
    val wh = freshWh()
    wh.overwrite("d", "t", df(1 -> "a", 2 -> "b", 3 -> "c"))
    wh.overwrite("d", "t", df(2 -> "b", 3 -> "CHANGED", 4 -> "d"))
    val got = wh.snapshotDiff("d", "t", 1, 2, Seq("id"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(got === Map(1 -> "removed", 3 -> "changed", 4 -> "added"))
    // identical versions diff to nothing
    assert(wh.snapshotDiff("d", "t", 2, 2, Seq("id")).count() === 0)
    // schema evolution across the pair is refused, not silently hashed
    import spark.implicits._
    wh.overwrite("d", "t",
      Seq((2, "b", true)).toDF("id", "v", "extra"))
    val ex = intercept[IllegalArgumentException] {
      wh.snapshotDiff("d", "t", 2, 3, Seq("id"))
    }
    assert(ex.getMessage.contains("schema evolution"))
  }

  test("q15_catalog golden output — exact rows, not just counts") {
    // The driver has no DuckDB analog for catalog state (q15 is its one
    // rows-only check), so the exact output is pinned HERE instead. The
    // golden is SF-independent: schemas and table metadata don't vary
    // with scale factor. If this fails after an intentional catalog
    // change, update the golden alongside the change.
    val got = graft.queries.EngineQueries.q15Catalog(spark, TestSession.sf)
      .orderBy("dataset", "table_name")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getString(3),
        r.getBoolean(4), r.getString(5), r.getString(6)))
      .toSeq
    // column counts are the FIXTURES.md schemas (+1 for orders' om
    // partition column), not full TPC-H
    assert(got === Seq(
      ("mart", "orders_by_month", 7, "om", true, "", ""),
      ("raw", "nation", 3, "", false, "n_regionkey", "tpch nation"),
      ("raw", "region", 2, "", false, "", "")))
  }

  test("changesBetween reads delete-side rows under the OLDER schema: dropped columns keep their values") {
    import spark.implicits._
    val wh = freshWh()
    wh.overwrite("d", "cdc", Seq((1, "keep-me")).toDF("id", "extra"))
    wh.overwrite("d", "cdc", Seq(2).toDF("id")) // column dropped at v2
    val rows = wh.changesBetween("d", "cdc", 1, 2).collect()
    val del = rows.find(r => r.getAs[String]("_change_type") == "delete").get
    // the deleted row must be reconstructable AS IT EXISTED at v1
    assert(del.getAs[Int]("id") === 1)
    assert(del.getAs[String]("extra") === "keep-me",
      "delete side read under the newer schema loses dropped columns")
    val ins = rows.find(r => r.getAs[String]("_change_type") == "insert").get
    assert(ins.getAs[Int]("id") === 2 && ins.getAs[String]("extra") == null)
  }

  test("1k commits: delta manifests keep commit IO O(changed partitions); log bounded; time travel + vacuum intact") {
    // Drive the log directly (no Spark writes — this measures MANIFEST
    // IO, the thing that must not scale with table size). The table
    // accumulates 1000 fragments; each commit touches ONE.
    val td = Files.createTempDirectory("snap_ckpt")
    val lg = new SnapshotLog(td)
    var entries = Seq.empty[SnapshotLog.Entry]
    for (i <- 1 to 1000) {
      entries = entries :+ SnapshotLog.Entry(s"p$i", s"_data/f$i")
      lg.commit("write", entries, tsMillis = 1000L + i)
    }
    val logDir = td.resolve("_log")
    import scala.jdk.CollectionConverters._
    val sizes = Files.list(logDir).iterator().asScala.toSeq
      .filter(_.getFileName.toString.endsWith(".manifest"))
      .map(f => f.getFileName.toString -> Files.size(f)).sortBy(_._1)
    assert(sizes.size === 1000)
    // delta manifests stay O(1 changed entry) no matter how many
    // fragments the table holds: the LAST delta (999 fragments of
    // context) must be no bigger than a small constant, while the last
    // CHECKPOINT carries the full state
    val deltaSizes = sizes.zipWithIndex
      .collect { case ((_, s), i) if (i + 1) % SnapshotLog.CheckpointInterval != 0 && i > 0 => s }
    assert(deltaSizes.max < 200,
      s"a delta manifest scaled with table size: max ${deltaSizes.max} bytes")
    // total log bytes are bounded by checkpoints (50 of them), not
    // 1000 full states: full-state-per-commit would be ~25x this
    val totalLog = sizes.map(_._2).sum
    val lastCheckpoint = sizes((1000 / SnapshotLog.CheckpointInterval) *
      SnapshotLog.CheckpointInterval - 1)._2
    assert(totalLog < 60L * lastCheckpoint,
      s"log grew like full-state-per-commit: $totalLog bytes")
    // resolution correctness across checkpoint + tail
    assert(lg.latest.get.version === 1000)
    assert(lg.latest.get.entries.size === 1000)
    assert(lg.version(777).get.entries.size === 777, "mid-tail time travel")
    assert(lg.version(777).get.entries.map(_.path).toSet ===
      (1 to 777).map(i => s"_data/f$i").toSet)
    assert(lg.asOf(1500L).get.version === 500)
    // vacuum keeps the suffix readable: the boundary survivor is
    // re-checkpointed before its delta ancestry disappears
    lg.vacuum(retainMillis = 10L, nowMillis = 1995L) // cutoff ts=1985 -> keep v985+
    val after = lg.commits
    assert(after.head.version === 985 && after.last.version === 1000)
    assert(after.head.entries.size === 985, "boundary survivor must resolve standalone")
    assert(lg.version(992).get.entries.size === 992, "post-vacuum delta tail resolves")
  }

  test("renameColumn is metadata-only: mixed-generation fragments unify under the new name; time travel keeps old names") {
    import spark.implicits._
    val wh = freshWh()
    wh.overwrite("d", "rn", Seq((1, "a")).toDF("id", "v"))
    wh.append("d", "rn", Seq((2, "b")).toDF("id", "v"))
    val fragsBefore = wh.log("d", "rn").latest.get.entries.map(_.path).toSet
    wh.renameColumn("d", "rn", "v", "val")
    // metadata-only: no fragment rewritten by the rename itself
    assert(wh.log("d", "rn").latest.get.entries.map(_.path).toSet === fragsBefore)
    wh.append("d", "rn", Seq((3, "c")).toDF("id", "val"))
    // current read: old- and new-named fragments unify under `val`
    val cur = wh.read("d", "rn")
    assert(cur.columns.toSeq === Seq("id", "val"))
    assert(cur.orderBy("id").collect().map(r => (r.getInt(0), r.getString(1))).toSeq
      === Seq((1, "a"), (2, "b"), (3, "c")))
    // time travel to a pre-rename version serves the OLD name
    val v2 = wh.readVersion("d", "rn", 2)
    assert(v2.columns.toSeq === Seq("id", "v"))
    assert(v2.count() === 2)
    // predicates on the renamed column reach pre-rename rows
    assert(wh.readWhere("d", "rn", col("val") === "a").count() === 1)
    val del = wh.deleteWhere("d", "rn", col("val") === "a")
    assert(del.deletedRows === 1)
    assert(wh.read("d", "rn").orderBy("id").collect().map(_.getString(1)).toSeq
      === Seq("b", "c"))
    // compaction migrates physical names; reads stay identical
    wh.compact("d", "rn")
    assert(wh.read("d", "rn").orderBy("id").collect().map(_.getString(1)).toSeq
      === Seq("b", "c"))
    // chained rename: val -> w composes over all generations
    wh.renameColumn("d", "rn", "val", "w")
    assert(wh.read("d", "rn").columns.toSeq === Seq("id", "w"))
    // guard rails
    intercept[IllegalArgumentException] {
      wh.renameColumn("d", "rn", "nope", "x")
    }
    intercept[IllegalArgumentException] {
      wh.renameColumn("d", "rn", "w", "id") // collision
    }
  }

  test("chained renames compose WITHOUT compact: uncompacted fragments keep their values under the final name") {
    import spark.implicits._
    val wh = freshWh()
    // three generations of physical names, never compacted
    wh.overwrite("d", "rc", Seq((1, "alpha")).toDF("id", "v"))
    wh.renameColumn("d", "rc", "v", "val")
    wh.append("d", "rc", Seq((2, "beta")).toDF("id", "val"))
    wh.renameColumn("d", "rc", "val", "w")
    wh.append("d", "rc", Seq((3, "gamma")).toDF("id", "w"))
    // current read: all three fragments unify under w with VALUES intact
    // (the mid-chain link v→val must still apply even though `val` is no
    // longer in the current schema)
    val cur = wh.read("d", "rc").orderBy("id")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(cur === Seq((1, "alpha"), (2, "beta"), (3, "gamma")))
    // predicate on the final name reaches the oldest physical generation
    assert(wh.readWhere("d", "rc", col("w") === "alpha").count() === 1)
    // time travel pinned MID-chain serves that commit's own name + values
    val mid = wh.readVersion("d", "rc", 3) // after v→val + append beta
    assert(mid.columns.toSeq === Seq("id", "val"))
    assert(mid.orderBy("id").collect().map(_.getString(1)).toSeq
      === Seq("alpha", "beta"))
    // and pinned PRE-chain serves the original name + values
    val pre = wh.readVersion("d", "rc", 1)
    assert(pre.columns.toSeq === Seq("id", "v"))
    assert(pre.collect().map(_.getString(1)).toSeq === Seq("alpha"))
  }

  test("chained renames compose without compact on a PARTITIONED table") {
    import spark.implicits._
    val wh = freshWh()
    wh.overwrite("d", "rcp",
      Seq((1, "2024-01-01", 5)).toDF("id", "day", "n"),
      TableMeta(partitionField = Some("day"), partitionType = "string"))
    wh.renameColumn("d", "rcp", "n", "amount")
    wh.insertOverwrite("d", "rcp", Seq((2, "2024-01-02", 7)).toDF("id", "day", "amount"))
    wh.renameColumn("d", "rcp", "amount", "cents")
    wh.insertOverwrite("d", "rcp", Seq((3, "2024-01-03", 9)).toDF("id", "day", "cents"))
    val got = wh.read("d", "rcp").orderBy("id")
      .collect().map(r => (r.getAs[Int]("id"), r.getAs[Int]("cents"))).toSeq
    assert(got === Seq((1, 5), (2, 7), (3, 9)))
    // pruned read through the chain keeps values too
    assert(wh.readWhere("d", "rcp", col("day") === "2024-01-01")
      .collect().map(_.getAs[Int]("cents")).toSeq === Seq(5))
  }

  test("renameColumn on a partitioned table (non-partition column); partition column refuses") {
    import spark.implicits._
    val wh = freshWh()
    wh.overwrite("d", "rp",
      Seq((1, "2024-01-01", 5), (2, "2024-01-02", 7)).toDF("id", "day", "n"),
      TableMeta(partitionField = Some("day"), partitionType = "string"))
    wh.renameColumn("d", "rp", "n", "amount")
    wh.insertOverwrite("d", "rp",
      Seq((3, "2024-01-03", 9)).toDF("id", "day", "amount"))
    val got = wh.read("d", "rp").orderBy("id")
      .collect().map(r => (r.getAs[Int]("id"), r.getAs[Int]("amount"))).toSeq
    assert(got === Seq((1, 5), (2, 7), (3, 9)))
    intercept[IllegalArgumentException] {
      wh.renameColumn("d", "rp", "day", "dt")
    }
  }

  test("NOT NULL + CHECK constraints enforce at every write path; rejected fragments leave no orphans") {
    import spark.implicits._
    val wh = freshWh()
    val m = TableMeta(
      notNullColumns = Seq("v"),
      checkConstraints = Seq("positive_id" -> "id > 0"))
    wh.overwrite("d", "ct", Seq((1, "a"), (2, "b")).toDF("id", "v"), m)
    // constraints round-trip through the metadata sidecar
    assert(wh.meta("d", "ct").notNullColumns === Seq("v"))
    assert(wh.meta("d", "ct").checkConstraints === Seq("positive_id" -> "id > 0"))
    // NOT NULL violation on append: loud, names the constraint, cleans up
    val e1 = intercept[IllegalArgumentException] {
      wh.append("d", "ct", Seq((3, Option.empty[String])).toDF("id", "v"))
    }
    assert(e1.getMessage.contains("NOT NULL v"), e1.getMessage)
    // CHECK violation on append
    val e2 = intercept[IllegalArgumentException] {
      wh.append("d", "ct", Seq((-5, Some("x"))).toDF("id", "v"))
    }
    assert(e2.getMessage.contains("positive_id"), e2.getMessage)
    // CHECK over a NULL operand is UNKNOWN = satisfied (SQL semantics):
    // null id passes the CHECK (only FALSE violates)
    wh.append("d", "ct", Seq((Option.empty[Int], Some("ok"))).toDF("id", "v"))
    // mergeInto source is gated too
    val e3 = intercept[IllegalArgumentException] {
      wh.mergeInto("d", "ct", Seq((0, "zero")).toDF("id", "v"), Seq("id"))
    }
    assert(e3.getMessage.contains("positive_id"), e3.getMessage)
    // nothing rejected left data or sidecars behind; valid rows intact
    assert(wh.orphanFiles("d", "ct", graceMillis = 0L).isEmpty)
    assert(wh.read("d", "ct").count() === 3)
    // a CHECK referencing a missing column rejects loudly, never silently
    wh.setMeta("d", "ct", m.copy(checkConstraints = Seq("bad" -> "no_such_col > 0")))
    intercept[IllegalArgumentException] {
      wh.append("d", "ct", Seq((9, Some("y"))).toDF("id", "v"))
    }
  }

  test("partitioned writes enforce constraints (insertOverwrite path)") {
    import spark.implicits._
    val wh = freshWh()
    val m = TableMeta(partitionField = Some("day"), partitionType = "string",
      checkConstraints = Seq("n_bounded" -> "n <= 100"))
    wh.overwrite("d", "pt",
      Seq((1, "2024-01-01", 5)).toDF("id", "day", "n"), m)
    val ex = intercept[IllegalArgumentException] {
      wh.insertOverwrite("d", "pt",
        Seq((2, "2024-01-02", 500)).toDF("id", "day", "n"))
    }
    assert(ex.getMessage.contains("n_bounded"), ex.getMessage)
    assert(wh.orphanFiles("d", "pt", graceMillis = 0L).isEmpty)
    assert(wh.read("d", "pt").count() === 1)
    wh.insertOverwrite("d", "pt", Seq((2, "2024-01-02", 7)).toDF("id", "day", "n"))
    assert(wh.read("d", "pt").count() === 2)
  }

  test("CHECK on a string partition column evaluates against the DECLARED type, not directory-value inference") {
    import spark.implicits._
    val wh = freshWh()
    // partition value '0042' would infer as BIGINT 42 from the directory
    // name on a bare read; the CHECK length(code) = 4 must see the
    // declared STRING ('0042' → 4), not '42' → 2
    val m = TableMeta(partitionField = Some("code"), partitionType = "string",
      checkConstraints = Seq("code_len" -> "length(code) = 4"))
    wh.overwrite("d", "cpt", Seq((1, "0042", 5)).toDF("id", "code", "n"), m)
    assert(wh.read("d", "cpt").count() === 1)
    wh.insertOverwrite("d", "cpt", Seq((2, "0007", 9)).toDF("id", "code", "n"))
    assert(wh.read("d", "cpt").count() === 2)
    // and a genuinely violating partition value still rejects loudly
    val ex = intercept[IllegalArgumentException] {
      wh.insertOverwrite("d", "cpt", Seq((3, "123", 1)).toDF("id", "code", "n"))
    }
    assert(ex.getMessage.contains("code_len"), ex.getMessage)
    assert(wh.orphanFiles("d", "cpt", graceMillis = 0L).isEmpty)
  }

  test("streaming sinks enforce write-time constraints: a violating micro-batch fails LOUDLY, table state unchanged") {
    import spark.implicits._
    val wh = freshWh()
    val m = TableMeta(notNullColumns = Seq("v"),
      checkConstraints = Seq("positive_id" -> "id > 0"))
    wh.overwrite("d", "sc", Seq((1, "seed")).toDF("id", "v"), m)
    val versionBefore = wh.log("d", "sc").latest.get.version
    // a REAL stream whose micro-batch violates the CHECK (id = -5):
    // the foreachBatch sink writes through the same gated append path,
    // so the batch must reject, the query must surface the failure, and
    // nothing may land (the r11 zone-map-sidecar gap, repeated for
    // constraints, is exactly what this pins)
    val srcDir = Files.createTempDirectory("sc_stream_src")
    Seq((-5, "bad"), (7, "ok")).toDF("id", "v")
      .write.mode("overwrite").parquet(srcDir.toString)
    val schema = spark.read.parquet(srcDir.toString).schema
    val ckpt = Files.createTempDirectory("sc_stream_ck").toString
    val q = spark.readStream.schema(schema).parquet(srcDir.toString)
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty) wh.append("d", "sc", batch)
      }.start()
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    assert(causes(ex).exists(_.getMessage != null) &&
      causes(ex).exists(c => Option(c.getMessage).exists(_.contains("positive_id"))),
      s"failure must name the violated constraint: ${ex.getMessage}")
    // nothing landed: version unchanged, no orphan fragment or sidecar
    assert(wh.log("d", "sc").latest.get.version === versionBefore)
    assert(wh.orphanFiles("d", "sc", graceMillis = 0L).isEmpty)
    assert(wh.read("d", "sc").collect().map(_.getInt(0)).toSeq === Seq(1))
    // and a CLEAN stream of the same shape lands fine through the gate
    val srcOk = Files.createTempDirectory("sc_stream_ok")
    Seq((2, "fine"), (3, "also")).toDF("id", "v")
      .write.mode("overwrite").parquet(srcOk.toString)
    val ckpt2 = Files.createTempDirectory("sc_stream_ck2").toString
    val q2 = spark.readStream.schema(schema).parquet(srcOk.toString)
      .writeStream
      .option("checkpointLocation", ckpt2)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty) wh.append("d", "sc", batch)
      }.start()
    q2.awaitTermination()
    assert(wh.read("d", "sc").orderBy("id").collect().map(_.getInt(0)).toSeq
      === Seq(1, 2, 3))
  }

  test("mergeInto NULL-key rejection leaves no orphan fragment or sidecar") {
    import spark.implicits._
    val wh = freshWh()
    wh.overwrite("d", "mk", Seq((1, "a")).toDF("id", "v"))
    val versionBefore = wh.log("d", "mk").latest.get.version
    intercept[IllegalArgumentException] {
      wh.mergeInto("d", "mk",
        Seq((Option.empty[Int], "bad")).toDF("id", "v"), Seq("id"))
    }
    assert(wh.log("d", "mk").latest.get.version === versionBefore)
    // grace = 0: anything uncommitted in the pool shows up immediately
    assert(wh.orphanFiles("d", "mk", graceMillis = 0L).isEmpty,
      "rejected merge must clean up its landed source fragment")
    assert(wh.read("d", "mk").collect().map(_.getInt(0)).toSeq === Seq(1))
  }

  test("history(): one row per commit, actions and mask counts exact") {
    import org.apache.spark.sql.functions._
    val wh = new Warehouse(spark, java.nio.file.Files.createTempDirectory("hist").toString)
    import spark.implicits._
    wh.overwrite("d", "t", Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    wh.append("d", "t", Seq((3L, "c")).toDF("id", "v"))
    wh.deleteWhereMor("d", "t", col("id") === 1L)
    wh.deleteWhere("d", "t", col("id") === 2L)
    val h = wh.history("d", "t").orderBy("version").collect()
    assert(h.map(_.getString(2)).toSeq == Seq("write", "append", "delete", "delete"))
    assert(h.map(_.getLong(4)).toSeq == Seq(0L, 0L, 1L, 0L),
      "the MoR commit carries exactly one masked entry")
    assert(h.forall(_.getBoolean(5)), "every commit pins a schema")
    assert(h.map(_.getInt(0)).toSeq == (1 to 4).toSeq)
  }
}
