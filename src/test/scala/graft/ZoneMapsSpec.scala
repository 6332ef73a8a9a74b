package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.{TableMeta, Warehouse, ZoneMaps}

/** Zone-map data skipping + row-level deleteWhere: write-time sidecar
  * stats, conservative may-match pruning, skip-read equivalence, and the
  * rewrite-only-hit-fragments delete contract. */
class ZoneMapsSpec extends AnyFunSuite {
  import TestSession._

  private def freshWh(): Warehouse =
    new Warehouse(spark, Files.createTempDirectory("zm_spec").toString)

  private def df(rows: (Int, String, String)*) = {
    import spark.implicits._
    rows.toDF("id", "grp", "v")
  }

  /** Three disjoint fragments keyed by grp: a / b / c. */
  private def threeFrags(wh: Warehouse): Unit = {
    wh.overwrite("raw", "t", df((1, "a", "x"), (2, "a", "y")))
    wh.append("raw", "t", df((10, "b", "x"), (11, "b", null)))
    wh.append("raw", "t", df((20, "c", "z"), (21, "c", "w")))
  }

  test("write paths record sidecars; planScan prunes fragments the range excludes") {
    val wh = freshWh()
    threeFrags(wh)
    val entries = wh.log("raw", "t").latest.get.entries
    assert(entries.size === 3)
    val td = Paths.get(wh.root, "raw", "t")
    entries.foreach(e => assert(ZoneMaps.read(td, e.path).isDefined,
      s"missing sidecar for ${e.path}"))

    // id ranges: [1,2] / [10,11] / [20,21]
    val (scanEq, prunedEq) = wh.planScan("raw", "t", col("id") === 10)
    assert(scanEq.size === 1 && prunedEq.size === 2)
    val (scanLt, prunedLt) = wh.planScan("raw", "t", col("id") < 3)
    assert(scanLt.size === 1 && prunedLt.size === 2)
    val (scanGe, _) = wh.planScan("raw", "t", col("id") >= 11)
    assert(scanGe.size === 2)
    // string equality on grp
    val (scanGrp, _) = wh.planScan("raw", "t", col("grp") === "b")
    assert(scanGrp.size === 1)
    // And narrows, Or widens
    assert(wh.planScan("raw", "t", col("id") > 5 && col("grp") === "a")._1.isEmpty)
    assert(wh.planScan("raw", "t", col("id") < 3 || col("grp") === "c")._1.size === 2)
    // IsNull: only the b fragment holds a null v
    assert(wh.planScan("raw", "t", col("v").isNull)._1.size === 1)
    // unsupported shape: never prunes
    assert(wh.planScan("raw", "t", length(col("v")) > 0)._1.size === 3)
  }

  test("readWhere equals read().filter() while opening fewer fragments") {
    val wh = freshWh()
    threeFrags(wh)
    val pred = col("id").between(10, 20)
    val got = wh.readWhere("raw", "t", pred).orderBy("id").collect().map(_.getInt(0)).toSeq
    val want = wh.read("raw", "t").filter(pred).orderBy("id").collect().map(_.getInt(0)).toSeq
    assert(got === want && got === Seq(10, 11, 20))
    assert(wh.planScan("raw", "t", pred)._1.size === 2)
  }

  test("mayMatch unit semantics: nulls, all-null columns, in/startsWith, literal sides") {
    import ZoneMaps.{ColStat, FragStats}
    val st = FragStats(10, Map(
      "n" -> ColStat(Some("5"), Some("20"), 0, "integer"),
      "s" -> ColStat(Some("apple"), Some("mango"), 2, "string"),
      "dead" -> ColStat(None, None, 10, "string"), // all-null column
      "blob" -> ColStat(None, None, 0, "string"))) // stats dropped by cap
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "n INT, s STRING, dead STRING, blob STRING, mystery INT")
    def may(c: org.apache.spark.sql.Column): Boolean =
      ZoneMaps.mayMatch(ZoneMaps.resolvePredicate(spark, schema, c).get, st)
    assert(may(col("n") === 7) && !may(col("n") === 21) && !may(col("n") === 4))
    assert(may(lit(6) < col("n")) && !may(lit(20) < col("n")) && may(lit(20) <= col("n")))
    assert(!may(col("n") > 20) && may(col("n") >= 20))
    assert(may(col("n").isin(1, 2, 20)) && !may(col("n").isin(1, 2, 99)))
    assert(!may(col("dead") === "x") && may(col("dead").isNull) && !may(col("dead").isNotNull))
    assert(may(col("blob") === "anything")) // capped stats stay scannable
    assert(may(col("s").startsWith("ap")) && may(col("s").startsWith("ma")) &&
      !may(col("s").startsWith("z")) && !may(col("s").startsWith("aa")))
    assert(!may(col("s").isNull.and(col("n") === 99)))
    // comparison with NULL literal is never TRUE
    assert(!may(col("n") === lit(null)))
    // unknown column: no stats, no pruning
    assert(may(col("mystery") === 1))
  }

  test("date-typed stats prune string-literal predicates (the DSL shape)") {
    val wh = freshWh()
    import spark.implicits._
    val d = Seq(("2024-01-05", 1), ("2024-01-20", 2)).toDF("ds", "n")
      .select(to_date(col("ds")).as("d"), col("n"))
    wh.overwrite("raw", "dt", d.filter(col("n") === 1))
    wh.append("raw", "dt", d.filter(col("n") === 2))
    assert(wh.planScan("raw", "dt", col("d") < "2024-01-10")._1.size === 1)
    assert(wh.planScan("raw", "dt", col("d") === "2024-01-20")._1.size === 1)
    assert(wh.readWhere("raw", "dt", col("d") < "2024-01-10").count() === 1)
  }

  test("deleteWhere rewrites ONLY hit fragments; clean entries keep their paths") {
    val wh = freshWh()
    threeFrags(wh)
    val before = wh.log("raw", "t").latest.get.entries.map(_.path)
    val r = wh.deleteWhere("raw", "t", col("id") === 11)
    assert(r.deletedRows === 1L)
    assert(r.pruned === 2 && r.cleanCandidates === 0)
    val after = wh.log("raw", "t").latest.get.entries.map(_.path)
    // the two untouched fragments ride into the new commit verbatim
    assert(before.toSet.intersect(after.toSet).size === 2)
    assert(wh.read("raw", "t").orderBy("id").collect().map(_.getInt(0)).toSeq ===
      Seq(1, 2, 10, 20, 21))
    // time travel: the pre-delete commit still serves all 6 rows
    assert(wh.readVersion("raw", "t", 3).count() === 6)
    // the rewritten fragment got its own sidecar → future scans still prune
    assert(wh.planScan("raw", "t", col("id") === 1)._1.size === 1)
  }

  test("deleteWhere keeps NULL-predicate rows (SQL DELETE semantics)") {
    val wh = freshWh()
    threeFrags(wh)
    // v = 'x' matches ids 1,10; v NULL on id 11 must survive
    val r = wh.deleteWhere("raw", "t", col("v") === "x")
    assert(r.deletedRows === 2L)
    assert(wh.read("raw", "t").orderBy("id").collect().map(_.getInt(0)).toSeq ===
      Seq(2, 11, 20, 21))
  }

  test("deleteWhere on a clean candidate set rewrites nothing") {
    val wh = freshWh()
    threeFrags(wh)
    val v3 = wh.log("raw", "t").latest.get.version
    // id=15 falls inside no fragment's range → all pruned, no commit
    val r0 = wh.deleteWhere("raw", "t", col("id") === 15)
    assert(r0.deletedRows === 0L && r0.rewritten.isEmpty && r0.pruned === 3)
    // v='zz' survives pruning on fragment c ([w,z]) but hits nothing:
    // candidate read happens, still no rewrite, no commit
    val r1 = wh.deleteWhere("raw", "t", col("v") === "y" && col("id") > 5)
    assert(r1.deletedRows === 0L && r1.rewritten.isEmpty)
    assert(wh.log("raw", "t").latest.get.version === v3, "clean delete must not commit")
  }

  test("partitioned deleteWhere drops fully-deleted partitions and keeps hive reads") {
    val wh = freshWh()
    import spark.implicits._
    val d = Seq((1, "2024-01-01", "a"), (2, "2024-01-01", "b"),
      (3, "2024-01-02", "c"), (4, "2024-01-03", "d"))
      .toDF("id", "ds", "v").select(col("id"), to_date(col("ds")).as("d"), col("v"))
    wh.overwrite("raw", "p", d, TableMeta(partitionField = Some("d")))
    val r = wh.deleteWhere("raw", "p", col("d") === "2024-01-02")
    assert(r.deletedRows === 1L && r.rewritten === Seq("2024-01-02"))
    val left = wh.read("raw", "p")
    assert(left.count() === 3)
    assert(left.select("d").distinct().count() === 2)
    assert(wh.log("raw", "p").latest.get.entries.map(_.partition).sorted ===
      Seq("2024-01-01", "2024-01-03"))
    // partial delete within one partition keeps the partition
    val r2 = wh.deleteWhere("raw", "p", col("id") === 1)
    assert(r2.deletedRows === 1L && r2.rewritten === Seq("2024-01-01"))
    assert(wh.read("raw", "p").orderBy("id").collect().map(_.getInt(0)).toSeq === Seq(2, 4))
  }

  test("readWhereVersion: time travel composes with data skipping") {
    val wh = freshWh()
    threeFrags(wh)
    wh.deleteWhere("raw", "t", col("id") === 10) // v4 rewrites the b fragment
    // the PRE-delete version still prunes on the immutable fragments'
    // zones and still serves the deleted row
    val got = wh.readWhereVersion("raw", "t", 3, col("id") === 10)
      .collect().map(_.getInt(0)).toSeq
    assert(got === Seq(10))
    // and the current version no longer has it, same pruned path
    assert(wh.readWhere("raw", "t", col("id") === 10).isEmpty)
  }

  test("analyze backfills sidecars for legacy fragments; missing sidecar never blocks reads") {
    val wh = freshWh()
    threeFrags(wh)
    val td = Paths.get(wh.root, "raw", "t")
    val entries = wh.log("raw", "t").latest.get.entries
    // simulate a legacy fragment: remove one sidecar
    Files.delete(ZoneMaps.statsPath(td, entries.head.path))
    // uncovered fragment is always scanned → results stay exact
    assert(wh.readWhere("raw", "t", col("id") === 10).count() === 1)
    assert(wh.planScan("raw", "t", col("id") === 10)._1.size === 2)
    val analyzed = wh.analyze("raw", "t")
    assert(analyzed === Seq(entries.head.path))
    assert(wh.planScan("raw", "t", col("id") === 10)._1.size === 1)
    assert(wh.analyze("raw", "t").isEmpty, "second analyze finds nothing to do")
  }

  test("long string stats are dropped (cap) but null counts still prune") {
    val wh = freshWh()
    import spark.implicits._
    val big = "x" * 200
    wh.overwrite("raw", "big", Seq((1, big), (2, big + "y")).toDF("id", "txt"))
    val td = Paths.get(wh.root, "raw", "big")
    val e = wh.log("raw", "big").latest.get.entries.head
    val st = ZoneMaps.read(td, e.path).get
    assert(st.cols("txt").min.isEmpty && st.cols("txt").max.isEmpty)
    assert(st.cols("txt").nulls === 0L)
    // value predicates cannot prune, null predicates can
    assert(wh.planScan("raw", "big", col("txt") === "nope")._1.size === 1)
    assert(wh.planScan("raw", "big", col("txt").isNull)._1.isEmpty)
  }

  test("file-level zones: a clustered rewrite prunes INSIDE one fragment") {
    val wh = freshWh()
    import spark.implicits._
    val df = (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    wh.overwrite("raw", "cl", df, graft.core.TableMeta(clusteringFields = Seq("id")))
    // tiny targetBytes forces several range files inside the one fragment
    wh.recluster("raw", "cl", targetBytes = 2L << 10)
    val entries = wh.log("raw", "cl").latest.get.entries
    assert(entries.size === 1, "recluster writes one fragment")
    val (scanned, total) = wh.scanFootprint("raw", "cl", col("id") === 500L)
    assert(total > 4, s"range write must produce several files, got $total")
    assert(scanned === 1L,
      s"a point predicate on the clustering key must open ONE file, opened $scanned")
    // the pruned read stays exact
    val got = wh.readWhere("raw", "cl", col("id").between(100, 110))
      .orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(got === (100L to 110L))
    val (s2, _) = wh.scanFootprint("raw", "cl", col("id").between(100, 110))
    assert(s2 <= 2, s"an 11-row range must stay within 2 clustered files, opened $s2")
  }

  test("file-level zones survive deleteWhere's count phase and partitioned reads") {
    val wh = freshWh()
    import spark.implicits._
    val d = (1 to 100).map(i => (i.toLong, if (i <= 50) "2024-01-01" else "2024-01-02"))
      .toDF("id", "ds").select(col("id"), to_date(col("ds")).as("d"))
    wh.overwrite("raw", "pf", d, graft.core.TableMeta(partitionField = Some("d")))
    // delete one id: candidate narrowing by partition + file zones
    val r = wh.deleteWhere("raw", "pf", col("id") === 60L)
    assert(r.deletedRows === 1L && r.rewritten === Seq("2024-01-02"))
    assert(wh.read("raw", "pf").count() === 99)
    // partitioned file-pruned read agrees with the full filter
    val got = wh.readWhere("raw", "pf", col("id") === 10L).collect()
    assert(got.length === 1 && got.head.getAs[Long]("id") === 10L)
  }

  test("mergeInto: updates replace, inserts land, clean fragments keep their paths") {
    val wh = freshWh()
    threeFrags(wh) // ids [1,2] / [10,11] / [20,21]
    import spark.implicits._
    val before = wh.log("raw", "t").latest.get.entries.map(_.path).toSet
    // source: update id 20 (new v), insert id 25 — bounds [20,25] prune
    // the first two fragments
    val src = df((20, "c", "UPDATED"), (25, "c", "new"))
    val r = wh.mergeInto("raw", "t", src, Seq("id"))
    assert(r.matchedRows === 1L && r.sourceRows === 2L && r.pruned === 2)
    val after = wh.log("raw", "t").latest.get.entries.map(_.path).toSet
    assert(before.intersect(after).size === 2, "untouched fragments ride through")
    val got = wh.read("raw", "t").orderBy("id")
      .collect().map(r => r.getInt(0) -> r.getString(2)).toMap
    assert(got(20) === "UPDATED" && got(25) === "new" && got(21) === "w")
    assert(got.keySet === Set(1, 2, 10, 11, 20, 21, 25))
    // pre-merge version intact (v3 = the three appends)
    assert(wh.readVersion("raw", "t", 3).count() === 6)
    // NULL source keys are rejected loudly
    assertThrows[IllegalArgumentException] {
      wh.mergeInto("raw", "t",
        Seq((None: Option[Int], "x", "y")).toDF("id", "grp", "v"), Seq("id"))
    }
    // merge whose keys match nothing: pure insert, no rewrite
    val r2 = wh.mergeInto("raw", "t", df((30, "d", "ins")), Seq("id"))
    assert(r2.matchedRows === 0L && r2.rewritten.isEmpty && r2.sourceRows === 1L)
    assert(wh.read("raw", "t").count() === 8)
  }

  test("partitioned mergeInto: updates land in their partitions, other partitions prune") {
    val wh = freshWh()
    import spark.implicits._
    val d = Seq((1, "2024-01-01", "a"), (2, "2024-01-01", "b"),
      (3, "2024-01-02", "c"), (4, "2024-01-03", "d"))
      .toDF("id", "ds", "v").select(col("id"), to_date(col("ds")).as("d"), col("v"))
    wh.overwrite("raw", "pm", d, graft.core.TableMeta(partitionField = Some("d")))
    // update id 3 (day 2) + insert id 9 into day 3
    val src = Seq((3, "2024-01-02", "UPD"), (9, "2024-01-03", "new"))
      .toDF("id", "ds", "v").select(col("id"), to_date(col("ds")).as("d"), col("v"))
    val r = wh.mergeInto("raw", "pm", src, Seq("id"))
    assert(r.matchedRows === 1L && r.sourceRows === 2L)
    val got = wh.read("raw", "pm").orderBy("id")
      .collect().map(x => x.getInt(0) -> x.getString(2)).toMap
    assert(got === Map(1 -> "a", 2 -> "b", 3 -> "UPD", 4 -> "d", 9 -> "new"))
    // partition integrity: hive reads still group correctly
    assert(wh.read("raw", "pm").filter(col("d") === "2024-01-03")
      .collect().map(_.getInt(0)).toSet === Set(4, 9))
    // pre-merge version intact
    assert(wh.readVersion("raw", "pm", 1).count() === 4)
  }

  test("stats recording is metadata-only: an append runs exactly the write job") {
    val wh = freshWh()
    import spark.implicits._
    wh.overwrite("raw", "jc", Seq((1, "a")).toDF("id", "v"))
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      wh.append("raw", "jc", Seq((2, "b")).toDF("id", "v"))
      // listener events are async; give the bus a moment to drain
      Thread.sleep(500)
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(jobs.get() === 1,
      s"append must cost ONE Spark job (the write) — zone maps come from footers, got ${jobs.get()}")
    // and the sidecar still landed
    val e = wh.log("raw", "jc").latest.get.entries
    val td = Paths.get(wh.root, "raw", "jc")
    assert(e.forall(x => ZoneMaps.read(td, x.path).isDefined))
  }

  test("z-order + file zones: a 2D box predicate opens a small minority of files") {
    val wh = freshWh()
    import spark.implicits._
    // 64x64 grid z-ordered into 16 range files = 16x16 tiles: every
    // file's (a, b) zones are tight boxes, so a 4x4 query box can only
    // touch the tiles it overlaps
    val grid = (0 until 64).flatMap(a => (0 until 64).map(b => (a.toLong, b.toLong)))
      .toDF("a", "b")
    val z = grid
      .withColumn("_z", graft.operators.ZOrder.zValue(col("a"), col("b")))
      .repartitionByRange(16, col("_z")).sortWithinPartitions(col("_z"))
      .drop("_z")
    wh.overwrite("raw", "z", z)
    val pred = col("a").between(10L, 13L) && col("b").between(20L, 23L)
    val (scanned, total) = wh.scanFootprint("raw", "z", pred)
    assert(total === 16L, s"expected 16 z-range files, got $total")
    assert(scanned <= 4L,
      s"a 4x4 box must open at most the 4 tiles it can straddle, opened $scanned")
    // and the pruned read is exact
    assert(wh.readWhere("raw", "z", pred).count() === 16L)
    // contrast: the same data written WITHOUT clustering barely prunes
    wh.overwrite("raw", "zr", grid.repartition(16))
    val (scannedR, totalR) = wh.scanFootprint("raw", "zr", pred)
    assert(totalR >= 8L && scannedR === totalR,
      s"hash layout has no locality to prune: $scannedR/$totalR")
  }

  test("metadata diagnostics: schemaDiff, rowCountHistory, orphan audit") {
    val wh = freshWh()
    import spark.implicits._
    wh.overwrite("raw", "md", Seq((1, "a")).toDF("id", "v"))
    wh.append("raw", "md", Seq((2, "b", 9L)).toDF("id", "v", "extra")) // additive evolution
    // schema diff across the evolution commit
    assert(wh.schemaDiff("raw", "md", 1, 2) === Seq(("extra", "added", "", "bigint")))
    assert(wh.schemaDiff("raw", "md", 2, 1) === Seq(("extra", "removed", "bigint", "")))
    // row counts straight from sidecars — no scan
    assert(wh.rowCountHistory("raw", "md") === Seq(1 -> Some(1L), 2 -> Some(2L)))
    // plant an orphan (a crashed writer's leftover fragment)
    val td = Paths.get(wh.root, "raw", "md")
    val stray = td.resolve("_data").resolve("deadbeef")
    Files.createDirectories(stray)
    Files.write(stray.resolve("part-0.parquet"), Array[Byte](1, 2, 3))
    // young files are grace-protected; aged ones report
    assert(wh.orphanFiles("raw", "md").isEmpty)
    val aged = wh.orphanFiles("raw", "md", graceMillis = -1)
    assert(aged === Seq("_data/deadbeef/part-0.parquet"))
    // refuse to delete referenced files; delete the true orphan
    val live = wh.log("raw", "md").latest.get.entries.head
    val livedir = td.resolve(live.path)
    val liveFile = {
      import scala.jdk.CollectionConverters._
      val w = Files.walk(livedir)
      try w.iterator().asScala.find(p => p.toString.endsWith(".parquet")).get
      finally w.close()
    }
    assertThrows[IllegalArgumentException] {
      wh.vacuumOrphans("raw", "md",
        Seq(td.relativize(liveFile).toString))
    }
    wh.vacuumOrphans("raw", "md", aged)
    assert(!Files.exists(stray.resolve("part-0.parquet")))
    assert(wh.read("raw", "md").count() === 2) // table untouched
  }

  test("stress: concurrent appenders all land; every row served, every sidecar written") {
    val wh = freshWh()
    import spark.implicits._
    wh.overwrite("raw", "cc", Seq((0, "seed", "s")).toDF("id", "grp", "v"))
    // 4 writers x 3 appends racing on the version number: commitWith
    // re-bases losers, so every append must land exactly once
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 4).map { t =>
      new Thread(() => {
        try (1 to 3).foreach { i =>
          val id = t * 100 + i
          wh.append("raw", "cc", Seq((id, s"t$t", s"v$id")).toDF("id", "grp", "v"))
        } catch { case e: Throwable => errs.add(e) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(120000))
    assert(errs.isEmpty, s"appenders must not fail: ${errs.peek()}")
    assert(wh.log("raw", "cc").latest.get.version === 13, "12 appends + seed")
    val got = wh.read("raw", "cc").collect().map(_.getInt(0)).toSet
    assert(got === (Set(0) ++ (for (t <- 1 to 4; i <- 1 to 3) yield t * 100 + i)))
    // all 13 entries carry sidecars and row counts reconcile scan-free
    assert(wh.rowCountHistory("raw", "cc").last._2 === Some(13L))
  }

  test("compact output keeps zone maps alive; vacuumStats reclaims orphans") {
    val wh = freshWh()
    threeFrags(wh)
    assert(wh.compact("raw", "t") === Seq(""))
    val (scan, pruned) = wh.planScan("raw", "t", col("id") === 10)
    // one compacted fragment covering [1,21]: no pruning possible, but
    // the sidecar exists (scan == all entries == 1)
    assert(scan.size === 1 && pruned.isEmpty)
    val td = Paths.get(wh.root, "raw", "t")
    val live = wh.log("raw", "t").latest.get.entries.map(_.path).toSet
    assert(ZoneMaps.read(td, live.head).isDefined)
    // superseded fragments' sidecars are orphans until vacuumStats
    val statsDir = td.resolve("_stats")
    val countBefore = Files.list(statsDir).count()
    ZoneMaps.vacuumStats(td,
      wh.log("raw", "t").commits.flatMap(_.entries.map(_.path)).toSet)
    // pre-compaction commits still live → their sidecars stay
    assert(Files.list(statsDir).count() === countBefore)
    ZoneMaps.vacuumStats(td, live)
    assert(Files.list(statsDir).count() === 1)
  }

  test("partition zones take the SCHEMA type: string partitions with numeric-looking values order as strings") {
    import spark.implicits._
    val wh = freshWh()
    // partition values '9' and '12' on a STRING column: string ordering
    // has '12' < '9', so col(p) < '9' MUST scan partition '12' — a
    // value-shape-inferred numeric zone would wrongly prune it
    wh.overwrite("raw", "sp",
      Seq((1, "9"), (2, "12")).toDF("id", "p"),
      TableMeta(partitionField = Some("p"), partitionType = "string"))
    val pred = col("p") < "9"
    val (scan, _) = wh.planScan("raw", "sp", pred)
    assert(scan.map(_.partition).contains("12"),
      "string-typed partition '12' sorts below '9' and must be scanned")
    assert(wh.readWhere("raw", "sp", pred).collect().map(_.getInt(0)).toSeq
      === Seq(2))
    // and the typed ordering still prunes where it soundly can
    val (scanEq, prunedEq) = wh.planScan("raw", "sp", col("p") === "9")
    assert(scanEq.map(_.partition) === Seq("9") && prunedEq.size === 1)
  }

  test("int-typed partition zones order numerically (schema-derived, 9 < 12)") {
    import spark.implicits._
    val wh = freshWh()
    wh.overwrite("raw", "ip",
      Seq((1, 9), (2, 12)).toDF("id", "p"),
      TableMeta(partitionField = Some("p"), partitionType = "int"))
    val (scan, pruned) = wh.planScan("raw", "ip", col("p") < 10)
    assert(scan.map(_.partition) === Seq("9") && pruned.size === 1)
    assert(wh.readWhere("raw", "ip", col("p") < 10)
      .collect().map(_.getInt(0)).toSeq === Seq(1))
  }

  test("null partitions record as all-null zones: IsNull scans the sentinel fragment") {
    import spark.implicits._
    val wh = freshWh()
    wh.overwrite("raw", "np",
      Seq((1, Option.empty[String]), (2, Some("x"))).toDF("id", "p"),
      TableMeta(partitionField = Some("p"), partitionType = "string"))
    val (scan, pruned) = wh.planScan("raw", "np", col("p").isNull)
    assert(scan.size === 1 && pruned.size === 1,
      s"IsNull must scan exactly the sentinel fragment, got ${scan.map(_.partition)}")
    assert(wh.readWhere("raw", "np", col("p").isNull)
      .collect().map(_.getInt(0)).toSeq === Seq(1))
    // and IsNotNull scans only the value fragment
    assert(wh.readWhere("raw", "np", col("p").isNotNull)
      .collect().map(_.getInt(0)).toSeq === Seq(2))
  }

  test("escaped partition dir values are unescaped before becoming zone bounds") {
    import spark.implicits._
    val wh = freshWh()
    // ':' is hive-escaped in the directory name (p=a%3Ab); the zone
    // bound must be the RAW value or equality literals never match
    wh.overwrite("raw", "ep",
      Seq((1, "a:b"), (2, "plain")).toDF("id", "p"),
      TableMeta(partitionField = Some("p"), partitionType = "string"))
    val (scan, pruned) = wh.planScan("raw", "ep", col("p") === "a:b")
    assert(scan.size === 1 && pruned.size === 1,
      s"escaped-value equality must scan its fragment, got ${scan.map(_.partition)}")
    assert(wh.readWhere("raw", "ep", col("p") === "a:b")
      .collect().map(_.getInt(0)).toSeq === Seq(1))
  }

  test("streaming foreachBatch ingest produces the SAME zone-map sidecars as batch writes; readWhere prunes streamed tables") {
    import spark.implicits._
    val wh = freshWh()
    // a real file stream: stage a fixture parquet, readStream it, land
    // every micro-batch through the warehouse write paths (the
    // q16-family sink shape) — one partitioned upsert, one unpartitioned
    // append — then prove data skipping holds on the streamed-in tables
    val srcDir = Files.createTempDirectory("zm_stream_src")
    Seq((1, "2024-01-01 10:00:00", 10.0), (2, "2024-01-02 10:00:00", 20.0),
      (3, "2024-01-03 10:00:00", 30.0))
      .toDF("id", "hour", "value")
      .withColumn("hour", col("hour").cast("timestamp"))
      .write.mode("overwrite").parquet(srcDir.toString)
    val schema = spark.read.parquet(srcDir.toString).schema
    val ckpt1 = Files.createTempDirectory("zm_stream_ck1").toString
    val q1 = spark.readStream.schema(schema).parquet(srcDir.toString)
      .writeStream
      .option("checkpointLocation", ckpt1)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val b = batch.withColumn("day", to_date(col("hour")))
        if (!b.isEmpty) {
          if (!wh.exists("mart", "sh"))
            wh.overwrite("mart", "sh", b,
              graft.core.TableMeta(partitionField = Some("day")))
          else wh.insertOverwrite("mart", "sh", b)
        }
      }.start()
    q1.awaitTermination()
    val ckpt2 = Files.createTempDirectory("zm_stream_ck2").toString
    val q2 = spark.readStream.schema(schema).parquet(srcDir.toString)
      .writeStream
      .option("checkpointLocation", ckpt2)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          if (!wh.exists("mart", "sa")) wh.overwrite("mart", "sa", batch)
          else wh.append("mart", "sa", batch)
        }
      }.start()
    q2.awaitTermination()
    // every streamed-in entry carries a sidecar, exactly like batch writes
    for ((ds, t) <- Seq(("mart", "sh"), ("mart", "sa"))) {
      val td = Paths.get(wh.root, ds, t)
      val entries = wh.log(ds, t).latest.get.entries
      assert(entries.nonEmpty)
      entries.foreach(e => assert(ZoneMaps.read(td, e.path).isDefined,
        s"streamed $ds.$t entry ${e.path} missing its sidecar"))
    }
    // and the sidecars PRUNE: partition zone on the hive table,
    // column zones on the append table
    val (scanDay, prunedDay) =
      wh.planScan("mart", "sh", col("day") === lit("2024-01-02").cast("date"))
    assert(scanDay.size === 1 && prunedDay.size === 2,
      s"streamed partition zones must prune: ${scanDay.map(_.partition)}")
    assert(wh.readWhere("mart", "sh", col("id") === 2)
      .select("id").collect().map(_.getInt(0)).toSeq === Seq(2))
    val (scanId, _) = wh.planScan("mart", "sa", col("id") === 2)
    assert(wh.readWhere("mart", "sa", col("id") === 2)
      .select("id").collect().map(_.getInt(0)).toSeq === Seq(2))
    assert(scanId.size <= wh.log("mart", "sa").latest.get.entries.size)
  }

  test("a fragment where any file's footer stats fail gets NO sidecar (whole-dir scan, never a partial map)") {
    import spark.implicits._
    val wh = freshWh()
    wh.overwrite("raw", "pf", Seq((1, "a")).toDF("id", "v"))
    val td = Paths.get(wh.root, "raw", "pf")
    val entry = wh.log("raw", "pf").latest.get.entries.head
    // simulate a transient footer-read failure: drop the sidecar, plant
    // a garbage .parquet in the fragment, re-analyze
    Files.deleteIfExists(ZoneMaps.statsPath(td, entry.path))
    Files.write(td.resolve(entry.path).resolve("part-junk.parquet"),
      "not a parquet file".getBytes)
    wh.analyze("raw", "pf")
    assert(ZoneMaps.read(td, entry.path).isEmpty,
      "partial footer coverage must refuse the sidecar — pruneFiles treats the files map as exhaustive")
    // no sidecar ⇒ the fragment is always scanned, never wrongly pruned
    val (scan, pruned) = wh.planScan("raw", "pf", col("id") === 99)
    assert(scan.size === 1 && pruned.isEmpty)
  }

  test("clustered PARTITIONED writes produce range-disjoint files: cluster-col probes prune inside every partition") {
    val wh = freshWh()
    val m = graft.core.TableMeta(
      partitionField = Some("day"), partitionType = "string",
      clusteringFields = Seq("uid"))
    // two partitions x 20k rows, uid interleaved so an UNCLUSTERED write
    // would give every file the full uid range
    val df = spark.range(40000L).select(
      (when(pmod(col("id"), lit(2)) === 0, lit("d1")).otherwise(lit("d2"))).as("day"),
      pmod(col("id") * 7919L, lit(40000L)).as("uid"),
      col("id").as("payload"))
    // at production scale the range shuffle is far above AQE's coalesce
    // floor; at 40k spec rows AQE folds it to ONE file per dir — disable
    // coalescing and widen the shuffle for the write so the multi-file
    // shape under test exists at fixture scale
    val kCoal = "spark.sql.adaptive.coalescePartitions.enabled"
    val kShuf = "spark.sql.shuffle.partitions"
    val (pCoal, pShuf) = (spark.conf.get(kCoal), spark.conf.get(kShuf))
    try {
      spark.conf.set(kCoal, "false")
      spark.conf.set(kShuf, "16")
      wh.overwrite("raw", "cl", df, m)
    } finally { spark.conf.set(kCoal, pCoal); spark.conf.set(kShuf, pShuf) }
    val entries = wh.log("raw", "cl").latest.get.entries
    assert(entries.size == 2)
    val td = java.nio.file.Paths.get(wh.root, "raw", "cl")
    // every partition dir must hold SEVERAL files (range partitioning,
    // not one-task-per-partition) for intra-partition pruning to exist
    val fileCounts = entries.map(e =>
      graft.core.ZoneMaps.read(td, e.path).get.files.size)
    assert(fileCounts.forall(_ > 2), s"need multiple files per dir: $fileCounts")
    // a narrow uid range must open a small fraction of files
    val (scanned, total) = wh.scanFootprint("raw", "cl",
      col("uid").between(100L, 200L))
    assert(scanned * 4 <= total,
      s"cluster-sorted files must prune a narrow uid probe: $scanned/$total")
    // correctness: pruned read == full filter
    assert(wh.readWhere("raw", "cl", col("uid").between(100L, 200L)).count() ==
      wh.read("raw", "cl").filter(col("uid").between(100L, 200L)).count())
  }
}
