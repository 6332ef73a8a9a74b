package graft

import java.nio.file.{Files, Path}
import java.time.Instant
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{AggView, TableMeta, Warehouse}
import graft.core.AggView.AggSpec

/** Round-14 advisory fixes, each spec-gated so it can't silently regress:
  *
  *  1. calendar partition transforms pin their TIME ZONE at declaration —
  *     a session with a different zone cannot write (loud refusal) and
  *     pruning derives day dirs under the STAMPED zone, so an equality
  *     probe from a differently-zoned session still finds its rows;
  *  2. UNIQUE-key appends re-validate inside the CAS closure, so two
  *     concurrent same-key appends can never both land;
  *  3. addColumn refuses a DEFAULT whose cast to the column type folds to
  *     NULL (ANSI-off silent-null), keeping the loud-at-declaration promise;
  *  4. AggView.refresh degrades to a full rebuild when the watermarked
  *     source manifest has been vacuumed, instead of throwing forever.
  */
class AdviceR14Spec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private def freshRoot(): Path = Files.createTempDirectory("advice_r14")

  private val dayMeta = TableMeta(
    partitionField = Some("p_day"), partitionType = "date",
    partitionTransform = Some("days"), partitionSource = Some("ts"))

  private def events(s: SparkSession, rows: (String, Long)*): DataFrame = {
    import s.implicits._
    rows.toSeq.toDF("tss", "uid")
      .select(to_timestamp(col("tss")).as("ts"), col("uid"))
  }

  private def nySession(): SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.session.timeZone", "America/New_York")
    s
  }

  test("days(ts): declaration stamps the session zone into table metadata") {
    val root = freshRoot()
    val wh = new Warehouse(spark, root.toString)
    wh.overwrite("d", "ev", events(spark, ("2024-01-06 02:00:00", 3L)), dayMeta)
    assert(wh.meta("d", "ev").partitionZone.contains(
      spark.conf.get("spark.sql.session.timeZone")))
  }

  test("days(ts): equality probe from a differently-zoned session prunes under the STAMPED zone") {
    val root = freshRoot()
    val wh = new Warehouse(spark, root.toString) // UTC session writes
    // 02:00 UTC on Jan 6 = 21:00 Jan 5 in New York — the day dir differs
    // between the two zones, so a zone-confused prune drops the row
    wh.overwrite("d", "ev", events(spark,
      ("2024-01-05 08:00:00", 1L), ("2024-01-06 02:00:00", 3L),
      ("2024-01-07 09:00:00", 4L)), dayMeta)
    val boundary = java.sql.Timestamp.from(Instant.parse("2024-01-06T02:00:00Z"))
    val ny = nySession()
    val whNy = new Warehouse(ny, root.toString)
    val got = whNy.readWhere("d", "ev", col("ts") === lit(boundary))
    assert(got.count() === 1L, "boundary row silently pruned under the wrong zone")
    assert(got.head().getLong(1) === 3L)
  }

  test("days(ts): a session whose zone disagrees with the stamp cannot write") {
    val root = freshRoot()
    val wh = new Warehouse(spark, root.toString)
    wh.overwrite("d", "ev", events(spark, ("2024-01-05 08:00:00", 1L)), dayMeta)
    val ny = nySession()
    val whNy = new Warehouse(ny, root.toString)
    val e = intercept[IllegalArgumentException] {
      whNy.insertOverwrite("d", "ev", events(ny, ("2024-01-06 12:00:00", 9L)))
    }
    assert(e.getMessage.contains("zone"), e.getMessage)
  }

  test("days(ts): LEGACY metadata without a zone stamp is never transform-pruned on timestamps") {
    val root = freshRoot()
    val wh = new Warehouse(spark, root.toString)
    wh.overwrite("d", "ev", events(spark,
      ("2024-01-05 08:00:00", 1L), ("2024-01-06 02:00:00", 3L)), dayMeta)
    // simulate a table declared before the zone stamp existed
    val metaFile = root.resolve("d").resolve("ev").resolve("_meta.properties")
    val p = new java.util.Properties()
    val in = Files.newInputStream(metaFile)
    try p.load(in) finally in.close()
    p.remove("partition.zone")
    val out = Files.newOutputStream(metaFile)
    try p.store(out, null) finally out.close()
    assert(wh.meta("d", "ev").partitionZone.isEmpty)
    // a probe from ANY zone keeps every candidate dir → correct results
    val boundary = java.sql.Timestamp.from(Instant.parse("2024-01-06T02:00:00Z"))
    val ny = nySession()
    val whNy = new Warehouse(ny, root.toString)
    assert(whNy.readWhere("d", "ev", col("ts") === lit(boundary)).count() === 1L)
    assert(wh.readWhere("d", "ev", col("ts") === lit(boundary)).count() === 1L)
  }

  test("UNIQUE key: two concurrent appends of the same key never both land") {
    val root = freshRoot()
    val wh = new Warehouse(spark, root.toString)
    val meta = TableMeta(uniqueKey = Seq("k"))
    wh.overwrite("d", "u", Seq((0L, "seed")).toDF("k", "v"), meta)
    for (round <- 1 to 4) {
      val key = round.toLong
      val barrier = new java.util.concurrent.CyclicBarrier(2)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val threads = (1 to 2).map { i =>
        new Thread(() => {
          try {
            val df = Seq((key, s"writer$i")).toDF("k", "v")
            barrier.await()
            wh.append("d", "u", df)
          } catch { case t: Throwable => errs.add(t) }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      // whichever interleaving happened, the invariant holds: the key
      // exists EXACTLY once, and any loser failed loudly with the
      // engine's duplicate/race vocabulary
      val n = wh.read("d", "u").filter(col("k") === key).count()
      assert(n === 1L, s"round $round: key $key landed $n times")
      errs.forEach { t =>
        assert(t.isInstanceOf[IllegalArgumentException] ||
          t.isInstanceOf[java.util.ConcurrentModificationException],
          s"unexpected failure type: $t")
      }
    }
  }

  test("addColumn DEFAULT that casts to NULL is refused at declaration") {
    val root = freshRoot()
    val wh = new Warehouse(spark, root.toString)
    wh.overwrite("d", "t", Seq((1L, "a")).toDF("id", "s"))
    // ANSI on (Spark 4 default): the cast itself throws. ANSI off: the
    // cast silently folds to NULL — the declaration-time check must
    // catch THAT, or old fragments would serve NULL forever.
    intercept[Exception] { wh.addColumn("d", "t", "n", "INT", Some("'abc'")) }
    val ansi = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val e = intercept[IllegalArgumentException] {
        wh.addColumn("d", "t", "n", "INT", Some("'abc'"))
      }
      assert(e.getMessage.contains("does not cast"), e.getMessage)
    } finally spark.conf.set("spark.sql.ansi.enabled", ansi)
    // a compatible default still lands, and old fragments serve it
    wh.addColumn("d", "t", "n", "INT", Some("'42'"))
    assert(wh.read("d", "t").select("n").head().getInt(0) === 42)
    // an explicitly-null default is a legitimate declaration
    wh.addColumn("d", "t", "m", "INT", Some("null"))
    assert(wh.read("d", "t").select("m").head().isNullAt(0))
  }

  test("AggView.refresh survives a vacuumed watermark: degrades to full rebuild") {
    val root = freshRoot()
    val wh = new Warehouse(spark, root.toString)
    wh.overwrite("d", "src", Seq(("a", 1L), ("b", 2L)).toDF("k", "v"))
    AggView.create(wh, "d", "mv", "d", "src",
      Seq("k"), Seq(AggSpec("n", "count"), AggSpec("total", "sum", "v")))
    wh.append("d", "src", Seq(("a", 10L)).toDF("k", "v"))
    wh.append("d", "src", Seq(("c", 5L)).toDF("k", "v"))
    // vacuum everything but the latest commit — the watermarked manifest
    // is gone, so the append-only diff is impossible
    wh.log("d", "src").vacuum(0, System.currentTimeMillis() + 60000)
    val r = AggView.refresh(wh, "d", "mv")
    assert(r.mode === "full", r)
    val got = wh.read("d", "mv").select(col("k"), col("n").cast("long"),
      col("total").cast("long")).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2))).toSet
    assert(got === Set(("a", 2L, 11L), ("b", 1L, 2L), ("c", 1L, 5L)))
    // and the view is refreshable again afterwards (watermark re-pinned)
    wh.append("d", "src", Seq(("b", 3L)).toDF("k", "v"))
    assert(AggView.refresh(wh, "d", "mv").mode === "incremental")
  }
}
