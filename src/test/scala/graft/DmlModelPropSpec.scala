package graft

import java.nio.file.Files
import scala.util.Random
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.core.{TableMeta, Warehouse}

/** Model-based random walk over the DML surface: a table takes a random
  * interleaving of appends, copy-on-write deletes, merge-on-read
  * deletes, updates, key merges, predicate replaces, truncates, full
  * rewrites, compactions and in-place restores, and after EVERY step
  * the real read must match an in-memory model — plus, each step, a
  * time-travel read of one RANDOM recorded version must match the
  * model's recorded history (restore re-points, MoR swaps dv pointers,
  * compaction rewrites: every one must keep every PAST version exact).
  *
  * This is the composition surface the deterministic DML specs cover
  * pairwise but not in depth: a CoW rewrite of a fragment carrying a
  * deletion vector must apply the mask (not resurrect masked rows), a
  * compaction after MoR must materialize the vector, a restore across
  * a MoR boundary must re-point at the dv the snapshot pinned, a merge
  * landing over a truncate-restore chain must see the restored keys.
  * WAP rides along: staged batches stay INVISIBLE to every read and
  * every recorded version until publish, the audit view equals
  * model ∪ staged, and the model predicts the REFUSALS — row-level
  * mutations must refuse loudly while anything is staged (a publish
  * would silently undo them). Tags pin recorded versions and must
  * keep serving them verbatim through every later mutation.
  * Runs twice: UNIQUE-keyed unpartitioned, and hive-partitioned. */
class DmlModelPropSpec extends AnyFunSuite {
  import TestSession._

  private case class MRow(k: Long, v: Long, p: String)

  private val schema = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("v", LongType, nullable = false),
    StructField("p", StringType, nullable = false)))

  private def toDf(rows: Seq[MRow]): DataFrame =
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r => Row(r.k, r.v, r.p)): _*), schema)

  private val parts = Vector("a", "b", "c")

  private def walk(seed: Int, partitioned: Boolean): Unit = {
    val rnd = new Random(seed)
    val wh = new Warehouse(spark, Files.createTempDirectory("dml_walk").toString)
    val m =
      if (partitioned) TableMeta(partitionField = Some("p"), partitionType = "string")
      else TableMeta(uniqueKey = Seq("k"))
    var nextK = 0L
    var model = Vector.empty[MRow]
    var history = Map.empty[Int, Vector[MRow]]
    var staged = Vector.empty[MRow] // WAP: landed but uncommitted
    var tags = Map.empty[String, Int]
    var nextTag = 0

    def freshRows(n: Int): Vector[MRow] = Vector.fill(n) {
      nextK += 1
      MRow(nextK, rnd.nextInt(100).toLong, parts(rnd.nextInt(parts.size)))
    }

    /** A random predicate with its model twin. */
    def somePred(): (org.apache.spark.sql.Column, MRow => Boolean) =
      rnd.nextInt(4) match {
        case 0 =>
          val c = rnd.nextInt(100).toLong
          (col("v") >= c, r => r.v >= c)
        case 1 =>
          val p = parts(rnd.nextInt(parts.size))
          (col("p") === p, r => r.p == p)
        case 2 =>
          val ks = rnd.shuffle(model.map(_.k)).take(1 + rnd.nextInt(4))
          if (ks.isEmpty) (lit(false), _ => false)
          else (col("k").isin(ks.map(Long.box): _*), r => ks.contains(r.k))
        case _ =>
          val mod = 2 + rnd.nextInt(4)
          val rem = rnd.nextInt(mod).toLong
          (col("v") % mod === rem, r => r.v % mod == rem)
      }

    def record(): Unit =
      wh.log("d", "t").latest.filter(!_.isDrop).foreach { c =>
        history += c.version -> model
      }

    def rowsOf(df: org.apache.spark.sql.DataFrame): Vector[MRow] =
      df.select("k", "v", "p")
        .collect().map(r => MRow(r.getLong(0), r.getLong(1), r.getString(2)))
        .sortBy(_.k).toVector

    def verify(step: String): Unit = {
      assert(rowsOf(wh.read("d", "t")) === model.sortBy(_.k),
        s"[$step] live state diverged (staged data must stay invisible)")
      if (staged.nonEmpty)
        assert(rowsOf(wh.readWithStaged("d", "t")) ===
          (model ++ staged).sortBy(_.k), s"[$step] audit view diverged")
      if (history.nonEmpty) {
        val (ver, want) = history.toSeq(rnd.nextInt(history.size))
        val at = rowsOf(wh.readVersion("d", "t", ver))
        assert(at === want.sortBy(_.k), s"[$step] time travel to v$ver diverged")
      }
      if (tags.nonEmpty) {
        val (name, ver) = tags.toSeq(rnd.nextInt(tags.size))
        assert(rowsOf(wh.readTag("d", "t", name)) === history(ver).sortBy(_.k),
          s"[$step] tag $name (v$ver) diverged")
      }
    }

    /** Row-level mutations must REFUSE while anything is staged (a WAP
      * publish would silently undo them); the model predicts exactly
      * when. Runs `body` and applies `update` when unstaged. */
    def mutating(what: String)(body: => Unit)(update: => Unit): String =
      if (staged.nonEmpty) {
        val r = scala.util.Try(body)
        assert(r.isFailure && r.failed.get.getMessage.contains("staged"),
          s"$what while staged must refuse loudly, got $r")
        s"$what (refused: staged)"
      } else { body; update; what }

    // create: empty table with the walk's metadata
    wh.overwrite("d", "t", toDf(Nil), m)
    record()
    val batch0 = freshRows(4)
    if (partitioned) wh.appendPartitioned("d", "t", toDf(batch0))
    else wh.append("d", "t", toDf(batch0))
    model ++= batch0
    record(); verify("init")

    for (op <- 1 to 20) {
      val step = rnd.nextInt(16) match {
        case 0 | 1 => // append a small batch of fresh keys
          val rows = freshRows(1 + rnd.nextInt(4))
          if (partitioned) wh.appendPartitioned("d", "t", toDf(rows))
          else wh.append("d", "t", toDf(rows))
          model ++= rows
          "append"
        case 2 => // copy-on-write delete
          val (pred, hit) = somePred()
          mutating("deleteWhere")(wh.deleteWhere("d", "t", pred)) {
            model = model.filterNot(hit)
          }
        case 3 => // merge-on-read delete (deletion vector)
          val (pred, hit) = somePred()
          mutating("deleteWhereMor")(wh.deleteWhereMor("d", "t", pred)) {
            model = model.filterNot(hit)
          }
        case 4 => // update v under a predicate
          val (pred, hit) = somePred()
          val delta = 1L + rnd.nextInt(10)
          mutating("updateWhere")(
            wh.updateWhere("d", "t", Seq("v" -> (col("v") + lit(delta))), pred)) {
            model = model.map(r => if (hit(r)) r.copy(v = r.v + delta) else r)
          }
        case 5 => // key merge: update some existing keys, insert fresh ones
          val hitKeys = rnd.shuffle(model).take(rnd.nextInt(3))
            .map(r => r.copy(v = r.v + 1000L))
          val ins = freshRows(1 + rnd.nextInt(2))
          val src = hitKeys ++ ins
          val byK = src.map(r => r.k -> r).toMap
          mutating("mergeInto")(wh.mergeInto("d", "t", toDf(src), Seq("k"))) {
            model = model.map(r => byK.getOrElse(r.k, r)) ++ ins
          }
        case 6 => // predicate replace: scope out one partition value,
          // land fresh rows that all satisfy the scope
          val p = parts(rnd.nextInt(parts.size))
          val rows = freshRows(1 + rnd.nextInt(3)).map(_.copy(p = p))
          mutating("replaceWhere")(
            wh.replaceWhere("d", "t", col("p") === p, toDf(rows))) {
            model = model.filterNot(_.p == p) ++ rows
          }
        case 7 => // truncate (rare enough not to dominate)
          if (rnd.nextBoolean())
            mutating("truncate")(wh.truncate("d", "t")) { model = Vector.empty }
          else "skip"
        case 8 => // full rewrite of the PUBLISHED state (allowed while
          // staged: the publish CAS re-bases and appends on top)
          wh.overwrite("d", "t", toDf(model), m)
          "overwrite"
        case 9 => // small-file compaction: state must not move
          wh.compact("d", "t",
            targetBytes = if (rnd.nextBoolean()) 1L << 20 else 1L)
          "compact"
        case 10 | 11 => // in-place restore to a random recorded version
          // (allowed while staged — staged fragments are untouched and
          // publish lands them on the restored state)
          val ver = history.keys.toSeq(rnd.nextInt(history.size))
          wh.restoreToVersion("d", "t", ver)
          model = history(ver)
          s"restore v$ver"
        case 12 => // WAP stage: landed, validated, INVISIBLE until publish
          val rows = freshRows(1 + rnd.nextInt(3))
          wh.stageAppend("d", "t", toDf(rows))
          staged ++= rows
          "stageAppend"
        case 13 => // WAP resolution: publish or discard the audit
          if (staged.isEmpty) "skip"
          else if (rnd.nextBoolean()) {
            val n = wh.publishStaged("d", "t")
            assert(n > 0, "publish must report staged entries")
            model ++= staged; staged = Vector.empty
            "publishStaged"
          } else {
            wh.discardStaged("d", "t")
            staged = Vector.empty
            "discardStaged"
          }
        case 14 => // pin the current version with a tag
          wh.log("d", "t").latest.filter(!_.isDrop).map { c =>
            val name = s"walk_tag_$nextTag"; nextTag += 1
            wh.log("d", "t").tag(name, c.version)
            tags += name -> c.version
            s"tag v${c.version}"
          }.getOrElse("skip")
        case _ => // audit-view spot check rides verify(); burn a turn on
          // a second append so walks stay mutation-heavy
          val rows = freshRows(1)
          if (partitioned) wh.appendPartitioned("d", "t", toDf(rows))
          else wh.append("d", "t", toDf(rows))
          model ++= rows
          "append1"
      }
      record()
      verify(s"op $op: $step")
    }
    // drain: a publish at walk end must land every staged row exactly once
    if (staged.nonEmpty) {
      wh.publishStaged("d", "t")
      model ++= staged; staged = Vector.empty
      record(); verify("final publish")
    }
  }

  for (seed <- 1 to 6)
    test(s"random DML walk, unique-keyed unpartitioned, seed $seed") {
      walk(seed, partitioned = false)
    }
  for (seed <- 1 to 4)
    test(s"random DML walk, hive-partitioned, seed $seed") {
      walk(seed + 100, partitioned = true)
    }
}
