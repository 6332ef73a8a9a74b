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

    def verify(step: String): Unit = {
      val got = wh.read("d", "t").select("k", "v", "p")
        .collect().map(r => MRow(r.getLong(0), r.getLong(1), r.getString(2)))
        .sortBy(_.k).toVector
      assert(got === model.sortBy(_.k), s"[$step] live state diverged")
      if (history.nonEmpty) {
        val (ver, want) = history.toSeq(rnd.nextInt(history.size))
        val at = wh.readVersion("d", "t", ver).select("k", "v", "p")
          .collect().map(r => MRow(r.getLong(0), r.getLong(1), r.getString(2)))
          .sortBy(_.k).toVector
        assert(at === want.sortBy(_.k), s"[$step] time travel to v$ver diverged")
      }
    }

    // create: empty table with the walk's metadata
    wh.overwrite("d", "t", toDf(Nil), m)
    record()
    val batch0 = freshRows(4)
    if (partitioned) wh.appendPartitioned("d", "t", toDf(batch0))
    else wh.append("d", "t", toDf(batch0))
    model ++= batch0
    record(); verify("init")

    for (op <- 1 to 16) {
      val step = rnd.nextInt(12) match {
        case 0 | 1 => // append a small batch of fresh keys
          val rows = freshRows(1 + rnd.nextInt(4))
          if (partitioned) wh.appendPartitioned("d", "t", toDf(rows))
          else wh.append("d", "t", toDf(rows))
          model ++= rows
          "append"
        case 2 => // copy-on-write delete
          val (pred, hit) = somePred()
          wh.deleteWhere("d", "t", pred)
          model = model.filterNot(hit)
          "deleteWhere"
        case 3 => // merge-on-read delete (deletion vector)
          val (pred, hit) = somePred()
          wh.deleteWhereMor("d", "t", pred)
          model = model.filterNot(hit)
          "deleteWhereMor"
        case 4 => // update v under a predicate
          val (pred, hit) = somePred()
          val delta = 1L + rnd.nextInt(10)
          wh.updateWhere("d", "t", Seq("v" -> (col("v") + lit(delta))), pred)
          model = model.map(r => if (hit(r)) r.copy(v = r.v + delta) else r)
          "updateWhere"
        case 5 => // key merge: update some existing keys, insert fresh ones
          val hitKeys = rnd.shuffle(model).take(rnd.nextInt(3))
            .map(r => r.copy(v = r.v + 1000L))
          val ins = freshRows(1 + rnd.nextInt(2))
          val src = hitKeys ++ ins
          wh.mergeInto("d", "t", toDf(src), Seq("k"))
          val byK = src.map(r => r.k -> r).toMap
          model = model.map(r => byK.getOrElse(r.k, r)) ++ ins
          "mergeInto"
        case 6 => // predicate replace: scope out one partition value,
          // land fresh rows that all satisfy the scope
          val p = parts(rnd.nextInt(parts.size))
          val rows = freshRows(1 + rnd.nextInt(3)).map(_.copy(p = p))
          wh.replaceWhere("d", "t", col("p") === p, toDf(rows))
          model = model.filterNot(_.p == p) ++ rows
          "replaceWhere"
        case 7 => // truncate (rare enough not to dominate)
          if (rnd.nextBoolean()) {
            wh.truncate("d", "t")
            model = Vector.empty
            "truncate"
          } else "skip"
        case 8 => // full rewrite of the current state
          wh.overwrite("d", "t", toDf(model), m)
          "overwrite"
        case 9 => // small-file compaction: state must not move
          wh.compact("d", "t",
            targetBytes = if (rnd.nextBoolean()) 1L << 20 else 1L)
          "compact"
        case _ => // in-place restore to a random recorded version
          val ver = history.keys.toSeq(rnd.nextInt(history.size))
          wh.restoreToVersion("d", "t", ver)
          model = history(ver)
          s"restore v$ver"
      }
      record()
      verify(s"op $op: $step")
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
