package graft

import java.nio.file.{Files, Path}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Warehouse

/** Name REUSE across the rename chain — the one place a table-wide
  * physical→current rename map is ambiguous. After `RENAME a TO b`,
  * the name `a` is free again (`droppedColumns` guards drops only), so
  * `ADD COLUMN a` or `RENAME c TO a` may legally reuse it. From then on
  * the PHYSICAL name `a` means two different columns depending on when
  * a fragment was written:
  *
  *  - fragments written BEFORE the rename hold the OLD a (must
  *    re-label to b on read; their sidecars' `a` stats are b's stats);
  *  - fragments written AFTER reuse hold the NEW a (must NOT re-label;
  *    their sidecars' `a` stats are a's stats).
  *
  * The reads here pin the correct per-fragment behavior, and the prune
  * cases pin that zone/Bloom skipping never consults the WRONG column's
  * stats (reference: dbtwiz has no rename chains — this is warehouse-
  * layer semantics modeled on Delta column mapping, which disambiguates
  * by field ID; we disambiguate by fragment birth version). */
class RenameReuseSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private def freshRoot(): Path = Files.createTempDirectory("rename_reuse")

  test("ADD COLUMN reusing a renamed-away name: fragments on both sides read correctly") {
    val wh = new Warehouse(spark, freshRoot().toString)
    // old fragment: physical column `a` (values 1, 2)
    wh.overwrite("d", "t", Seq((1L, "x1"), (2L, "x2")).toDF("a", "v"))
    wh.renameColumn("d", "t", "a", "b")
    wh.addColumn("d", "t", "a", "BIGINT")
    // new fragment: physically holds BOTH b (renamed old a) and the new a
    wh.append("d", "t", Seq((3L, "x3", 30L)).toDF("b", "v", "a"))
    val rows = wh.read("d", "t").orderBy("b")
      .select("b", "v", "a").collect().map(r =>
        (r.getLong(0), r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
    // old rows: b = old a's values, a = NULL (added after they landed)
    // new row: b = 3, a = 30 — NOT b twice, NOT a mislabeled
    assert(rows.toSeq === Seq((1L, "x1", -1L), (2L, "x2", -1L), (3L, "x3", 30L)))
  }

  test("RENAME c TO a reusing a renamed-away name: both eras read correctly") {
    val wh = new Warehouse(spark, freshRoot().toString)
    // old fragment: physical a=1, c=100
    wh.overwrite("d", "t", Seq((1L, 100L)).toDF("a", "c"))
    wh.renameColumn("d", "t", "a", "b")
    wh.renameColumn("d", "t", "c", "a")
    // new fragment written under CURRENT names: physical b=2, a=200
    wh.append("d", "t", Seq((2L, 200L)).toDF("b", "a"))
    val rows = wh.read("d", "t").orderBy("b")
      .select("b", "a").collect().map(r => (r.getLong(0), r.getLong(1)))
    // old fragment: b = old a = 1, a = old c = 100
    // new fragment: b = 2, a = 200
    assert(rows.toSeq === Seq((1L, 100L), (2L, 200L)))
  }

  test("pruning never consults the stale physical name's stats after reuse") {
    val wh = new Warehouse(spark, freshRoot().toString)
    // old fragment: physical a in [1, 10] — after rename these are b's stats
    wh.overwrite("d", "t", (1L to 10L).map(i => (i, i * 100L)).toDF("a", "c"))
    wh.renameColumn("d", "t", "a", "b")
    wh.renameColumn("d", "t", "c", "a")
    // current-name semantics: old fragment's a (old c) spans [100, 1000]
    // new fragment: a spans [5000, 5010]
    wh.append("d", "t", (5000L to 5010L).map(i => (i + 90L, i)).toDF("b", "a"))
    // WHERE a = 500 matches the OLD fragment (old c = 500). A prune that
    // reads the old sidecar's `a` stats ([1,10]) as if they were a's
    // would skip the fragment and lose the row.
    val hit = wh.readWhere("d", "t", col("a") === 500L).collect()
    assert(hit.length === 1 && hit.head.getAs[Long]("b") === 5L)
    // WHERE a = 7 matches NOTHING (7 is in the stale physical range of
    // the old sidecar but no current-a holds 7) — correctness either
    // way, but the hazard ADVICE flags: stale-stats pruning would say
    // "may match" for the wrong reason; wrong-column pruning could skip
    // a real match. Both directions covered by the = 500 case above.
    assert(wh.readWhere("d", "t", col("a") === 7L).isEmpty)
    // and the renamed column b still prunes soundly: b = 5 lives in the
    // OLD fragment under physical name a
    val hitB = wh.readWhere("d", "t", col("b") === 5L).collect()
    assert(hitB.length === 1 && hitB.head.getAs[Long]("a") === 500L)
  }

  test("RENAME onto a dropped name: tombstone hides pre-drop bytes, rename serves") {
    val wh = new Warehouse(spark, freshRoot().toString)
    wh.overwrite("d", "t", Seq((1L, "x", 9L)).toDF("k", "v", "gone"))
    wh.dropColumn("d", "t", "gone")
    // pre-drop fragment still physically holds `gone` = 9L; the rename
    // appends a terminal tombstone link so those bytes can never
    // resurrect — the renamed column serves v's values, immediately
    wh.renameColumn("d", "t", "v", "gone")
    assert(wh.read("d", "t").columns.toSeq === Seq("k", "gone"))
    val row = wh.read("d", "t").select("k", "gone").collect().head
    assert(row.getLong(0) === 1L && row.getString(1) === "x",
      s"renamed column must serve v's values, not the dropped bytes: $row")
  }

  test("a renamed column KEEPS zone pruning (sidecar stats re-keyed per fragment)") {
    val wh = new Warehouse(spark, freshRoot().toString)
    // several fragments with disjoint key ranges, then rename the key
    (0 until 4).foreach { i =>
      val lo = i * 1000L
      if (i == 0) wh.overwrite("d", "t", (lo until lo + 100L).map(k => (k, s"v$k")).toDF("k", "v"))
      else wh.append("d", "t", (lo until lo + 100L).map(k => (k, s"v$k")).toDF("k", "v"))
    }
    wh.renameColumn("d", "t", "k", "key")
    // point probe on the NEW name must open 1 of 4 fragments — before
    // the per-fragment re-key, renamed columns silently lost pruning
    val (scan, pruned) = wh.planScan("d", "t", col("key") === 2050L)
    assert(scan.size === 1, s"expected 1 scanned entry, got ${scan.size}")
    assert(pruned.size === 3)
    val hit = wh.readWhere("d", "t", col("key") === 2050L).collect()
    assert(hit.length === 1 && hit.head.getAs[String]("v") === "v2050")
  }

  test("COPY preserves fragment eras: a copied reuse table reads correctly") {
    val wh = new Warehouse(spark, freshRoot().toString)
    wh.overwrite("d", "t", Seq((1L, 100L)).toDF("a", "c"))
    wh.renameColumn("d", "t", "a", "b")
    wh.renameColumn("d", "t", "c", "a")
    wh.append("d", "t", Seq((2L, 200L)).toDF("b", "a"))
    // raw-copied fragments keep their physical names AND their eras;
    // the chain copies verbatim — the copy must read like the source
    wh.copy("d", "t", "d", "t2")
    assert(wh.read("d", "t2").orderBy("b").select("b", "a")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      === Seq((1L, 100L), (2L, 200L)))
  }

  test("CLONE preserves fragment eras across reuse") {
    val wh = new Warehouse(spark, freshRoot().toString)
    wh.overwrite("d", "t", Seq((1L, 100L)).toDF("a", "c"))
    wh.renameColumn("d", "t", "a", "b")
    wh.renameColumn("d", "t", "c", "a")
    wh.append("d", "t", Seq((2L, 200L)).toDF("b", "a"))
    wh.cloneTable("d", "t", "d", "tc")
    assert(wh.read("d", "tc").orderBy("b").select("b", "a")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      === Seq((1L, 100L), (2L, 200L)))
  }

  test("RESTORE across a reuse chain serves the restored era's names") {
    val wh = new Warehouse(spark, freshRoot().toString)
    wh.overwrite("d", "t", Seq((1L, 100L)).toDF("a", "c")) // v1
    wh.renameColumn("d", "t", "a", "b")                    // v2
    wh.renameColumn("d", "t", "c", "a")                    // v3
    wh.append("d", "t", Seq((2L, 200L)).toDF("b", "a"))    // v4
    wh.restoreToVersion("d", "t", 1)                       // v5: (a, c) era
    val cur = wh.read("d", "t")
    assert(cur.columns.toSeq === Seq("a", "c"))
    assert(cur.select("a", "c").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((1L, 100L)))
    // appends after the restore write under the RESTORED names and
    // read back under them (new era: no link applies)
    wh.append("d", "t", Seq((3L, 300L)).toDF("a", "c"))
    assert(wh.read("d", "t").orderBy("a").select("a", "c").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
      === Seq((1L, 100L), (3L, 300L)))
  }

  test("time travel mid-chain serves each era's own names after reuse") {
    val wh = new Warehouse(spark, freshRoot().toString)
    wh.overwrite("d", "t", Seq((1L, 100L)).toDF("a", "c")) // v1
    wh.renameColumn("d", "t", "a", "b")                    // v2
    wh.renameColumn("d", "t", "c", "a")                    // v3
    wh.append("d", "t", Seq((2L, 200L)).toDF("b", "a"))    // v4
    val v1 = wh.readVersion("d", "t", 1)
    assert(v1.columns.toSeq === Seq("a", "c"))
    assert(v1.select("a", "c").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      === Seq((1L, 100L)))
    val v2 = wh.readVersion("d", "t", 2)
    assert(v2.columns.toSeq === Seq("b", "c"))
  }
}
