package graft

import java.nio.file.{Files, Path}
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{StoredView, Warehouse}
import graft.sql.GraftCatalog

/** Round-16 self-review fixes, spec-gated:
  *
  *  1. RENAME refuses while zero-copy clones pin the source (their
  *     snapshot entries hold ABSOLUTE paths into the source directory —
  *     a move would dangle every clone), and works again once the
  *     clones are dropped;
  *  2. RENAME onto a name whose dropped history survives refuses with a
  *     catalog-level error (not a raw filesystem exception): the
  *     directory must stay put for restore-of-dropped;
  *  3. RESTORE refuses views — live or dropped — instead of
  *     resurrecting the name as a silently-empty table (the same
  *     empty-frame class view time travel refuses);
  *  4. the persisted-view session-temp guard sees through subquery
  *     expressions and 2-part global_temp references;
  *  5. rename rollback clears partial redirect-view artifacts from the
  *     vacated old path before moving the directory back, and
  *     fail-louds rather than delete anything holding data commits.
  */
class ReviewR16Spec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private def freshRoot(): Path = Files.createTempDirectory("review_r16")

  private def mountCatalog(name: String, root: String): Warehouse = {
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    new Warehouse(spark, root)
  }

  test("rename refuses while a live clone pins the source; allowed after drop") {
    val wh = mountCatalog("r16a", freshRoot().toString)
    wh.overwrite("d", "src", Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    wh.cloneTable("d", "src", "d", "c")
    val e = intercept[IllegalArgumentException] {
      spark.sql("ALTER TABLE r16a.d.src RENAME TO d.dst")
    }
    assert(e.getMessage.contains("clone"), e.getMessage)
    // the clone still reads (nothing moved)
    assert(spark.sql("SELECT count(*) FROM r16a.d.c").head.getLong(0) === 2L)
    // releasing the pin unblocks the rename, and the clone's own
    // directory (foreign absolute refs into the unmoved source) is the
    // safe direction: renaming the CLONE is allowed while it is live
    spark.sql("ALTER TABLE r16a.d.c RENAME TO d.c2")
    assert(spark.sql("SELECT count(*) FROM r16a.d.c2").head.getLong(0) === 2L)
    wh.drop("d", "c2") // releases the pin on src
    spark.sql("ALTER TABLE r16a.d.src RENAME TO d.dst")
    assert(spark.sql("SELECT count(*) FROM r16a.d.dst").head.getLong(0) === 2L)
  }

  test("rename onto a dropped name refuses with a catalog-level error") {
    val wh = mountCatalog("r16b", freshRoot().toString)
    wh.overwrite("d", "src", Seq(1L).toDF("k"))
    wh.overwrite("d", "old", Seq(2L).toDF("k"))
    wh.drop("d", "old")
    val e = intercept[IllegalArgumentException] {
      spark.sql("ALTER TABLE r16b.d.src RENAME TO d.old")
    }
    assert(e.getMessage.contains("history occupies"), e.getMessage)
    // nothing moved, no partial redirect
    assert(spark.sql("SELECT k FROM r16b.d.src").head.getLong(0) === 1L)
    assert(!wh.isView("d", "src"))
  }

  test("RESTORE refuses views, live and dropped; copy-out restore too") {
    val wh = mountCatalog("r16c", freshRoot().toString)
    wh.overwrite("d", "t", Seq((1L, "x")).toDF("k", "v"))
    spark.sql("CREATE VIEW r16c.d.v AS SELECT k FROM r16c.d.t")
    val live = intercept[IllegalArgumentException] {
      spark.sql("RESTORE TABLE r16c.d.v TO VERSION AS OF 1")
    }
    assert(live.getMessage.contains("view"), live.getMessage)
    spark.sql("DROP VIEW r16c.d.v")
    // dropped view: the target commit is a view-definition commit — the
    // name must NOT come back as an empty table
    val dropped = intercept[IllegalArgumentException] {
      wh.restoreToVersion("d", "v", 1)
    }
    assert(dropped.getMessage.contains("view"), dropped.getMessage)
    assert(!wh.exists("d", "v"), "restore resurrected a dropped view as a table")
    // S9 copy-out restore refuses a view snapshot the same way (as-of
    // the definition commit's own timestamp — a later ts resolves to
    // the drop commit and refuses on that branch instead)
    val viewTs = wh.log("d", "v").version(1).get.tsMillis
    val co = intercept[IllegalArgumentException] {
      wh.restore("d", "v", viewTs, "d", "recovered")
    }
    assert(co.getMessage.contains("view definition"), co.getMessage)
  }

  test("persisted-view temp guard sees subquery expressions and global_temp") {
    val wh = mountCatalog("r16d", freshRoot().toString)
    wh.overwrite("d", "t", Seq((1L, "x")).toDF("k", "v"))
    Seq(9L).toDF("k").createOrReplaceTempView("tmp_r16")
    val sub = intercept[IllegalArgumentException] {
      spark.sql("CREATE VIEW r16d.d.v AS SELECT k FROM r16d.d.t " +
        "WHERE EXISTS (SELECT 1 FROM tmp_r16)")
    }
    assert(sub.getMessage.contains("tmp_r16"), sub.getMessage)
    Seq(9L).toDF("k").createOrReplaceGlobalTempView("gtmp_r16")
    val glob = intercept[IllegalArgumentException] {
      spark.sql("CREATE VIEW r16d.d.v AS " +
        "SELECT k FROM global_temp.gtmp_r16")
    }
    assert(glob.getMessage.contains("gtmp_r16"), glob.getMessage)
    // CTE names still shadow: same name as the temp view is fine
    spark.sql("CREATE VIEW r16d.d.v AS " +
      "WITH tmp_r16 AS (SELECT k FROM r16d.d.t) SELECT k FROM tmp_r16")
    assert(spark.sql("SELECT k FROM r16d.d.v").head.getLong(0) === 1L)
    spark.catalog.dropTempView("tmp_r16")
    spark.catalog.dropGlobalTempView("gtmp_r16")
  }

  test("rename rollback clears partial view artifacts; fail-loud on data") {
    val wh = mountCatalog("r16e", freshRoot().toString)
    wh.overwrite("d", "old", Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    // simulate the mid-createView failure window by hand: directory
    // moved, a partial redirect view written at the vacated old path
    wh.moveTable("d", "old", "d", "nw")
    wh.createView("d", "old", StoredView(
      sql = "SELECT * FROM r16e.d.nw", currentCatalog = "r16e",
      currentNamespace = Seq("d"), schemaDdl = "",
      queryColumnNames = Seq.empty, columnAliases = Seq.empty,
      columnComments = Seq.empty, properties = Map.empty),
      orReplace = false)
    graft.admin.Migrate.rollbackRename(wh, "d", "old", "d", "nw")
    assert(!wh.isView("d", "old"), "partial view artifacts survived rollback")
    assert(wh.exists("d", "old") && !wh.exists("d", "nw"))
    assert(wh.read("d", "old").count() === 2L)
    // anything with DATA commits at the old path must never be deleted
    wh.overwrite("d", "occupied", Seq(3L).toDF("k"))
    val e = intercept[IllegalArgumentException] {
      wh.removePartialView("d", "occupied")
    }
    assert(e.getMessage.contains("data commits"), e.getMessage)
    assert(wh.read("d", "occupied").count() === 1L)
  }
}
