package graft

import java.nio.file.{Files, Path}
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{TableMeta, Warehouse}
import graft.sql.{GraftCatalog, GraftSql}

/** Metadata-only `DROP COLUMN` (Delta/Iceberg semantics): one schema-pin
  * commit, zero fragments rewritten at any scale. The contract under
  * test:
  *
  *  - the column stops surfacing on every read path immediately;
  *  - time travel BEFORE the drop still serves it (per-commit schemas);
  *  - the column's default and NOT NULL declarations clear with it;
  *  - partition / unique-key / clustering membership, CHECK references
  *    and the last remaining column refuse loudly;
  *  - re-ADDING the dropped name refuses while pre-drop fragments
  *    survive (their physical bytes would resurrect as the new
  *    column's values — no field IDs to disambiguate) and works after
  *    an overwrite clears them;
  *  - both SQL entry points land it: the registered bare name
  *    (parse-time interception) and the catalog-qualified
  *    `ALTER TABLE graft.ds.t DROP COLUMN` (DSv2 TableChange).
  */
class DropColumnSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private def freshRoot(): Path = Files.createTempDirectory("drop_col")

  private def mountCatalog(name: String, root: String): Warehouse = {
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    new Warehouse(spark, root)
  }

  test("drop is metadata-only; reads exclude it; time travel serves it") {
    val wh = new Warehouse(spark, freshRoot().toString)
    wh.overwrite("d", "t", Seq((1L, "a", 10.0), (2L, "b", 20.0))
      .toDF("k", "v", "x"))
    val entriesBefore = wh.log("d", "t").latest.get.entries.map(_.path)
    wh.dropColumn("d", "t", "x")
    // one alter commit, SAME fragment set — nothing rewritten
    val c = wh.log("d", "t").latest.get
    assert(c.action === "alter")
    assert(c.entries.map(_.path) === entriesBefore)
    assert(wh.read("d", "t").columns.toSeq === Seq("k", "v"))
    // the pre-drop version still serves the column with its values
    val old = wh.readVersion("d", "t", 1)
    assert(old.columns.contains("x"))
    assert(old.orderBy("k").select("x").as[Double].collect().toSeq
      === Seq(10.0, 20.0))
  }

  test("default and NOT NULL clear with the column; appends stay clean") {
    val wh = new Warehouse(spark, freshRoot().toString)
    wh.overwrite("d", "t", Seq((1L, "a")).toDF("k", "v"))
    wh.addColumn("d", "t", "tag", "STRING", Some("'z'"))
    wh.dropColumn("d", "t", "tag")
    val m = wh.meta("d", "t")
    assert(!m.columnDefaults.exists(_._1 == "tag"))
    assert(m.droppedColumns.map(_._1) === Seq("tag"))
    // post-drop appends write the narrowed schema and read back clean
    wh.append("d", "t", Seq((2L, "b")).toDF("k", "v"))
    assert(wh.read("d", "t").columns.toSeq === Seq("k", "v"))
    assert(wh.read("d", "t").count() === 2L)
  }

  test("constrained columns refuse; last column refuses") {
    val wh = new Warehouse(spark, freshRoot().toString)
    wh.overwrite("d", "t", Seq((1L, "a", "2024-01-01"))
      .toDF("k", "v", "p"),
      TableMeta(partitionField = Some("p"), partitionType = "string",
        uniqueKey = Seq("k", "p"),
        checkConstraints = Seq("v_ok" -> "v IS NOT NULL")))
    assert(intercept[IllegalArgumentException] {
      wh.dropColumn("d", "t", "p")
    }.getMessage.contains("partition"))
    assert(intercept[IllegalArgumentException] {
      wh.dropColumn("d", "t", "k")
    }.getMessage.contains("UNIQUE"))
    assert(intercept[IllegalArgumentException] {
      wh.dropColumn("d", "t", "v")
    }.getMessage.contains("CHECK"))
    val wh2 = new Warehouse(spark, freshRoot().toString)
    wh2.overwrite("d", "solo", Seq(1L).toDF("k"))
    assert(intercept[IllegalArgumentException] {
      wh2.dropColumn("d", "solo", "k")
    }.getMessage.contains("only column"))
  }

  test("re-add works IMMEDIATELY: tombstone link hides pre-drop bytes (field-ID semantics)") {
    val wh = new Warehouse(spark, freshRoot().toString)
    wh.overwrite("d", "t", Seq((1L, "secret")).toDF("k", "x"))
    wh.dropColumn("d", "t", "x")
    // r16 item 6: no refusal, no compaction needed — the re-add appends
    // a terminal tombstone rename link that (by fragment era) hides the
    // pre-drop bytes forever, exactly Iceberg's fresh-field-ID rule
    wh.addColumn("d", "t", "x", "STRING", Some("'fresh'"))
    val row = wh.read("d", "t").select("k", "x").as[(Long, String)].head()
    assert(row === (1L, "fresh"), "old bytes resurfaced as the new column")
    assert(wh.meta("d", "t").droppedColumns.isEmpty, "drop marker not cleared")
    // new fragments' x IS the new column; the old fragment's x stays hidden
    wh.append("d", "t", Seq((2L, "new")).toDF("k", "x"))
    assert(wh.read("d", "t").orderBy("k").select("x").as[String].collect().toSeq
      === Seq("fresh", "new"))
    // no-default re-add serves NULL for pre-drop rows (plain evolution)
    val wh2 = new Warehouse(spark, freshRoot().toString)
    wh2.overwrite("d", "t", Seq((1L, "secret")).toDF("k", "x"))
    wh2.dropColumn("d", "t", "x")
    wh2.addColumn("d", "t", "x", "STRING")
    assert(wh2.read("d", "t").select("x").collect().head.isNullAt(0),
      "pre-drop rows must read NULL under the re-added name")
    // time travel: before the drop the OLD x still serves its bytes
    assert(wh2.readVersion("d", "t", 1).select("x").as[String].head() === "secret")
  }

  test("SQL lands it on both entry points, IF EXISTS tolerated") {
    val root = freshRoot().toString
    val wh = mountCatalog("dcol", root)
    wh.overwrite("d", "t", Seq((1L, "a", 1.5), (2L, "b", 2.5))
      .toDF("k", "v", "x"))
    GraftSql.register(spark, "dropcol_t", wh, "d", "t")
    spark.sql("ALTER TABLE dropcol_t DROP COLUMN x")
    assert(spark.table("dropcol_t").columns.toSeq === Seq("k", "v"))
    spark.sql("ALTER TABLE dcol.d.t DROP COLUMN IF EXISTS v")
    assert(spark.sql("SELECT * FROM dcol.d.t").columns.toSeq === Seq("k"))
    // absent + IF EXISTS: no-op; absent without: loud
    spark.sql("ALTER TABLE dcol.d.t DROP COLUMN IF EXISTS nope")
    intercept[Exception] {
      spark.sql("ALTER TABLE dropcol_t DROP COLUMN nope")
    }
    assert(spark.sql("SELECT k FROM dcol.d.t ORDER BY k").as[Long]
      .collect().toSeq === Seq(1L, 2L))
  }
}
