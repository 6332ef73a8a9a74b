package graft

import java.nio.file.{Files, Path}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Warehouse
import graft.sql.{GraftCatalog, GraftSql}

/** `ALTER COLUMN ... SET|DROP DEFAULT / SET|DROP NOT NULL / COMMENT` —
  * the rest of the column-DDL surface, each metadata-only with the
  * scale-conscious validation contract:
  *
  *  - SET NOT NULL proves the standing table clean from zone-map null
  *    counts (scan-free); fragments the sidecars can't prove (a
  *    deletion-vector mask may hide the null) fall back to one pruned
  *    existence probe — and a masked null must NOT block the change;
  *  - SET/DROP DEFAULT refuses while any live fragment physically
  *    lacks the column: in a read-time-default engine those rows serve
  *    the CURRENT default, so changing it would silently rewrite what
  *    existing rows read as;
  *  - nullability pins into the commit schema (time travel serves it
  *    as of the commit read) and into write enforcement.
  */
class ColumnDdlSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private def freshRoot(): Path = Files.createTempDirectory("col_ddl")

  private def mountCatalog(name: String, root: String): Warehouse = {
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    new Warehouse(spark, root)
  }

  test("SET NOT NULL: sidecar-proven, refusal on nulls, write enforcement") {
    val wh = new Warehouse(spark, freshRoot().toString)
    wh.overwrite("d", "t", Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    wh.setColumnNullability("d", "t", "v", nullable = false)
    assert(!wh.schema("d", "t")("v").nullable)
    // time travel BEFORE the alter serves the nullable schema
    assert(wh.readVersion("d", "t", 1).schema("v").nullable)
    // write enforcement: a null v now rejects
    val bad = intercept[IllegalArgumentException] {
      wh.append("d", "t", Seq((3L, null: String)).toDF("k", "v"))
    }
    assert(bad.getMessage.contains("NOT NULL"), bad.getMessage)
    // standing nulls refuse the declaration
    val wh2 = new Warehouse(spark, freshRoot().toString)
    wh2.overwrite("d", "t", Seq((1L, "a"), (2L, null: String)).toDF("k", "v"))
    val e = intercept[IllegalArgumentException] {
      wh2.setColumnNullability("d", "t", "v", nullable = false)
    }
    assert(e.getMessage.contains("nulls"), e.getMessage)
    // DROP NOT NULL reverts metadata and enforcement
    wh.setColumnNullability("d", "t", "v", nullable = true)
    wh.append("d", "t", Seq((3L, null: String)).toDF("k", "v"))
    assert(wh.read("d", "t").count() === 3L)
  }

  test("SET NOT NULL fallback: a deletion-vector-masked null must not block") {
    val wh = new Warehouse(spark, freshRoot().toString)
    wh.overwrite("d", "t", Seq((1L, "a"), (2L, null: String)).toDF("k", "v"))
    // MoR-delete the one null row: the sidecar still says nulls=1 (it
    // describes the physical fragment), so the proof fails and the
    // pruned probe must look through the mask and find the table clean
    wh.deleteWhereMor("d", "t", col("v").isNull)
    wh.setColumnNullability("d", "t", "v", nullable = false)
    assert(!wh.schema("d", "t")("v").nullable)
  }

  test("SET/DROP DEFAULT: refuses over absent-column fragments, works clean") {
    val wh = new Warehouse(spark, freshRoot().toString)
    wh.overwrite("d", "t", Seq((1L, "a")).toDF("k", "v"))
    wh.addColumn("d", "t", "tag", "STRING", Some("'old'"))
    // the v1 fragment physically lacks `tag` and serves the default —
    // changing it would rewrite what that row reads as
    val e = intercept[IllegalArgumentException] {
      wh.setColumnDefault("d", "t", "tag", Some("'new'"))
    }
    assert(e.getMessage.contains("physically lack"), e.getMessage)
    assert(wh.read("d", "t").select("tag").as[String].head() === "old")
    // overwrite materializes the column; the change is now safe
    wh.overwrite("d", "t", wh.read("d", "t"))
    wh.setColumnDefault("d", "t", "tag", Some("'new'"))
    // existing rows keep their materialized value ...
    assert(wh.read("d", "t").select("tag").as[String].head() === "old")
    // ... and a future narrow write takes the NEW default
    wh.append("d", "t", Seq((2L, "b")).toDF("k", "v"))
    assert(wh.read("d", "t").filter($"k" === 2L).select("tag")
      .as[String].head() === "new")
    // DROP DEFAULT: same safety gate applies (absent cells would flip
    // default -> null); the k=2 fragment lacks `tag`, so it refuses
    val e2 = intercept[IllegalArgumentException] {
      wh.setColumnDefault("d", "t", "tag", None)
    }
    assert(e2.getMessage.contains("physically lack"), e2.getMessage)
    wh.overwrite("d", "t", wh.read("d", "t"))
    wh.setColumnDefault("d", "t", "tag", None)
    assert(wh.meta("d", "t").columnDefaults.isEmpty)
  }

  test("SQL lands the verbs on both entry points") {
    val root = freshRoot().toString
    val wh = mountCatalog("cddl", root)
    wh.overwrite("d", "t", Seq((1L, "a", 2.0), (2L, "b", 3.0))
      .toDF("k", "v", "x"))
    GraftSql.register(spark, "cddl_t", wh, "d", "t")
    spark.sql("ALTER TABLE cddl_t ALTER COLUMN v SET NOT NULL")
    assert(!wh.schema("d", "t")("v").nullable)
    spark.sql("ALTER TABLE cddl_t ALTER COLUMN v DROP NOT NULL")
    assert(wh.schema("d", "t")("v").nullable)
    spark.sql("ALTER TABLE cddl_t ALTER COLUMN v SET DEFAULT 'zz'")
    assert(wh.meta("d", "t").columnDefaults === Seq("v" -> "'zz'"))
    spark.sql("ALTER TABLE cddl_t ALTER COLUMN v DROP DEFAULT")
    assert(wh.meta("d", "t").columnDefaults.isEmpty)
    spark.sql("ALTER TABLE cddl_t ALTER COLUMN x COMMENT 'measured'")
    assert(wh.schema("d", "t")("x").getComment().contains("measured"))
    // catalog-qualified path on a GENUINELY nullable column: SET NOT
    // NULL intercepts at parse time (Spark's own v2 resolution refuses
    // nullability tightening outright — it cannot know the connector
    // validates the standing data); DROP NOT NULL relaxes natively
    // through the DSv2 TableChange
    wh.overwrite("d", "t2", Seq((1L, 2.0), (2L, 3.0)).toDF("k", "x")
      .withColumn("x", when($"k" > 0, $"x")))
    assert(wh.schema("d", "t2")("x").nullable, "precondition: nullable")
    spark.sql("ALTER TABLE cddl.d.t2 ALTER COLUMN x SET NOT NULL")
    assert(!wh.schema("d", "t2")("x").nullable)
    spark.sql("ALTER TABLE cddl.d.t2 ALTER COLUMN x DROP NOT NULL")
    assert(wh.schema("d", "t2")("x").nullable)
  }
}
