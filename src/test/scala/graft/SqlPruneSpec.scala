package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import graft.core.{TableMeta, Warehouse}
import graft.sql.GraftCatalog

/** SQL reads prune through the snapshot-log sidecars at PLAN time: a
  * `WHERE` directly over a catalog relation splices the zone/Bloom-
  * pruned warehouse read ([[graft.sql.GraftRelationSubstitution]] →
  * [[graft.core.Warehouse.readPrunedResolved]]) — a point query through
  * SQL must open the files that may hold the key, not footer-read the
  * whole snapshot — while staying EXACTLY `read().filter()`. */
class SqlPruneSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private val root = Files.createTempDirectory("graft_prune").toString
  spark.conf.set("spark.sql.catalog.gp", classOf[GraftCatalog].getName)
  spark.conf.set("spark.sql.catalog.gp.root", root)
  private val wh = new Warehouse(spark, root)

  /** Parquet files the plan's scans would open (logical level — stable
    * under AQE). */
  private def scannedFiles(df: DataFrame): Long =
    df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.inputFiles.length.toLong
        case _ => 0L
      }
    }.sum

  // a z-ordered table: 256×256 grid, ~16 narrow-zone files
  wh.overwrite("d", "z", spark.range(65536)
    .select((col("id") % 256).as("a"), floor(col("id") / 256).as("b"),
      col("id").as("rid")).repartition(1))
  wh.zorderCluster("d", "z", "a", "b", targetBytes = 32 << 10)
  private val totalFiles = scannedFiles(spark.sql("SELECT * FROM gp.d.z"))

  test("WHERE over a catalog relation opens a subset of the snapshot's files") {
    assert(totalFiles >= 8, s"fixture produced too few files: $totalFiles")
    val q = spark.sql("SELECT rid FROM gp.d.z WHERE a = 7")
    assert(scannedFiles(q) < totalFiles,
      s"SQL point query scanned all $totalFiles files")
    assert(q.count() === 256L)
    // both dimensions prune on the z layout
    val qb = spark.sql("SELECT rid FROM gp.d.z WHERE b = 9")
    assert(scannedFiles(qb) < totalFiles)
    assert(qb.count() === 256L)
    // exactness: pruned SQL ≡ full read + filter
    assert(q.orderBy("rid").collect().map(_.getLong(0)).toSeq ===
      wh.read("d", "z").filter(col("a") === 7).select("rid").orderBy("rid")
        .collect().map(_.getLong(0)).toSeq)
  }

  test("a WHERE that matches nothing prunes to zero files, zero rows") {
    val q = spark.sql("SELECT * FROM gp.d.z WHERE a = 9999")
    assert(q.count() === 0L)
    assert(scannedFiles(q) === 0L)
  }

  test("pruned SQL reads keep MoR-deleted rows deleted") {
    wh.overwrite("d", "m", spark.range(4096)
      .select(col("id").as("k"), (col("id") % 97).as("v")).repartition(4))
    wh.deleteWhereMor("d", "m", col("k") < 100L)
    val got = spark.sql("SELECT count(*) AS n FROM gp.d.m WHERE k < 200").head().getLong(0)
    assert(got === 100L, s"deletion vector ignored through the pruned path: $got")
  }

  test("renamed and defaulted columns stay correct (conservative no-prune)") {
    wh.overwrite("d", "r", Seq((1L, 10L), (2L, 20L)).toDF("k", "v"))
    wh.renameColumn("d", "r", "v", "val")
    wh.addColumn("d", "r", "w", "BIGINT", Some("5"))
    val rows = spark.sql("SELECT k, val, w FROM gp.d.r WHERE val >= 10")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq === Seq((1L, 10L, 5L), (2L, 20L, 5L)))
  }

  test("time travel composes with SQL pruning") {
    val v = wh.log("d", "z").latest.get.version
    val q = spark.sql(s"SELECT rid FROM gp.d.z VERSION AS OF $v WHERE a = 3")
    assert(q.count() === 256L)
    assert(scannedFiles(q) < totalFiles)
  }

  test("a hive-partitioned table prunes SQL equality on the partition column") {
    wh.overwrite("d", "p",
      ((1L to 50L).map(i => (i, "x")) ++ (100L to 160L).map(i => (i, "y")))
        .toDF("k", "p"),
      TableMeta(partitionField = Some("p"), partitionType = "string"))
    val all = scannedFiles(spark.sql("SELECT * FROM gp.d.p"))
    val q = spark.sql("SELECT k FROM gp.d.p WHERE p = 'x'")
    assert(scannedFiles(q) < all)
    assert(q.count() === 50L)
  }

  test("joins and filters above projections still read correctly (no prune path)") {
    // the pruning splice only fires for Filter-DIRECTLY-over-relation;
    // everything else keeps the plain substitution and exact results
    val n = spark.sql(
      """SELECT count(*) AS n FROM gp.d.z x JOIN gp.d.z y ON x.rid = y.rid
        |WHERE x.a = 1 AND y.b = 1""".stripMargin).head().getLong(0)
    assert(n === 1L) // rid with a=1 and b=1: id = 1 + 256 = 257 → exactly one
  }
}
