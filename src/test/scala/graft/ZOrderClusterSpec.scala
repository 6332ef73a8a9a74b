package graft

import java.nio.file.Files
import scala.jdk.CollectionConverters._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.{TableMeta, Warehouse}
import graft.sql.GraftSql

/** `OPTIMIZE t ZORDER BY (a, b)` — the z-curve layout rewrite through
  * the warehouse: after the rewrite, per-file zone maps must prune a
  * point predicate on EITHER column to a small fraction of the files
  * (the lexicographic recluster prunes only the first). */
class ZOrderClusterSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  /** 256×256 grid written as ONE file in row-major order: the raw
    * layout has no useful locality once split by row ranges ('a' cycles
    * every 256 rows, 'b' spans the whole file). */
  private def grid(): DataFrame = spark.range(65536)
    .select((col("id") % 256).as("a"), floor(col("id") / 256).as("b"),
      col("id").as("rid"))

  private def freshZ(): Warehouse = {
    val wh = new Warehouse(spark, Files.createTempDirectory("zorder").toString)
    wh.overwrite("d", "z", grid().repartition(1))
    wh
  }

  private def fragmentBytes(wh: Warehouse): Long = {
    val td = java.nio.file.Paths.get(wh.root, "d", "z")
    val c = wh.log("d", "z").latest.get
    c.entries.map { e =>
      Files.walk(td.resolve(e.path)).iterator().asScala
        .filter(p => Files.isRegularFile(p) &&
          p.getFileName.toString.endsWith(".parquet"))
        .map(Files.size).sum
    }.sum
  }

  test("zorderCluster prunes point predicates on BOTH columns") {
    val wh = freshZ()
    val before = wh.read("d", "z").orderBy("rid").collect()
    wh.zorderCluster("d", "z", "a", "b",
      targetBytes = math.max(1L, fragmentBytes(wh) / 16))
    // layout moved, data did not
    val after = wh.read("d", "z").orderBy("rid").collect()
    assert(after === before)
    val (sa, total) = wh.scanFootprint("d", "z", col("a") === 7L)
    val (sb, _) = wh.scanFootprint("d", "z", col("b") === 7L)
    assert(total >= 8, s"rewrite produced too few files to test pruning: $total")
    assert(sa <= total / 2, s"a-predicate scanned $sa of $total files")
    assert(sb <= total / 2, s"b-predicate scanned $sb of $total files")
    // exactness through the pruned read path
    assert(wh.readWhere("d", "z", col("a") === 7L).count() === 256L)
    assert(wh.readWhere("d", "z", col("b") === 7L).count() === 256L)
    // time travel to the pre-rewrite commit keeps the OLD layout/data
    val v = wh.log("d", "z").latest.get.version - 1
    assert(wh.readVersion("d", "z", v).count() === 65536L)
  }

  test("the lexicographic recluster does NOT prune the second column " +
    "(the gap z-order exists to close)") {
    val wh = freshZ()
    wh.setMeta("d", "z", TableMeta(clusteringFields = Seq("a", "b")))
    wh.recluster("d", "z", targetBytes = math.max(1L, fragmentBytes(wh) / 16))
    val (sa, total) = wh.scanFootprint("d", "z", col("a") === 7L)
    val (sb, _) = wh.scanFootprint("d", "z", col("b") === 7L)
    assert(sa <= total / 2, "recluster must prune its first clustering column")
    assert(sb == total,
      s"expected no second-column pruning from the lexicographic sort, got $sb/$total")
  }

  test("OPTIMIZE ... ZORDER BY (a, b) lands through SQL") {
    val wh = freshZ()
    GraftSql.register(spark, "zsql", wh, "d", "z")
    spark.conf.set("spark.graft.optimize.targetBytes",
      math.max(1L, fragmentBytes(wh) / 16).toString)
    val out =
      try spark.sql("OPTIMIZE zsql ZORDER BY (a, b)").collect()
      finally spark.conf.unset("spark.graft.optimize.targetBytes")
    assert(out.map(_.getString(0)).toSeq === Seq(""))
    val (sa, total) = wh.scanFootprint("d", "z", col("a") === 3L)
    val (sb, _) = wh.scanFootprint("d", "z", col("b") === 3L)
    assert(total >= 2 && sa < total && sb < total,
      s"SQL z-order must prune both columns: $sa/$sb of $total")
    assert(spark.sql("SELECT count(*) AS c FROM zsql").head().getLong(0) === 65536L)
    // plain OPTIMIZE still compacts (the clause is optional)
    spark.sql("OPTIMIZE zsql").collect()
  }

  test("refusals: partition column on the curve, unordered columns, duplicate columns") {
    val wh = new Warehouse(spark, Files.createTempDirectory("zorder_r").toString)
    wh.overwrite("d", "p", Seq((1L, 5L, "2024-01-01")).toDF("k", "s", "day"),
      TableMeta(partitionField = Some("day"), partitionType = "string"))
    // the hive layout already prunes the partition dimension — naming
    // it on the curve wastes half the interleave
    val e1 = intercept[IllegalArgumentException] {
      wh.zorderCluster("d", "p", "k", "day")
    }
    assert(e1.getMessage.contains("partition column"))
    wh.overwrite("d", "u", Seq((1L, "x", 2L)).toDF("k", "s", "v"))
    val e2 = intercept[IllegalArgumentException] {
      wh.zorderCluster("d", "u", "k", "s")
    }
    assert(e2.getMessage.contains("no sound rank order"))
    val e3 = intercept[IllegalArgumentException] {
      wh.zorderCluster("d", "u", "k", "k")
    }
    assert(e3.getMessage.contains("must be distinct"))
    intercept[IllegalArgumentException] {
      wh.zorderCluster("d", "u", "k", "nope")
    }
  }

  test("partitioned tables z-order WITHIN each partition; siblings untouched") {
    val wh = new Warehouse(spark, Files.createTempDirectory("zorder_part").toString)
    // two date partitions, 64x64 grid each, deliberately many small
    // fragments so the rewrite has something to reorganize
    def grid(day: String, seed: Long) = spark.range(4096).select(
      lit(day).as("day"),
      ((col("id") + seed) % 64).as("a"),
      floor(col("id") / 64).as("b"),
      col("id").as("rid"))
    wh.overwrite("d", "t", grid("2024-01-01", 0),
      TableMeta(partitionField = Some("day"), partitionType = "string"))
    wh.insertOverwrite("d", "t", grid("2024-01-02", 7))
    val before = wh.log("d", "t").latest.get.entries
    val untouchedBefore = before.filter(_.partition == "2024-01-02")
    // z-order ONLY makes sense per partition now; ~16 files per partition
    val landed = wh.zorderCluster("d", "t", "a", "b", targetBytes = 2L << 10)
    assert(landed === Seq("2024-01-01", "2024-01-02"))
    val after = wh.log("d", "t").latest.get.entries
    assert(after.size === 2, s"one z-ordered entry per partition: $after")
    // data identical
    assert(wh.read("d", "t").count() === 8192L)
    assert(wh.read("d", "t").orderBy("day", "rid").collect()
      === grid("2024-01-01", 0).union(grid("2024-01-02", 7))
        .orderBy("day", "rid").collect())
    // both-dimension file pruning INSIDE a partition: point probes on a
    // and b each open a minority of the partition's files
    val (sa, total) = wh.scanFootprint("d", "t",
      col("day") === "2024-01-01" && col("a") === 3L)
    val (sb, totalB) = wh.scanFootprint("d", "t",
      col("day") === "2024-01-01" && col("b") === 3L)
    assert(total >= 8, s"z-order should produce several files, got $total")
    assert(sa <= total * 3 / 4 && sb <= totalB * 3 / 4,
      s"z-order must prune BOTH dims within a partition: $sa/$total, $sb/$totalB")
  }

  test("THREE-column z-order prunes point predicates on every dimension") {
    val wh = new Warehouse(spark, Files.createTempDirectory("zorder3").toString)
    // 16x16x16 grid in row-major order: raw row ranges have locality in
    // NO dimension except the slowest-varying one
    wh.overwrite("d", "z3", spark.range(16L * 16 * 16 * 16).select(
      (col("id") % 16).as("a"),
      floor(col("id") / 16) % 16 as "b",
      floor(col("id") / 256) % 16 as "c",
      col("id").as("rid")))
    val before = wh.read("d", "z3").orderBy("rid").collect()
    wh.zorderCluster("d", "z3", Seq("a", "b", "c"),
      targetBytes = 8L << 10, onlyPartitions = None)
    assert(wh.read("d", "z3").orderBy("rid").collect() === before)
    val (sa, total) = wh.scanFootprint("d", "z3", col("a") === 3L)
    val (sb, _) = wh.scanFootprint("d", "z3", col("b") === 3L)
    val (sc, _) = wh.scanFootprint("d", "z3", col("c") === 3L)
    assert(total >= 8, s"too few files: $total")
    assert(sa < total && sb < total && sc < total,
      s"3-dim z-order must prune ALL dims: $sa/$sb/$sc of $total")
    // SQL arity: 3 columns parse and run
    spark.conf.set("spark.sql.catalog.z3c", classOf[graft.sql.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.z3c.root", wh.root)
    spark.sql("OPTIMIZE z3c.d.z3 ZORDER BY (a, b, c)").collect()
  }

  test("HIDDEN-partitioned tables z-order within derived partitions") {
    val wh = new Warehouse(spark, Files.createTempDirectory("zorder_hid").toString)
    // hidden bucket(2) partition derived from rid: the synthetic column
    // lives only in the layout; z-order must rewrite within each bucket
    // dir and reads must stay identical (no synthetic column surfaced)
    val df = spark.range(4096).select(
      col("id").as("rid"), (col("id") % 64).as("a"),
      floor(col("id") / 64).as("b"))
    wh.overwrite("d", "h", df, TableMeta(
      partitionField = Some("_bucket"), partitionType = "string",
      partitionTransform = Some("bucket[2]"), partitionSource = Some("rid")))
    val before = wh.read("d", "h").orderBy("rid").collect()
    val landed = wh.zorderCluster("d", "h", "a", "b", targetBytes = 2L << 10)
    assert(landed.size === 2, s"both hidden buckets must land: $landed")
    val after = wh.read("d", "h")
    assert(!after.columns.contains("_bucket"),
      "the synthetic partition column must never surface")
    assert(after.orderBy("rid").collect() === before)
  }

  test("partitioned z-order abandons a partition superseded mid-rewrite — via CAS identity") {
    // (structural check: zorderCluster reports LANDED partitions only;
    // the compact() CAS contract it reuses is spec-gated in CompactSpec)
    val wh = new Warehouse(spark, Files.createTempDirectory("zorder_cas").toString)
    wh.overwrite("d", "t", Seq(("2024-01-01", 1L, 2L)).toDF("day", "a", "b"),
      TableMeta(partitionField = Some("day"), partitionType = "string"))
    val landed = wh.zorderCluster("d", "t", "a", "b")
    assert(landed === Seq("2024-01-01"))
  }

  test("date and timestamp columns rank soundly on the curve") {
    val wh = new Warehouse(spark, Files.createTempDirectory("zorder_dt").toString)
    wh.overwrite("d", "t", spark.range(4096).select(
      date_add(lit("2024-01-01"), (col("id") % 64).cast("int")).as("day"),
      (col("id") / 64).as("n"), col("id").as("rid")))
    val before = wh.read("d", "t").orderBy("rid").collect()
    wh.zorderCluster("d", "t", "day", "n", targetBytes = 1L << 12)
    assert(wh.read("d", "t").orderBy("rid").collect() === before)
    assert(wh.readWhere("d", "t", col("day") === "2024-01-10").count() === 64L)
  }
}
