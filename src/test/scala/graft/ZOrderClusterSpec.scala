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

  test("refusals: partitioned tables, unordered columns, duplicate columns") {
    val wh = new Warehouse(spark, Files.createTempDirectory("zorder_r").toString)
    wh.overwrite("d", "p", Seq((1L, "x", "2024-01-01")).toDF("k", "s", "day"),
      TableMeta(partitionField = Some("day"), partitionType = "string"))
    val e1 = intercept[IllegalArgumentException] {
      wh.zorderCluster("d", "p", "k", "s")
    }
    assert(e1.getMessage.contains("hive-partitioned"))
    wh.overwrite("d", "u", Seq((1L, "x", 2L)).toDF("k", "s", "v"))
    val e2 = intercept[IllegalArgumentException] {
      wh.zorderCluster("d", "u", "k", "s")
    }
    assert(e2.getMessage.contains("no sound rank order"))
    val e3 = intercept[IllegalArgumentException] {
      wh.zorderCluster("d", "u", "k", "k")
    }
    assert(e3.getMessage.contains("two distinct columns"))
    intercept[IllegalArgumentException] {
      wh.zorderCluster("d", "u", "k", "nope")
    }
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
