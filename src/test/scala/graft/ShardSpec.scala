package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Shard

/** Sharded-export writer semantics: deterministic assignment, complete
  * and disjoint shard partition, file-size caps, stable re-export. */
class ShardSpec extends AnyFunSuite {
  import TestSession._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("assignShards partitions the corpus completely and deterministically") {
    import spark.implicits._
    val df = (1L to 500L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val a = Shard.assignShards(df, "doc_id", 8)
      .select("doc_id", "shard_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val b = Shard.assignShards(df, "doc_id", 8)
      .select("doc_id", "shard_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a === b)                               // stable across runs
    assert(a.keySet === (1L to 500L).toSet)       // complete: every doc placed
    assert(a.values.toSet.subsetOf((0L until 8L).toSet))
    // hash mixing: no shard hogs the corpus (binomial spread, wide margin)
    val sizes = a.values.groupBy(identity).view.mapValues(_.size)
    assert(sizes.values.forall(s => s > 20 && s < 120), sizes.toMap.toString)
  }

  test("appending documents never moves an existing document between shards") {
    import spark.implicits._
    val before = (1L to 100L).map(i => (i, "d")).toDF("doc_id", "text")
    val after = (1L to 150L).map(i => (i, "d")).toDF("doc_id", "text")
    val a = Shard.assignShards(before, "doc_id").select("doc_id", "shard_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val b = Shard.assignShards(after, "doc_id").select("doc_id", "shard_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a.forall { case (id, s) => b(id) == s })
  }

  test("writeShards lands shard directories with capped, readable files") {
    import spark.implicits._
    val df = (1L to 400L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val out = tmp("graft_shards")
    Shard.writeShards(df, "doc_id", out, numShards = 4,
      maxRecordsPerFile = 50L)
    val dirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("shard_id=")).sortBy(_.getName)
    assert(dirs.length === 4, dirs.map(_.getName).toSeq.toString)
    // every file respects the record cap
    for (d <- dirs; f <- d.listFiles() if f.getName.endsWith(".parquet")) {
      val n = spark.read.parquet(f.getAbsolutePath).count()
      assert(n <= 50L, s"${f.getName} has $n rows > cap 50")
    }
    // round trip: nothing lost, shard column reattached from the path
    val back = spark.read.parquet(out)
    assert(back.count() === 400L)
    assert(back.select(countDistinct(col("shard_id"))).head().getLong(0) === 4L)
  }

  test("z-curve locality: every aligned 256-z block is a 16x16 tile of the grid") {
    import spark.implicits._
    import graft.operators.ZOrder
    // DETERMINISTIC property of the curve itself (no range sampling
    // involved): contiguous aligned z-blocks are square tiles, which is
    // exactly what bounds per-file min/max once files hold z-ranges
    val grid = for { x <- 0 until 64; y <- 0 until 64 } yield (x, y)
    val spans = grid.toDF("x", "y")
      .withColumn("_z", ZOrder.zValue(col("x"), col("y")))
      .groupBy(expr("_z div 256").as("block"))
      .agg((max("x") - min("x")).as("xs"), (max("y") - min("y")).as("ys"),
        count(lit(1)).as("n"))
      .collect()
    assert(spans.length === 16)
    spans.foreach { r =>
      assert(r.getLong(3) === 256L, r.toString) // block is full
      assert(r.getInt(1) === 15 && r.getInt(2) === 15, r.toString)
    }
  }

  test("z-ordered write: per-file z-ranges are disjoint and internally sorted") {
    import spark.implicits._
    import graft.operators.ZOrder
    val grid = for { x <- 0 until 64; y <- 0 until 64 } yield (x, y)
    val out = tmp("graft_zorder")
    ZOrder.writeZOrdered(grid.toDF("x", "y"), "x", "y", out,
      numFiles = 16, maxRecordsPerFile = 10000L)
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length >= 8, s"expected >=8 files, got ${files.length}")
    val ranges = files.map { f =>
      val rows = spark.read.parquet(f.getAbsolutePath)
        .withColumn("_z", ZOrder.zValue(col("x"), col("y")))
        .select("_z").collect().map(_.getLong(0))
      assert(rows.toSeq === rows.sorted.toSeq, s"${f.getName} not z-sorted")
      (rows.min, rows.max)
    }.sortBy(_._1)
    // range partitioning guarantees disjoint per-file z-intervals —
    // the property that makes per-file min/max stats prunable
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi < lo2, ranges.mkString(","))
      case _ =>
    }
    assert(spark.read.parquet(out).count() === 4096L)
  }

  test("zValue rejects out-of-domain inputs at execution") {
    import spark.implicits._
    import graft.operators.ZOrder
    val bad = Seq((-1, 3)).toDF("a", "b")
      .select(ZOrder.zValue(col("a"), col("b")))
    val e = intercept[Exception] { bad.collect() }
    assert(e.getMessage.contains("zValue"), e.getMessage)
  }

  test("NULL text is pinned to one empty token in shard manifests and packing") {
    import spark.implicits._
    import graft.llmops.Pack
    // contract: NULL text == '' == one empty token on BOTH engines
    // (Spark size(split(NULL)) is -1, DuckDB len(string_split(NULL)) is
    // NULL — the coalesce in qShards/packSequences/chunkDocs removes the
    // divergence; DuckDB len(string_split(coalesce(NULL,''),' ')) = 1)
    val docs = Seq((1L, "two tokens"), (2L, null.asInstanceOf[String]),
      (3L, "")).toDF("doc_id", "text")
    val manifest = Shard.assignShards(docs, "doc_id", 1)
      .groupBy(col("shard_id"))
      .agg(sum(size(split(coalesce(col("text"), lit("")), " ")).cast("long"))
        .as("n_tokens")).head()
    assert(manifest.getLong(1) === 4L) // 2 + 1 + 1, never 2 + (-1) + 1
    val packed = Pack.packSequences(docs, 4).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(packed.toSeq === Seq((1L, 2L, 0L), (2L, 1L, 2L), (3L, 1L, 3L)))
    val chunks = Pack.chunkDocs(docs).groupBy("doc_id").count()
      .orderBy("doc_id").collect().map(_.getLong(1))
    assert(chunks.toSeq === Seq(1L, 1L, 1L)) // every doc emits >=1 chunk
  }

  test("re-export of identical input produces identical shard membership") {
    import spark.implicits._
    val df = (1L to 200L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val out1 = tmp("graft_shards_a")
    val out2 = tmp("graft_shards_b")
    Shard.writeShards(df, "doc_id", out1, numShards = 4)
    Shard.writeShards(df, "doc_id", out2, numShards = 4)
    def membership(p: String): Map[Long, Long] =
      // shard_id is re-inferred from the partition path (int, not long)
      spark.read.parquet(p).select("doc_id", "shard_id").collect()
        .map(r => (r.getLong(0), r.getAs[Number](1).longValue())).toMap
    assert(membership(out1) === membership(out2))
  }

  test("balancedShards: deal order matches the global size rank; token mass stays tight") {
    val docs = graft.core.Tables.load(spark, TestSession.sf, "documents")
    val got = Shard.balancedShards(docs, numShards = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // replay: rank by (tokens desc, id), deal round-robin
    val expected = got.map(t => (t._1, t._2)).sortBy { case (id, n) => (-n, id) }
      .zipWithIndex.map { case ((id, n), i) => (id, n, (i % 4).toLong) }.toSet
    assert(got.toSet === expected)
    // balance: shard token masses within a couple of max-doc-sizes, far
    // tighter than count-balanced hash sharding can guarantee
    val sums = got.groupBy(_._3).view.mapValues(_.map(_._2).sum).toMap
    val maxDoc = got.map(_._2).max
    assert(sums.size === 4)
    assert(sums.values.max - sums.values.min <= 2 * maxDoc,
      s"imbalance ${sums.values.max - sums.values.min} vs max doc $maxDoc")
    // no single-partition funnel: the rank comes from the range-stitch
    val plan = Shard.balancedShards(docs, 4)
      .queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!plan.contains("SinglePartition"), plan.take(1500))
  }
}
