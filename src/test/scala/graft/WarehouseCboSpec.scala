package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Warehouse

/** Zone-sidecar statistics feeding Catalyst CBO: warehouse reads carry
  * exact row counts and integral-column ranges/ndv bounds, so with
  * `spark.sql.cbo.enabled` join-size estimation runs on cardinalities
  * instead of file sizes — the decisions file sizes cannot make. */
class WarehouseCboSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private def fresh(): Warehouse =
    new Warehouse(spark, Files.createTempDirectory("cbo_spec").toString)

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("read() plans carry exact rowCount and integral column stats") {
    val wh = fresh()
    wh.overwrite("d", "t", spark.range(1000).select(
      col("id").as("k"), (col("id") % 7).as("g")))
    wh.append("d", "t", spark.range(1000, 1500).select(
      col("id").as("k"), (col("id") % 7).as("g")))
    withConf("spark.sql.cbo.enabled" -> "true") {
      val st = wh.read("d", "t").queryExecution.optimizedPlan.stats
      assert(st.rowCount === Some(BigInt(1500)), s"stats: $st")
      val kStat = st.attributeStats.find(_._1.name == "k").map(_._2)
      assert(kStat.isDefined, "column stats for k must surface")
      assert(kStat.get.min.contains(0L) || kStat.get.min.map(_.toString).contains("0"))
      assert(kStat.get.distinctCount === Some(BigInt(1500)))
    }
  }

  test("a selective filter's ESTIMATED cardinality switches the join to broadcast") {
    val wh = fresh()
    // incompressible payload: the on-disk footprint must genuinely sit
    // above the broadcast threshold (a constant pad compresses to KBs)
    val payload = sha2(concat(col("id").cast("string"), lit("salt")), 256)
    // two ~2 MB facts, both far above the broadcast threshold by FILE
    // SIZE; `k < 300` keeps ~1% of f2 — only column stats can see that
    wh.overwrite("d", "f1", spark.range(30000)
      .select(col("id").as("k"), payload.as("p1")))
    wh.overwrite("d", "f2", spark.range(30000)
      .select(col("id").as("k"), payload.as("p2")))
    def isBroadcast(j: DataFrame): Boolean =
      j.queryExecution.executedPlan.toString.contains("BroadcastHashJoin")
    withConf(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "262144",
      "spark.sql.adaptive.enabled" -> "false") {
      val filtered = wh.read("d", "f2").filter(col("k") < 300)
      val est = filtered.queryExecution.optimizedPlan.stats
      assert(est.rowCount.exists(_ < BigInt(1000)),
        s"min/max stats must shrink the filter estimate, got $est")
      val stats = wh.read("d", "f1").join(filtered, "k")
      assert(isBroadcast(stats),
        s"with stats the 1% side must broadcast:\n${stats.queryExecution.executedPlan}")
      // control: the SAME data without sidecar stats keeps sort-merge —
      // a size-only Filter estimate stays at the child's 1 MB
      def plain(t: String): DataFrame = {
        val entries = wh.log("d", t).latest.get.entries
        val root = java.nio.file.Paths.get(wh.root, "d", t)
        spark.read.parquet(entries.map(e => root.resolve(e.path).toString): _*)
      }
      val bare = plain("f1").join(plain("f2").filter(col("k") < 300), "k")
      assert(!isBroadcast(bare),
        s"without stats the filter estimate is the file size — no broadcast:\n${bare.queryExecution.executedPlan}")
    }
  }

  test("3-table join REORDERS onto the small table with stats + cbo.joinReorder") {
    val wh = fresh()
    val payload = sha2(concat(col("id").cast("string"), lit("salt")), 256)
    wh.overwrite("d", "b1", spark.range(30000)
      .select(col("id").as("k"), payload.as("p1")))
    wh.overwrite("d", "b2", spark.range(30000)
      .select(col("id").as("k"), payload.as("p2")))
    wh.overwrite("d", "sm", spark.range(100)
      .select(col("id").as("k"), lit("s").as("ps")))
    withConf(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.cbo.joinReorder.enabled" -> "true",
      "spark.sql.adaptive.enabled" -> "false") {
      // written order joins the two BIG facts first; the optimizer must
      // pull the 100-row table into the INNER join instead
      val q = wh.read("d", "b1").join(wh.read("d", "b2"), "k")
        .join(wh.read("d", "sm"), "k")
      val joins = q.queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }
      assert(joins.size === 2)
      // innermost join (last in collect order) must touch d.sm
      val inner = joins.last.toString
      assert(inner.contains("d.sm"),
        s"stats-driven reorder must join the small table first:\n${q.queryExecution.optimizedPlan}")
    }
  }

  test("stats survive maintainDataset (refreshed sidecars keep the read path green)") {
    val wh = fresh()
    wh.overwrite("d", "m", spark.range(100).select(col("id").as("k")))
    wh.append("d", "m", spark.range(100, 130).select(col("id").as("k")))
    wh.maintainDataset("d")
    withConf("spark.sql.cbo.enabled" -> "true") {
      val st = wh.read("d", "m").queryExecution.optimizedPlan.stats
      assert(st.rowCount === Some(BigInt(130)),
        s"post-maintenance read must still carry exact rowCount: $st")
    }
  }
}
