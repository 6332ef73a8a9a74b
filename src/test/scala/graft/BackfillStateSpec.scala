package graft

import java.nio.file.Files
import java.time.LocalDate
import java.util.concurrent.atomic.AtomicInteger
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.backfill.{Backfill, BackfillState}
import graft.core.Warehouse

/** Durable backfill task-state: planned rows land before any task runs,
  * completions append as they happen, and retry-from-state re-runs
  * exactly the not-succeeded ranges (backfill.py:369-422, 475-529). */
class BackfillStateSpec extends AnyFunSuite {
  import TestSession._

  private val d = LocalDate.parse(_: String)
  private def freshWh(): Warehouse =
    new Warehouse(spark, Files.createTempDirectory("bf_state").toString)
  private val fourTasks = Backfill.chunkDateRange(d("2025-01-01"), d("2025-01-08"), 2)

  test("warehouse append adds fragments without touching existing ones") {
    val wh = freshWh()
    import spark.implicits._
    wh.append("ops", "log", Seq((1, "a")).toDF("id", "v"))
    val firstCommit = wh.log("ops", "log").latest.get
    wh.append("ops", "log", Seq((2, "b"), (3, "c")).toDF("id", "v"))
    assert(wh.read("ops", "log").orderBy("id").collect().map(_.getInt(0)).toSeq === Seq(1, 2, 3))
    // the first fragment is carried forward by path, not rewritten
    val latest = wh.log("ops", "log").latest.get
    assert(latest.entries.map(_.path).contains(firstCommit.entries.head.path))
    assert(latest.entries.size === 2)
  }

  test("killed task leaves failed state; retry re-runs only that range") {
    val wh = freshWh()
    val ran = scala.collection.mutable.Set.empty[LocalDate]
    val results = BackfillState.runPersisted(wh, "job-a", fourTasks, parallelism = 4) { r =>
      if (r._1 == d("2025-01-05")) sys.error("task killed") else ran += r._1
    }
    assert(results.count(_.success) === 3)
    val plan = BackfillState.retryFromState(wh, "job-a")
    assert(plan.previousRanges === fourTasks)
    assert(plan.failedIndices === Seq(2))
    assert(plan.ranges === Seq((d("2025-01-05"), d("2025-01-06"))))
    // retry succeeds → a fresh execution; next retry has nothing to do
    val (_, retried) = BackfillState.retry(wh, "job-a") { r => ran += r._1 }
    assert(retried.map(_.success) === Seq(true))
    assert(BackfillState.retryFromState(wh, "job-a").ranges === Nil)
    assert(ran.toSeq.sorted.map(_.toString) ===
      Seq("2025-01-01", "2025-01-03", "2025-01-05", "2025-01-07"))
  }

  test("serial death mid-run: untouched tail stays planned and is retried") {
    val wh = freshWh()
    // serial mode stops at the first failure — tasks 2 and 3 never run,
    // so they have NO completion row (the driver-death shape) and must
    // still count as retryable.
    BackfillState.runPersisted(wh, "job-b", fourTasks, parallelism = 1) { r =>
      if (r._1 == d("2025-01-03")) sys.error("boom")
    }
    val evs = BackfillState.events(wh, "job-b")
    assert(evs.filter(col("event") === "planned").count() === 4)
    assert(evs.filter(col("event") === "succeeded").count() === 1)
    assert(evs.filter(col("event") === "failed").count() === 1)
    val plan = BackfillState.retryFromState(wh, "job-b")
    assert(plan.failedIndices === Seq(1, 2, 3))
  }

  test("retry can re-chunk failed ranges to a smaller batch size") {
    val wh = freshWh()
    val wide = Seq((d("2025-01-01"), d("2025-01-06")))
    BackfillState.runPersisted(wh, "job-c", wide, fullRefresh = true) { _ =>
      sys.error("nope")
    }
    val plan = BackfillState.retryFromState(wh, "job-c", rechunkBatchSize = Some(2))
    assert(plan.ranges === Backfill.chunkDateRange(d("2025-01-01"), d("2025-01-06"), 2))
    assert(plan.fullRefresh) // inherited from the previous execution
  }

  test("retry without any previous execution fails with the reference message") {
    val wh = freshWh()
    val ex = intercept[IllegalStateException] {
      BackfillState.retryFromState(wh, "never-ran")
    }
    assert(ex.getMessage.contains("Run a fresh backfill before using --retry"))
  }

  test("parallel completions all land (concurrent appends serialize safely)") {
    val wh = freshWh()
    val n = new AtomicInteger(0)
    val eight = Backfill.chunkDateRange(d("2025-02-01"), d("2025-02-08"), 1)
    val results = BackfillState.runPersisted(wh, "job-d", eight, parallelism = 8) { _ =>
      n.incrementAndGet(); ()
    }
    assert(n.get === 8 && results.forall(_.success))
    assert(BackfillState.events(wh, "job-d")
      .filter(col("event") === "succeeded").count() === 8)
    assert(BackfillState.retryFromState(wh, "job-d").ranges === Nil)
  }
}
