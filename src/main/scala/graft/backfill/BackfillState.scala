package graft.backfill

import java.time.LocalDate
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Warehouse
import Backfill.TaskResult

/** Durable backfill task state — retry-from-state without an external
  * orchestrator.
  *
  * The reference recovers a failed backfill from two DURABLE records: the
  * previous execution's container args (`--task-ranges` → the planned
  * ranges, backfill.py:346-366) and the per-task completion states from
  * the Cloud Run tasks endpoint (backfill.py:369-412). The engine keeps
  * the same facts in one warehouse table keyed (job, exec, task_index):
  *
  *  - one `planned` row per task, written in a single commit BEFORE any
  *    task starts (the container-args analog);
  *  - one `succeeded`/`failed` row appended AS EACH TASK COMPLETES (the
  *    task-state analog).
  *
  * Every write is a [[Warehouse.append]] — O(rows appended), existing
  * fragments untouched — so a driver killed mid-run loses nothing already
  * recorded. On retry, a task with no completion row counts as failed,
  * exactly as a Cloud Run task without a Completed/SUCCEEDED condition
  * does (backfill.py:399-410); in this single-driver model an execution
  * missing completions cannot still be running, so there is no analog of
  * the reference's "has not completed yet" wait (backfill.py:487-491).
  *
  * Scale: the state table is O(executions × tasks) short rows — driver
  * sized by construction; reading it back is one tiny scan, never a
  * shuffle.
  */
object BackfillState {

  val Dataset = "graft_ops"
  val Table = "backfill_tasks"

  private val Schema = StructType(Seq(
    StructField("job", StringType, nullable = false),
    StructField("exec", IntegerType, nullable = false),
    StructField("task_index", IntegerType, nullable = false),
    StructField("range_start", StringType, nullable = false),
    StructField("range_end", StringType, nullable = false),
    StructField("event", StringType, nullable = false), // planned|succeeded|failed
    StructField("error", StringType, nullable = true),
    StructField("full_refresh", BooleanType, nullable = false)))

  private def toDf(wh: Warehouse, rows: Seq[Row]): DataFrame =
    wh.spark.createDataFrame(rows.asJava, Schema)

  /** All recorded events for one job (empty frame when none yet). */
  def events(wh: Warehouse, job: String): DataFrame =
    if (!wh.exists(Dataset, Table))
      wh.spark.createDataFrame(new java.util.ArrayList[Row](), Schema)
    else wh.read(Dataset, Table).filter(col("job") === job)

  private def latestExec(wh: Warehouse, job: String): Int = {
    val m = events(wh, job).agg(max("exec")).head()
    if (m.isNullAt(0)) 0 else m.getInt(0)
  }

  /** Run a backfill recording durable per-task state as execution
    * `latest+1` of `job`. The task body runs exactly as in
    * [[Backfill.run]] (serial mode stops at the first failure — the
    * untouched tail stays `planned` and is retried). */
  def runPersisted(wh: Warehouse, job: String,
                   ranges: Seq[(LocalDate, LocalDate)],
                   fullRefresh: Boolean = false,
                   parallelism: Int = Backfill.MaxConcurrentTasks)
                  (task: ((LocalDate, LocalDate)) => Unit): Seq[TaskResult] = {
    require(ranges.nonEmpty, "runPersisted needs at least one task range")
    val exec = latestExec(wh, job) + 1
    def row(i: Int, r: (LocalDate, LocalDate), event: String,
            error: Option[String]): Row =
      Row(job, exec, i, r._1.toString, r._2.toString, event,
        error.orNull, fullRefresh)
    wh.append(Dataset, Table,
      toDf(wh, ranges.zipWithIndex.map { case (r, i) => row(i, r, "planned", None) }))
    // completion appends are commitWith-safe under races, but serialize
    // them anyway: parallel tasks finishing together would otherwise
    // retry-loop on the manifest CAS for no benefit.
    val lock = new Object
    def record(i: Int, r: (LocalDate, LocalDate), event: String,
               error: Option[String]): Unit = lock.synchronized {
      wh.append(Dataset, Table, toDf(wh, Seq(row(i, r, event, error))))
    }
    Backfill.runIndexed(ranges, parallelism) { (i, r) =>
      try { task(r); record(i, r, "succeeded", None) }
      catch { case e: Throwable =>
        record(i, r, "failed", Option(e.getMessage)); throw e
      }
    }
  }

  /** What a retry would run: the latest execution's planned ranges, its
    * not-succeeded task indices, and the ranges to re-run (optionally
    * re-chunked to a smaller batch — subdivide_ranges,
    * backfill.py:415-422). */
  final case class RetryPlan(exec: Int,
                             previousRanges: Seq[(LocalDate, LocalDate)],
                             failedIndices: Seq[Int],
                             ranges: Seq[(LocalDate, LocalDate)],
                             fullRefresh: Boolean)

  def retryFromState(wh: Warehouse, job: String,
                     rechunkBatchSize: Option[Int] = None): RetryPlan = {
    val evs = events(wh, job).collect().toSeq
    if (evs.isEmpty)
      throw new IllegalStateException(
        s"No previous executions found for job '$job'. " +
          "Run a fresh backfill before using --retry.")
    val exec = evs.map(_.getAs[Int]("exec")).max
    val cur = evs.filter(_.getAs[Int]("exec") == exec)
    val planned = cur.filter(_.getAs[String]("event") == "planned")
      .sortBy(_.getAs[Int]("task_index"))
    val prevRanges = planned.map(r => (LocalDate.parse(r.getAs[String]("range_start")),
      LocalDate.parse(r.getAs[String]("range_end"))))
    val succeeded = cur.filter(_.getAs[String]("event") == "succeeded")
      .map(_.getAs[Int]("task_index")).toSet
    val failedIdx = planned.map(_.getAs[Int]("task_index"))
      .filterNot(succeeded).sorted
    val failedRanges = failedIdx.map(i => prevRanges(i))
    val ranges = rechunkBatchSize match {
      case Some(b) => failedRanges.flatMap { case (s, e) =>
        Backfill.chunkDateRange(s, e, b) }
      case None => failedRanges
    }
    RetryPlan(exec, prevRanges, failedIdx, ranges,
      planned.headOption.exists(_.getAs[Boolean]("full_refresh")))
  }

  /** _backfill_retry (backfill.py:475-529): recover the failed ranges
    * from state and run them as a NEW recorded execution, inheriting the
    * previous run's full-refresh flag. No-op (Nil) when every task of the
    * latest execution succeeded. */
  def retry(wh: Warehouse, job: String,
            parallelism: Int = Backfill.MaxConcurrentTasks,
            rechunkBatchSize: Option[Int] = None)
           (task: ((LocalDate, LocalDate)) => Unit): (RetryPlan, Seq[TaskResult]) = {
    val plan = retryFromState(wh, job, rechunkBatchSize)
    if (plan.ranges.isEmpty) (plan, Nil)
    else (plan, runPersisted(wh, job, plan.ranges, plan.fullRefresh,
      parallelism)(task))
  }
}
