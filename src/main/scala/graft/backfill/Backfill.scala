package graft.backfill

import java.time.LocalDate
import java.util.concurrent.{Executors, TimeUnit}
import scala.collection.mutable
import scala.util.{Failure, Success, Try}

/** Backfill work partitioning + fan-out: the reference's distributed
  * backfill machinery (dbtwiz/admin/backfill.py) re-expressed as pure
  * Scala planning plus a bounded-parallelism local executor in place of
  * the Cloud Run task fleet.
  */
object Backfill {

  /** MAX_CONCURRENT_TASKS (backfill.py:18). */
  val MaxConcurrentTasks = 8

  /** Default target scan volume per task: timeout × 0.1 GB/s × 0.8 —
    * ≈48 GB at the 600 s default (backfill.py:576-596, BASELINE.md). */
  def targetBytes(timeoutSeconds: Int): Long =
    (timeoutSeconds * 0.1e9 * 0.8).toLong

  /** Split [first, last] (inclusive) into contiguous chunks of at most
    * batchSize days (chunk_date_range, backfill.py:104-114). */
  def chunkDateRange(first: LocalDate, last: LocalDate, batchSize: Int): Seq[(LocalDate, LocalDate)] = {
    require(batchSize >= 1, s"batch size must be >= 1, got $batchSize")
    val out = mutable.ListBuffer.empty[(LocalDate, LocalDate)]
    var cursor = first
    while (!cursor.isAfter(last)) {
      val end = Seq(last, cursor.plusDays(batchSize - 1L)).min(Ordering.by((d: LocalDate) => d.toEpochDay))
      out += ((cursor, end))
      cursor = end.plusDays(1)
    }
    out.toSeq
  }

  /** Encode ranges as `s:e,s:e` (encode_task_ranges, backfill.py:117-120). */
  def encodeTaskRanges(ranges: Seq[(LocalDate, LocalDate)]): String =
    ranges.map { case (s, e) => s"$s:$e" }.mkString(",")

  /** Inverse of [[encodeTaskRanges]] (backfill.py:122-131: blank pieces
    * skipped, whitespace tolerated). */
  def decodeTaskRanges(encoded: String): Seq[(LocalDate, LocalDate)] =
    encoded.split(",").toSeq.map(_.trim).filter(_.nonEmpty).map { piece =>
      val Array(s, e) = piece.split(":").map(_.trim)
      (LocalDate.parse(s), LocalDate.parse(e))
    }

  /** Halve a word keeping first+last quarters (halve_str,
    * backfill.py:134-141). */
  def halveStr(word: String): String = {
    val q = math.max(1, word.length / 4)
    word.take(q) + word.substring(word.length - q)
  }

  /** Job name from a selector, mangled to ≤64 chars by iteratively halving
    * the longest dash-word, dropping the last word when halving stalls
    * (backfill_job_name, backfill.py:144-163). */
  def backfillJobName(selector: String, maxLen: Int = 64): String = {
    var name = selector.replace("_", "-").replace("+", "")
    while (name.length > maxLen) {
      val prevLen = name.length
      var words = name.split("-").toVector
      val longest = words.maxBy(_.length)
      val idx = words.indexOf(longest)
      words = words.updated(idx, halveStr(longest)).filter(_.nonEmpty)
      name = words.mkString("-")
      if (name.length == prevLen) {
        words = words.dropRight(1)
        name = words.mkString("-")
      }
    }
    name
  }

  /** Per-model batch size from a bytes-per-day estimate:
    * `min(default, max(1, target/bytesPerDay))`; min across models; the
    * default when no model yields an estimate (estimate_batch_size,
    * backfill.py:22-101). `bytesPerDay` estimates of 0/None are skipped
    * exactly as dry-run failures are. */
  def estimateBatchSize(bytesPerDay: Seq[Option[Long]], defaultBatchSize: Int,
                        targetBytes: Long): Int = {
    val sizes = bytesPerDay.flatten.filter(_ > 0).map { b =>
      math.min(defaultBatchSize.toLong, math.max(1L, targetBytes / b)).toInt
    }
    if (sizes.isEmpty) defaultBatchSize else sizes.min
  }

  /** Task-index range pick (commands/build.py:81-94): explicit ranges win;
    * otherwise offset arithmetic with the end clamped. */
  def rangeForTaskIndex(taskIndex: Int, start: LocalDate, end: LocalDate,
                        batchSize: Int, taskRanges: Option[String] = None): (LocalDate, LocalDate) =
    taskRanges match {
      case Some(enc) =>
        val ranges = decodeTaskRanges(enc)
        require(taskIndex < ranges.length,
          s"Task index $taskIndex out of bounds for ${ranges.length} task ranges.")
        ranges(taskIndex)
      case None =>
        val s = start.plusDays(taskIndex.toLong * batchSize)
        val e = Seq(end, s.plusDays(batchSize - 1L)).min(Ordering.by((d: LocalDate) => d.toEpochDay))
        (s, e)
    }

  final case class BackfillArgs(first: Option[LocalDate], last: Option[LocalDate],
                                warnings: Seq[String])

  /** _validate_backfill_args (admin/__init__.py:20-59): retry runs carry
    * no dates (and refuse --full-refresh); otherwise first is required,
    * both must be ISO dates in order, and full refresh is restricted to a
    * single model and a single day. */
  def validateArgs(select: String, dateFirst: Option[String],
                   dateLast: Option[String], fullRefresh: Boolean,
                   retry: Boolean): BackfillArgs = {
    if (retry) {
      require(!fullRefresh, "--retry cannot be combined with --full-refresh.")
      val w = if (dateFirst.isDefined || dateLast.isDefined)
        Seq("Date arguments are ignored when --retry is set.") else Nil
      return BackfillArgs(None, None, w)
    }
    val firstStr = dateFirst.getOrElse(throw new IllegalArgumentException(
      "date_first is required (omit it only when using --retry)."))
    val (first, last) =
      try {
        val f = LocalDate.parse(firstStr)
        (f, dateLast.map(LocalDate.parse).getOrElse(f))
      } catch {
        case _: java.time.format.DateTimeParseException =>
          throw new IllegalArgumentException("Dates must be on the YYYY-mm-dd format.")
      }
    require(!last.isBefore(first), "Last date must be on or after first date.")
    if (fullRefresh) {
      require(!select.contains("+"), "Full refresh is only supported on single models.")
      require(last == first, "Full refresh in only supported on single day runs.")
    }
    BackfillArgs(Some(first), Some(last), Nil)
  }

  /** A2 — materialization census of selected models
    * (backfill.py:566-569). */
  def materializationCensus(materializations: Seq[String]): Map[String, Int] =
    materializations.groupBy(identity).view.mapValues(_.size).toMap

  final case class TaskResult(index: Int, range: (LocalDate, LocalDate),
                              success: Boolean, error: Option[String])

  /** Run one task per date range with bounded parallelism — the local
    * stand-in for the Cloud Run task fleet (parallelism clamped to the
    * task count, 1 = serial mode for self-referential models;
    * backfill.py:230-232, admin/__init__.py:133-144). Serial mode stops at
    * the first failure (later partitions depend on earlier ones); parallel
    * mode runs every task and reports per-task status for retry
    * (backfill.py:369-412). */
  def run(ranges: Seq[(LocalDate, LocalDate)], parallelism: Int = MaxConcurrentTasks)
         (task: ((LocalDate, LocalDate)) => Unit): Seq[TaskResult] =
    runIndexed(ranges, parallelism)((_, r) => task(r))

  /** [[run]] with the task index visible to the task — what a Cloud Run
    * task sees in CLOUD_RUN_TASK_INDEX (backfill.py:230-232); the hook
    * [[BackfillState]] uses to record per-task durable state. */
  def runIndexed(ranges: Seq[(LocalDate, LocalDate)], parallelism: Int = MaxConcurrentTasks)
                (task: (Int, (LocalDate, LocalDate)) => Unit): Seq[TaskResult] = {
    val par = math.max(1, math.min(parallelism, ranges.size))
    if (par == 1) {
      val out = mutable.ListBuffer.empty[TaskResult]
      var failed = false
      ranges.zipWithIndex.foreach { case (r, i) =>
        if (!failed) {
          Try(task(i, r)) match {
            case Success(_) => out += TaskResult(i, r, success = true, None)
            case Failure(e) =>
              out += TaskResult(i, r, success = false, Some(e.getMessage))
              failed = true
          }
        }
      }
      out.toSeq
    } else {
      val pool = Executors.newFixedThreadPool(par)
      try {
        val futures = ranges.zipWithIndex.map { case (r, i) =>
          i -> pool.submit(new java.util.concurrent.Callable[TaskResult] {
            def call(): TaskResult = Try(task(i, r)) match {
              case Success(_) => TaskResult(i, r, success = true, None)
              case Failure(e) => TaskResult(i, r, success = false, Some(e.getMessage))
            }
          })
        }
        futures.map(_._2.get())
      } finally {
        pool.shutdown()
        pool.awaitTermination(1, TimeUnit.MINUTES)
      }
    }
  }

  /** Failed-task recovery (backfill.py:415-422, 475-529): the ranges of
    * failed tasks, optionally re-chunked to a smaller batch size. */
  def retryRanges(results: Seq[TaskResult], rechunkBatchSize: Option[Int] = None): Seq[(LocalDate, LocalDate)] = {
    val failed = results.filter(!_.success).map(_.range)
    rechunkBatchSize match {
      case Some(b) => failed.flatMap { case (s, e) => chunkDateRange(s, e, b) }
      case None => failed
    }
  }
}
