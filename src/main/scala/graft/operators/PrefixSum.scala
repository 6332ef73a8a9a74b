package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The two-phase distributed ORDERED PREFIX SUM — the shared machinery
  * behind sequence packing ([[graft.llmops.Pack]]) and the concurrency
  * sweep ([[Concurrency]]), kept in ONE place because the subtle parts
  * (bounding the driver transfer BEFORE collecting; the running-offset
  * stitch) must not fork per domain:
  *
  *  1. per-bucket inclusive running sums in parallel (windows
  *     partitioned by the caller's bucket column — each task bounded);
  *  2. bucket TOTALS (one map-side-combined agg, rows = #buckets) are
  *     `limit(cap+1)`-collected — the limit bounds the transfer before
  *     anything lands on the driver; collecting first and guarding
  *     after would OOM exactly the way the guard is meant to prevent —
  *     and scanned into per-bucket base offsets, broadcast back.
  *
  * Bucket ids must be non-NULL longs ordered consistently with the
  * global order (bucket = orderValue div width does this); rows are
  * summed within a bucket in `orderCol` order.
  */
object PrefixSum {

  val MaxBuckets = 4_000_000 // offsets collect: ~32 MB of longs at the cap

  /** `df` + `cumCol` = the inclusive global running sum of `valueCol`
    * over (`bucketCol`, `orderCol`) order. */
  def bucketedRunningSum(df: DataFrame, bucketCol: String, orderCol: String,
                         valueCol: String, cumCol: String,
                         maxBuckets: Int = MaxBuckets): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val w = Window.partitionBy(bucketCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = df.withColumn("_cum_in_bucket", sum(col(valueCol)).over(w))
    val totals = df.groupBy(col(bucketCol)).agg(sum(col(valueCol)).as("_tot"))
      .limit(maxBuckets + 1).collect()
    require(totals.length <= maxBuckets,
      s"more than $maxBuckets buckets; widen the bucket " +
        "(driver holds one offset per bucket)")
    var running = 0L
    val offsets = totals.sortBy(_.getLong(0)).map { r =>
      val o = (r.getLong(0), running); running += r.getLong(1); o
    }.toSeq.toDF(bucketCol, "_base")
    local.join(broadcast(offsets), Seq(bucketCol))
      .withColumn(cumCol, col("_base") + col("_cum_in_bucket"))
      .drop("_cum_in_bucket", "_base")
  }
}
