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

  /** Per-KEY generalization of [[bucketedRunningSum]]: an independent
    * inclusive running sum of `valueCol` for every `keyCol` group, in
    * (`bucketCol`, `orderCol`) order WITHIN the key — without ever
    * sorting a whole key's rows in one task (the hot-key funnel a plain
    * `Window.partitionBy(key).orderBy(...)` plans as). Phase-1 windows
    * partition by (key, bucket) so each task is bounded by a bucket, not
    * a key; phase-2 collects (key, bucket) totals (cap-guarded BEFORE
    * the transfer), resets the running offset at each key boundary, and
    * broadcasts the per-(key, bucket) bases back. */
  def perKeyRunningSum(df: DataFrame, keyCol: String, bucketCol: String,
                       orderCols: Seq[String], valueCol: String, cumCol: String,
                       maxBuckets: Int = MaxBuckets): DataFrame = {
    // the offsets frame rebuilds keys as strings; a non-string key would
    // silently join through a cast — refuse instead
    require(df.schema(keyCol).dataType ==
        org.apache.spark.sql.types.StringType,
      s"perKeyRunningSum needs a string key column, got " +
        s"${df.schema(keyCol).dataType} for '$keyCol'")
    require(orderCols.nonEmpty, "perKeyRunningSum needs at least one order column")
    val w = Window.partitionBy(col(keyCol), col(bucketCol))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = df.withColumn("_cum_in_bucket", sum(col(valueCol)).over(w))
    val totals = df.groupBy(col(keyCol), col(bucketCol))
      .agg(sum(col(valueCol)).as("_tot"))
      .limit(maxBuckets + 1).collect()
    require(totals.length <= maxBuckets,
      s"more than $maxBuckets (key, bucket) groups; widen the bucket " +
        "(driver holds one offset per group)")
    require(totals.forall(r => !r.isNullAt(0) && !r.isNullAt(1)),
      s"perKeyRunningSum: NULL in '$keyCol'/'$bucketCol' — filter or " +
        "assign nulls upstream; a running sum over an anonymous group is " +
        "undefined")
    val spark = df.sparkSession
    import spark.implicits._
    var curKey: Any = null
    var running = 0L
    val offsets = totals.sortBy(r => (r.get(0).toString, r.getLong(1)))
      .map { r =>
        if (r.get(0) != curKey) { curKey = r.get(0); running = 0L }
        val o = (r.get(0).toString, r.getLong(1), running)
        running += r.getLong(2)
        o
      }.toSeq.toDF(keyCol, bucketCol, "_base")
    local.join(broadcast(offsets), Seq(keyCol, bucketCol))
      .withColumn(cumCol, col("_base") + col("_cum_in_bucket"))
      .drop("_cum_in_bucket", "_base")
  }
}
