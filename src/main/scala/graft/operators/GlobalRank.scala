package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Contiguous global row ids 1..n in total-order position — WITHOUT the
  * single-partition funnel Spark plans for `row_number() OVER (ORDER BY
  * …)` (an empty PARTITION BY collapses the whole input into ONE task:
  * the canonical 100 TB scale-killer for "assign stable ids to the
  * corpus", which sharded export, sequence packing, and reproducible
  * sampling all want).
  *
  * Two-phase shape (the same offsets-stitch as [[PrefixSum]], specialized
  * to counts):
  *
  *  1. range-partition on the order columns with an EXPLICIT partition
  *     count and sort within partitions — each task orders only its own
  *     range slice, and ascending partition ids hold ascending ranges by
  *     the range partitioner's construction;
  *  2. `zipWithIndex` over the sorted partitions: one lightweight
  *     count-per-partition job builds the cumulative base offsets
  *     (#partitions longs — driver-sized by construction), then the data
  *     pass stamps `base(partition) + local position`.
  *
  * `zipWithIndex` is the engine's ONE deliberate RDD use: the id must be
  * a function of PHYSICAL partition identity, and a `spark_partition_id`
  * column is not sound for that — Catalyst treats the projection as
  * movable relative to exchanges, so two executions of the same plan
  * (the counts pass and the data pass) can disagree about which exchange
  * the id was captured under. The RDD pins the partitioning explicitly;
  * no optimizer sits between the count job and the stamp job.
  *
  * Offsets are exact whatever boundaries the range sampler picked, as
  * long as `orderCols` is a TOTAL order (unique key): global rank is
  * boundary-invariant. Ties crossing a partition boundary would make ids
  * nondeterministic — pass a tiebreaking unique column last, exactly as
  * you would for any reproducible ordering. */
object GlobalRank {

  def globalRowNumber(df: DataFrame, orderCols: Seq[String],
                      idCol: String = "rid",
                      numPartitions: Int = 0): DataFrame = {
    require(orderCols.nonEmpty, "globalRowNumber needs at least one order column")
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val cols = orderCols.map(col)
    val sorted = df.repartitionByRange(n, cols: _*)
      .sortWithinPartitions(cols: _*)
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+ org.apache.spark.sql.types.StructField(
        idCol, org.apache.spark.sql.types.LongType, nullable = false))
    val stamped = sorted.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(stamped, schema)
  }

  // ------------------------------------------------------------ queries

  def qAssignIds(spark: SparkSession, dir: String): DataFrame =
    globalRowNumber(
      graft.core.Tables.load(spark, dir, "documents")
        .filter(col("doc_id").isNotNull)
        .select(col("doc_id")),
      orderCols = Seq("doc_id"))
      .select(col("doc_id"), col("rid"))

  val qAssignIdsSql: String =
    """SELECT doc_id,
      |       CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT) AS rid
      |FROM documents WHERE doc_id IS NOT NULL""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "assign_ids" -> (qAssignIds _))

  val oracleSql: Map[String, String] = Map(
    "assign_ids" -> qAssignIdsSql)
}
