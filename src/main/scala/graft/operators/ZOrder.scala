package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Z-order clustering — multi-dimensional data layout for scan pruning:
  * interleaving the bits of two sort keys puts rows that are close in
  * EITHER dimension into the same files, so per-file min/max statistics
  * prune scans filtered on either column. A single-column sort gives
  * perfect pruning on one dimension and none on the other; the z-curve
  * gives ~√F-file pruning on both — the standard layout trade for fact
  * tables queried along two independent axes (date × customer,
  * partkey × suppkey).
  *
  * The z-value is pure integer bit arithmetic — `((a >> i) & 1) << 2i`
  * summed over 30 bit positions per column — identical in Spark and
  * DuckDB, so the mapping itself is oracle-checkable. The write path is
  * `repartitionByRange` on z (one shuffle, contiguous z-ranges per
  * task ≈ rectangular tiles of the key plane) + a within-partition sort
  * + `maxRecordsPerFile`.
  */
object ZOrder {

  /** Bits interleaved per column (2×30 = 60-bit z fits a Long). */
  val BitsPerCol = 30

  private def requireExpr(c: Column, name: String): Column =
    when(c.isNull || c < 0 || c >= (1L << BitsPerCol),
      raise_error(concat(lit(s"zValue: $name out of [0, 2^$BitsPerCol): "),
        coalesce(c.cast("string"), lit("NULL")))).cast("long"))
      .otherwise(c.cast("long"))

  /** 60-bit z-value of two non-negative ints (< 2^30 each); `a` takes
    * the even bit positions, `b` the odd. */
  def zValue(a: Column, b: Column): Column = {
    val av = requireExpr(a, "a")
    val bv = requireExpr(b, "b")
    (0 until BitsPerCol).map { i =>
      shiftleft(shiftright(av, i) % 2, 2 * i) +
        shiftleft(shiftright(bv, i) % 2, 2 * i + 1)
    }.reduce(_ + _)
  }

  /** DuckDB fragment computing the identical z-value. The operands are
    * cast to BIGINT first: DuckDB shifts in the OPERAND's width, so an
    * INTEGER column's bit shifted past position 30 would overflow
    * INT32 and abort the query inside the documented 2^30 domain. */
  def zValueSql(a: String, b: String): String =
    (0 until BitsPerCol).map { i =>
      s"(((CAST($a AS BIGINT) >> $i) & 1) << ${2 * i}) + " +
        s"(((CAST($b AS BIGINT) >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")

  /** Write `df` z-ordered on (colA, colB): one range shuffle on z,
    * within-partition sort, capped files. Files come out as contiguous
    * z-ranges ≈ rectangular tiles — bounded min/max in BOTH columns. */
  def writeZOrdered(df: DataFrame, colA: String, colB: String, path: String,
                    numFiles: Int = 16,
                    maxRecordsPerFile: Long = 1000000L): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    require(!df.columns.contains("_z"),
      "input already has a column named _z (reserved by writeZOrdered)")
    df.withColumn("_z", zValue(col(colA), col(colB)))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)
  }

  // ----------------------------------------------------------------- query

  /** The z-mapping over a filtered lineitem slice — the oracle recomputes
    * every interleaved bit, so any drift in the curve breaks the hash. */
  def qZOrder(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem").filter(col("l_partkey") <= 50)
    li.select(col("l_orderkey"), col("l_linenumber"),
      col("l_partkey"), col("l_suppkey"),
      zValue(col("l_partkey"), col("l_suppkey")).as("zval"))
  }

  val qZOrderSql: String =
    s"""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
       |       ${zValueSql("l_partkey", "l_suppkey")} AS zval
       |FROM lineitem WHERE l_partkey <= 50""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "zorder_cluster" -> (qZOrder _))

  val oracleSql: Map[String, String] = Map(
    "zorder_cluster" -> qZOrderSql)
}
