package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Unpivot (melt) — wide measure columns to (measure, value) rows, the
  * inverse of [[Reshape.pivotCounts]] and the step that turns a
  * metrics-wide table into the long form every generic aggregation /
  * plotting / per-metric-quantile pipeline wants.
  *
  * Spark's native `unpivot` plans an `Expand`: each input row fans out
  * to one row per measure IN PLACE — a narrow operator, zero shuffle,
  * no join, output partitioning mirrors input (PlanSpec-gated). The
  * k× row multiplication is the declared semantics, not overhead; at
  * 100 TB what matters is that it happens map-side and streams, never
  * materializing wide+long together.
  *
  * Measures must share one value type (here: DOUBLE) — SQL's UNION-ALL
  * formulation forces the same, so the contract is cross-engine by
  * construction.
  */
object Unpivot {

  def melt(df: DataFrame, ids: Seq[String], measures: Seq[String],
           nameCol: String = "measure",
           valueCol: String = "value"): DataFrame = {
    require(measures.nonEmpty, "melt needs at least one measure column")
    df.unpivot(ids.map(col).toArray, measures.map(col).toArray,
      nameCol, valueCol)
  }

  // ----------------------------------------------------------------- query

  val Measures: Seq[String] =
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  def qUnpivot(spark: SparkSession, dir: String): DataFrame =
    melt(Tables.load(spark, dir, "lineitem"),
      ids = Seq("l_orderkey", "l_linenumber"), measures = Measures)

  /** UNION ALL states the same fan-out; measure names are the column
    * names, values already DOUBLE on both engines. */
  val qUnpivotSql: String = Measures.map(m =>
    s"""SELECT l_orderkey, l_linenumber, '$m' AS measure, $m AS value
       |FROM lineitem""".stripMargin).mkString("\nUNION ALL\n")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q36_unpivot" -> (qUnpivot _))

  val oracleSql: Map[String, String] = Map(
    "q36_unpivot" -> qUnpivotSql)
}
