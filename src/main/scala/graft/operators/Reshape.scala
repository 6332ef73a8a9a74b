package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Wide↔long reshaping — pivot with an EXPLICIT value list, the only
  * form that scales.
  *
  * `pivot(col)` without values runs a hidden distinct-values job over
  * the full input to discover the column set, then holds every value in
  * the driver; on a 100 TB fact that is an extra full scan, and an
  * unbounded-cardinality pivot column OOMs the driver outright. The
  * value list is domain metadata (enum-like columns only); pivoting on
  * an open domain is a modeling error this API makes impossible to
  * write.
  *
  * Even WITH the list, Spark's built-in `.pivot(col, values)` plans TWO
  * shuffles: a pre-aggregate on (key, value), then a `pivotfirst`
  * re-aggregate on key. This operator emits the conditional-count form
  * directly — `count(when(col = v, 1))` per value — which is ONE hash
  * aggregate, one shuffle on the row key, map-side combined, schema
  * fixed at plan time (PlanSpec-gated); it is also exactly the
  * `count(CASE …)` the SQL oracle states, 0 for empty cells included
  * (count of no matches is 0, never NULL).
  */
object Reshape {

  /** One row per `rowKey`, one count column per pivot value. */
  def pivotCounts(df: DataFrame, rowKey: String, pivotCol: String,
                  values: Seq[String]): DataFrame = {
    require(values.nonEmpty, "pivotCounts needs the explicit value list")
    require(values.distinct.size == values.size, "pivot values must be unique")
    val aggs = values.map(v =>
      count(when(col(pivotCol) === v, lit(1))).as(v))
    df.groupBy(col(rowKey)).agg(aggs.head, aggs.tail: _*)
  }

  // ----------------------------------------------------------------- query

  /** The events fixture's event_type domain — metadata, not discovered. */
  val EventTypes: Seq[String] =
    Seq("click", "error", "purchase", "signup", "view")

  /** Per-user activity matrix: one row per user, one column per type. */
  def qPivot(spark: SparkSession, dir: String): DataFrame =
    pivotCounts(Tables.load(spark, dir, "events"),
      "user_id", "event_type", EventTypes)

  val qPivotSql: String = {
    val cols = EventTypes.map(v =>
      s"count(CASE WHEN event_type = '$v' THEN 1 END) AS $v").mkString(",\n|       ")
    s"""SELECT user_id,
       |       $cols
       |FROM events GROUP BY 1""".stripMargin
  }

  /** Two-dimension CUBE — every grouping set of (returnflag, linestatus)
    * in ONE aggregation pass (Spark's Expand feeds 4 grouping sets
    * through a single shuffle; four separate GROUP BYs would scan and
    * shuffle four times). `grouping_id()` rides along because a NULL
    * group value is ambiguous — it can mean "the subtotal across this
    * dimension" or a genuinely NULL key — and downstream consumers must
    * tell them apart; both engines define the same bitmask (bit set =
    * dimension rolled up). Measures are exact integer centi-units, so
    * subtotals hash identically at any combine order. */
  def qCube(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
        sum(expr("cast(round(l_quantity * 100) as long)")).as("qty_c"))

  val qCubeSql: String =
    """SELECT l_returnflag, l_linestatus,
      |       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
      |       count(*) AS n,
      |       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
      |         AS qty_c
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin

  /** ROLLUP — the hierarchical member of the grouping-sets family
    * ([[qCube]] covers the full lattice): subtotals along ONE drill
    * path (status within flag, flag, grand total), the report-total
    * shape. Same partial-aggregation plan as a plain groupBy: Expand
    * multiplies rows by grouping-set count BEFORE the map-side combine,
    * so the shuffle still carries aggregate-sized data. */
  def qRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
        sum(expr("cast(round(l_quantity * 100) as long)")).as("qty_c"))

  val qRollupSql: String =
    """SELECT l_returnflag, l_linestatus,
      |       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
      |       count(*) AS n,
      |       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
      |         AS qty_c
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q31_pivot" -> (qPivot _),
    "q46_cube" -> (qCube _),
    "q62_rollup" -> (qRollup _))

  val oracleSql: Map[String, String] = Map(
    "q31_pivot" -> qPivotSql,
    "q46_cube" -> qCubeSql,
    "q62_rollup" -> qRollupSql)
}
