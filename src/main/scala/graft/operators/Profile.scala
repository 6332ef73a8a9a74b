package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Per-column data profile — the dataset-datasheet / dbt-docs summary a
  * warehouse computes before anyone trusts a table: row count, null
  * count, EXACT distinct count, and native-ordered min/max per column.
  * The operator the reference's column-description tooling
  * (admin/descriptions.py) implicitly assumes someone ran first.
  *
  * Two passes, each the cheapest shape for its statistic:
  *  1. one map-side-combined GLOBAL aggregate computes rows + per-column
  *     nulls and native min/max (ordering happens in the column's own
  *     type — `min(cast(x as string))` would sort "10" before "9" — and
  *     only the RESULT renders to string for the uniform report shape);
  *  2. a melt (column, rendered-value) pass feeds one groupBy for exact
  *     distinct counts — a single shuffle bounded by Σ per-column
  *     distincts, instead of the row-expansion a multi-countDistinct
  *     aggregate plans (one expand per column over the full table).
  *     Rendering is injective on the profiled types, so string-domain
  *     distinctness equals native distinctness.
  *
  * At 100 TB the same two passes hold; swap the exact distinct for the
  * [[Sketch]] HLL when estimates suffice (this operator is the
  * exact/oracle-gated form). Profiled columns are caller-chosen —
  * doubles/timestamps render engine-differently and belong in
  * [[Stats]]/[[Quantiles]] profiles, not a string report. */
object Profile {

  /** (column, n_rows, n_nulls, n_distinct, min_value, max_value) for
    * each of `cols`, strings rendered AFTER native-ordered min/max.
    * NULLs are excluded from distinct/min/max (SQL aggregate
    * semantics); an all-null column reports NULL bounds. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"_nn_$c"),
        min(col(c)).cast("string").as(s"_mn_$c"),
        max(col(c)).cast("string").as(s"_mx_$c"))
    } :+ count(lit(1)).as("_rows")
    val g = df.agg(aggs.head, aggs.tail: _*)
    val melted = df.select(cols.map(c =>
        col(c).cast("string").as(c)): _*)
      .select(explode(map(
        cols.flatMap(c => Seq(lit(c), col(c))): _*)).as(Seq("column", "v")))
      .filter(col("v").isNotNull)
      .groupBy(col("column"))
      .agg(countDistinct(col("v")).as("n_distinct"))
    val perCol = cols.map { c =>
      g.select(lit(c).as("column"), col("_rows").as("n_rows"),
        col(s"_nn_$c").as("n_nulls"),
        col(s"_mn_$c").as("min_value"), col(s"_mx_$c").as("max_value"))
    }.reduce(_.unionByName(_))
    perCol.join(melted, Seq("column"), "left")
      .select(col("column"), col("n_rows"), col("n_nulls"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        col("min_value"), col("max_value"))
  }

  // ----------------------------------------------------------------- query

  val ProfileCols: Seq[String] =
    Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")

  def qProfile(spark: SparkSession, dir: String): DataFrame =
    profile(Tables.load(spark, dir, "orders"), ProfileCols)

  /** Same statistics per column; min/max CAST AFTER aggregating so the
    * ordering is native on both engines. */
  val qProfileSql: String = {
    val branches = ProfileCols.map { c =>
      s"""SELECT '$c' AS column,
         |       CAST(count(*) AS BIGINT) AS n_rows,
         |       CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_nulls,
         |       CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
         |       CAST(min($c) AS VARCHAR) AS min_value,
         |       CAST(max($c) AS VARCHAR) AS max_value
         |FROM orders""".stripMargin
    }
    branches.mkString("\nUNION ALL\n")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q64_profile" -> (qProfile _))

  val oracleSql: Map[String, String] = Map(
    "q64_profile" -> qProfileSql)
}
