package graft.materialize

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** dbt-core data tests as Spark queries. The reference delegates
  * `dbtwiz test` to dbt (commands/test.py:10-48, selector + date-var
  * plumbing), whose schema tests a switching user depends on — so the
  * four built-in generic tests are re-expressed here as declarative
  * DataFrame checks, each returning the FAILING rows (dbt semantics: a
  * test passes when its query returns zero rows):
  *
  *  - not_null: rows where the column is null
  *  - unique: values appearing more than once (nulls don't participate,
  *    as in dbt's `unique`)
  *  - accepted_values: distinct values outside the allowed set
  *  - relationships: child keys with no matching parent (nulls pass —
  *    referential integrity is only asserted for present keys)
  *
  * Scale shape: every test is one pruned scan + at most one shuffle
  * (groupBy on the tested column / broadcast-able anti-join). A test
  * suite over a 100 TB table reads only the tested columns. */
object DataTests {

  def notNull(df: DataFrame, column: String): DataFrame =
    df.filter(col(column).isNull).select(lit(column).as("column"))

  def unique(df: DataFrame, columns: Seq[String]): DataFrame =
    df.filter(columns.map(col(_).isNotNull).reduce(_ && _))
      .groupBy(columns.map(col): _*)
      .agg(count(lit(1)).as("n_records"))
      .filter(col("n_records") > 1)

  def acceptedValues(df: DataFrame, column: String, values: Seq[String]): DataFrame =
    df.select(col(column)).distinct()
      .filter(col(column).isNotNull && !col(column).isin(values: _*))

  def relationships(child: DataFrame, childCol: String,
                    parent: DataFrame, parentCol: String): DataFrame =
    child.filter(col(childCol).isNotNull)
      .select(col(childCol))
      .join(parent.select(col(parentCol).as(childCol)), Seq(childCol), "left_anti")

  /** One summary row per named test: (test_name, failures). A suite
    * passes when every count is zero — the dbt contract. */
  def summarize(tests: Seq[(String, DataFrame)]): Seq[(String, Long)] =
    tests.map { case (name, failing) => name -> failing.count() }

  // ----------------------------------------------------------------- query

  /** Oracle-gated suite over the TPC-H fixture: one not_null, one
    * unique, one accepted_values, one relationships — counts replicated
    * by the DuckDB oracle. (The fixture data is clean, so most counts
    * are zero; accepted_values deliberately excludes 'R' to prove a
    * non-zero failure count flows through.) */
  def qDataTests(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val customer = Tables.load(spark, dir, "customer")
    val orders = Tables.load(spark, dir, "orders")
    val lineitem = Tables.load(spark, dir, "lineitem")
    summarize(Seq(
      "not_null_customer_name" -> notNull(customer, "c_name"),
      "unique_orders_key" -> unique(orders, Seq("o_orderkey")),
      "accepted_values_returnflag" ->
        acceptedValues(lineitem, "l_returnflag", Seq("A", "N")),
      "relationships_orders_customer" ->
        relationships(orders, "o_custkey", customer, "c_custkey")))
      .toDF("test_name", "failures")
  }

  val qDataTestsSql: String =
    """SELECT 'not_null_customer_name' AS test_name,
      |       (SELECT count(*) FROM customer WHERE c_name IS NULL) AS failures
      |UNION ALL
      |SELECT 'unique_orders_key',
      |       (SELECT count(*) FROM (
      |          SELECT o_orderkey FROM orders WHERE o_orderkey IS NOT NULL
      |          GROUP BY 1 HAVING count(*) > 1))
      |UNION ALL
      |SELECT 'accepted_values_returnflag',
      |       (SELECT count(*) FROM (
      |          SELECT DISTINCT l_returnflag FROM lineitem
      |          WHERE l_returnflag IS NOT NULL AND l_returnflag NOT IN ('A', 'N')))
      |UNION ALL
      |SELECT 'relationships_orders_customer',
      |       (SELECT count(*) FROM orders o
      |        WHERE o_custkey IS NOT NULL
      |          AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q20_data_tests" -> (qDataTests _))

  val oracleSql: Map[String, String] = Map(
    "q20_data_tests" -> qDataTestsSql)
}
