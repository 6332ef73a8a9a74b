package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Association-rule mining over baskets (Agrawal & Srikant's apriori
  * setting, truncated at pairs — the 2-itemset level that powers
  * "bought-together" and co-occurrence features): for every item pair
  * co-occurring in at least `minPairCount` baskets, both directed rules
  * x→y with support, confidence, and lift.
  *
  * All three metrics are EXACT INTEGER basis points — `support =
  * (c_xy·10⁴) div n`, `confidence = (c_xy·10⁴) div c_x`, `lift =
  * (c_xy·n·10⁴) div (c_x·c_y)` — no float ever enters, so rules are
  * bit-identical cross-engine (lift > 10⁴ means positively associated).
  *
  * Shape at 100 TB: the pair rollup is the [[LabelProp]] half-edge
  * basket build (each unordered pair generated once via `x < y`, one
  * map-side-combined count); per-item counts are one |items|-sized
  * rollup that attaches to the SUPPORT-FILTERED pair set (never the
  * raw pair space); the basket total is a 1-row broadcast scalar.
  * Wide baskets explode quadratically — cap or sample basket width
  * upstream exactly as the co-purchase graph build does. */
object AssocRules {

  val MinPairCount = 2L

  /** (antecedent, consequent, n_both, n_ante, n_cons, support_bp,
    * confidence_bp, lift_bp) over `baskets` (columns basket, item). */
  def associationRules(baskets: DataFrame,
                       minPairCount: Long = MinPairCount): DataFrame = {
    require(minPairCount >= 1, s"minPairCount must be >= 1, got $minPairCount")
    val b = baskets.select(col("basket").cast("long"), col("item").cast("long"))
      .filter(col("basket").isNotNull && col("item").isNotNull)
      .distinct()
    val nBaskets = b.agg(countDistinct(col("basket")).as("_n"))
    val itemCount = b.groupBy(col("item")).agg(count(lit(1)).as("_ci"))
    val pairs = b.as("a").join(b.as("b"),
        col("a.basket") === col("b.basket") && col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("x"), col("b.item").as("y"))
      .agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= minPairCount)
    val directed = pairs
      .select(col("x").as("antecedent"), col("y").as("consequent"), col("n_both"))
      .unionByName(pairs
        .select(col("y").as("antecedent"), col("x").as("consequent"), col("n_both")))
    directed
      .join(itemCount.select(col("item").as("antecedent"), col("_ci").as("n_ante")),
        Seq("antecedent"))
      .join(itemCount.select(col("item").as("consequent"), col("_ci").as("n_cons")),
        Seq("consequent"))
      .crossJoin(broadcast(nBaskets))
      .select(col("antecedent"), col("consequent"), col("n_both"),
        col("n_ante"), col("n_cons"),
        expr("(n_both * 10000) div _n").as("support_bp"),
        expr("(n_both * 10000) div n_ante").as("confidence_bp"),
        expr("(n_both * _n * 10000) div (n_ante * n_cons)").as("lift_bp"))
  }

  // ----------------------------------------------------------------- query

  /** Bought-together rules over the order/part baskets. */
  def qAssocRules(spark: SparkSession, dir: String): DataFrame =
    associationRules(Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey").as("basket"), col("l_partkey").as("item")))

  val qAssocRulesSql: String =
    s"""WITH b AS MATERIALIZED (
       |  SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
       |  FROM lineitem
       |  WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
       |n AS (SELECT CAST(count(DISTINCT basket) AS BIGINT) AS n FROM b),
       |ic AS MATERIALIZED (
       |  SELECT item, CAST(count(*) AS BIGINT) AS ci FROM b GROUP BY 1),
       |pairs AS MATERIALIZED (
       |  SELECT a.item AS x, bb.item AS y, CAST(count(*) AS BIGINT) AS n_both
       |  FROM b a JOIN b bb ON a.basket = bb.basket AND a.item < bb.item
       |  GROUP BY 1, 2
       |  HAVING count(*) >= $MinPairCount),
       |directed AS (
       |  SELECT x AS antecedent, y AS consequent, n_both FROM pairs
       |  UNION ALL
       |  SELECT y AS antecedent, x AS consequent, n_both FROM pairs)
       |SELECT d.antecedent, d.consequent, d.n_both,
       |       ia.ci AS n_ante, ic2.ci AS n_cons,
       |       (d.n_both * 10000) // n.n AS support_bp,
       |       (d.n_both * 10000) // ia.ci AS confidence_bp,
       |       (d.n_both * n.n * 10000) // (ia.ci * ic2.ci) AS lift_bp
       |FROM directed d
       |JOIN ic ia ON ia.item = d.antecedent
       |JOIN ic ic2 ON ic2.item = d.consequent
       |CROSS JOIN n""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "assoc_rules" -> (qAssocRules _))

  val oracleSql: Map[String, String] = Map(
    "assoc_rules" -> qAssocRulesSql)
}
