package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._


/** Connected components over an arbitrary edge list — the graph family's
  * fourth public member (centrality [[PageRank]], communities
  * [[LabelProp]], cohesion [[Triangles]], components here): each node
  * labels with the minimum node id reachable through any path. The
  * general-graph face of the large-star/small-star machinery
  * [[graft.llmops.Dedup.duplicateClusters]] runs for dedup clustering —
  * same O(log n) star-round convergence on pathological chains, same
  * loud non-convergence failure, one implementation for both (an
  * entity-resolution or dedup consumer and a graph consumer can never
  * disagree on components). */
object Components {

  /** (node, component_id) over `edges` (columns src, dst; direction
    * ignored). Node universe = every edge endpoint. */
  def connectedComponents(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src").cast("long").as("doc_a"),
        col("dst").cast("long").as("doc_b"))
      .filter(col("doc_a").isNotNull && col("doc_b").isNotNull)
    val nodes = e.select(col("doc_a").as("doc_id"))
      .unionAll(e.select(col("doc_b").as("doc_id"))).distinct()
    graft.llmops.Dedup.duplicateClusters(nodes, e)
      .select(col("doc_id").as("node"), col("cluster_id").as("component_id"))
  }

  // ----------------------------------------------------------------- query

  /** Components of the ≥2-co-purchase part graph: thresholding the
    * basket edges at weight 2 breaks the giant hairball into genuine
    * product families (9 components on the sf0.01 fixture). */
  def qComponents(spark: SparkSession, dir: String): DataFrame =
    connectedComponents(BasketGraph.supportEdges(spark, dir, minSupport = 2))

  /** Transitive reachability to fixpoint (the recursive-CTE ground
    * truth the star rounds must reproduce exactly). */
  val qComponentsSql: String =
    """WITH RECURSIVE pp AS MATERIALIZED (
      |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p
      |  FROM lineitem
      |  WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
      |he AS MATERIALIZED (
      |  SELECT a.p AS lo, b.p AS hi
      |  FROM pp a JOIN pp b ON a.o = b.o AND a.p < b.p
      |  GROUP BY 1, 2 HAVING count(*) >= 2),
      |nodes AS (SELECT DISTINCT n FROM (SELECT lo AS n FROM he
      |                                  UNION ALL SELECT hi FROM he)),
      |edges AS (SELECT lo AS a, hi AS b FROM he
      |          UNION ALL SELECT hi, lo FROM he),
      |reach(id, r) AS (
      |  SELECT n, n FROM nodes
      |  UNION
      |  SELECT re.id, e.b FROM reach re JOIN edges e ON e.a = re.r)
      |SELECT id AS node, min(r) AS component_id FROM reach GROUP BY id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_components" -> (qComponents _))

  val oracleSql: Map[String, String] = Map(
    "graph_components" -> qComponentsSql)
}
