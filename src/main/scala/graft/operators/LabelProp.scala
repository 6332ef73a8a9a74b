package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._


/** Fixed-iteration synchronous label propagation (Raghavan et al. 2007)
  * — the community-detection member of the graph family, next to
  * [[PageRank]] (centrality) and
  * [[graft.llmops.Dedup.duplicateClusters]] (connected components):
  * every node starts as its own label; each round it adopts the label
  * carrying the most EDGE WEIGHT among its neighbors, ties to the
  * smallest label. In a training-data pipeline this is topic/domain
  * grouping over co-occurrence graphs — communities of products bought
  * together, domains linked together, documents sharing near-dup bands.
  *
  * Determinism is the whole design: synchronous updates (a node's round-r
  * label depends only on round-(r−1) labels), FIXED iteration count
  * (asynchronous/converged LPA is run-order-dependent — unusable under a
  * cross-engine hash gate), integer weight sums, and a total tie order
  * (weight DESC, label ASC). The oracle unrolls the same three rounds in
  * SQL; every round must agree bit-for-bit.
  *
  * Scale shape (the [[PageRank]] discipline): the edge list stages once
  * (`localCheckpoint`; a durable table on a cluster), each round is one
  * equi-join of edges against the |V|-sized label frame plus one
  * map-side-combined (node, label) weight sum and an argmax window
  * partitioned BY NODE — no global funnel anywhere. Hot nodes are the
  * usual skew caveat; at 100 TB the argmax window keys on (node), so
  * AQE's skew split applies, and the label frame never exceeds |V|.
  */
object LabelProp {

  val Iterations = 3

  /** (node, label) after `iterations` synchronous rounds over a weighted
    * UNDIRECTED edge list (columns src, dst, w — feed both directions;
    * the node universe is `distinct src`). */
  def labelPropagation(edges: DataFrame, iterations: Int = Iterations): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"),
      col("w").cast("long"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .localCheckpoint(true) // scanned every round: stage it once
    var labels = e.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
    val byNode = org.apache.spark.sql.expressions.Window
      .partitionBy("node").orderBy(col("c").desc, col("label"))
    for (_ <- 1 to iterations) {
      labels = e
        .join(labels.select(col("node").as("src"), col("label")), Seq("src"))
        .groupBy(col("dst").as("node"), col("label"))
        .agg(sum(col("w")).as("c"))
        .withColumn("_rn", row_number().over(byNode))
        .filter(col("_rn") === 1)
        .select(col("node"), col("label"))
    }
    labels
  }

  // ----------------------------------------------------------------- query

  /** Communities in the part co-purchase graph: parts are linked by the
    * number of orders containing both (the classic basket graph). The
    * (order, part) incidence is DISTINCT'd first so a part twice in one
    * order doesn't double-weight its edges.
    *
    * HALF-EDGE build: the per-order self-join generates each unordered
    * pair ONCE (`a.p < b.p`) and mirrors after aggregation — the
    * co-occurrence count is symmetric, so the mirror is exact while the
    * join output and the (src, dst) weight rollup halve (this was the
    * bench's most expensive query; the mirror union runs on EDGES, not
    * pairs, and Catalyst reuses the aggregate's exchange for both
    * directions). */
  def qLabelProp(spark: SparkSession, dir: String): DataFrame =
    basketLabels(spark, dir)

  // in-process memo of the STAGED basket-community labels, the
  // [[BasketGraph.halfEdges]] pattern one level up: label propagation is
  // a pure function of the staged edge artifact, and two consumers
  // (qLabelProp itself and [[Modularity.qModularity]]) need the same
  // labels — built once per (session, corpus), served staged
  private val labelMemo =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  /** The 3-round LPA communities over the basket graph, staged once per
    * (session, corpus dir). */
  def basketLabels(spark: SparkSession, dir: String): DataFrame =
    labelMemo.computeIfAbsent(s"${System.identityHashCode(spark)}|$dir",
      _ => labelPropagation(BasketGraph.mirroredEdges(spark, dir))
        .localCheckpoint(true))

  private[operators] def invalidate(): Unit = labelMemo.clear()

  val qLabelPropSql: String =
    s"""WITH pp AS MATERIALIZED (
       |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p
       |  FROM lineitem
       |  WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
       |e AS MATERIALIZED (
       |  SELECT a.p AS src, b.p AS dst, CAST(count(*) AS BIGINT) AS w
       |  FROM pp a JOIN pp b ON a.o = b.o AND a.p <> b.p
       |  GROUP BY 1, 2),
       |l0 AS (SELECT DISTINCT src AS node, src AS label FROM e),
       |c1 AS (SELECT e.dst AS node, l.label, CAST(sum(e.w) AS BIGINT) AS c
       |       FROM e JOIN l0 l ON l.node = e.src GROUP BY 1, 2),
       |l1 AS MATERIALIZED (
       |  SELECT node, label FROM (
       |    SELECT node, label,
       |           row_number() OVER (PARTITION BY node
       |                              ORDER BY c DESC, label) AS rn
       |    FROM c1) WHERE rn = 1),
       |c2 AS (SELECT e.dst AS node, l.label, CAST(sum(e.w) AS BIGINT) AS c
       |       FROM e JOIN l1 l ON l.node = e.src GROUP BY 1, 2),
       |l2 AS MATERIALIZED (
       |  SELECT node, label FROM (
       |    SELECT node, label,
       |           row_number() OVER (PARTITION BY node
       |                              ORDER BY c DESC, label) AS rn
       |    FROM c2) WHERE rn = 1),
       |c3 AS (SELECT e.dst AS node, l.label, CAST(sum(e.w) AS BIGINT) AS c
       |       FROM e JOIN l2 l ON l.node = e.src GROUP BY 1, 2)
       |SELECT node, label FROM (
       |  SELECT node, label,
       |         row_number() OVER (PARTITION BY node
       |                            ORDER BY c DESC, label) AS rn
       |  FROM c3) WHERE rn = 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_label_prop" -> (qLabelProp _))

  val oracleSql: Map[String, String] = Map(
    "graph_label_prop" -> qLabelPropSql)
}
