package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Community-quality scoring: Newman modularity of a node→community
  * assignment over a weighted undirected graph — the acceptance gate for
  * [[LabelProp]] output (are these communities real structure, or did
  * propagation shred the graph?). Q = Σ_c (in_c/2W − (deg_c/2W)²) over
  * communities, where in_c counts intra-community weight in BOTH
  * directions (the Σ_ij form), deg_c is the community's weighted degree
  * mass, and 2W the total mirrored weight.
  *
  * Exact integers end to end: with t = 2W, Q·t² = Σ_c (in_c·t − deg_c²)
  * is a pure BIGINT sum, and the published basis points are
  * `(10⁴·Σ) fdiv t²` with floor division pinned via the shifted-mod
  * form on BOTH engines (the numerator is negative for
  * worse-than-random partitions, where truncating and flooring
  * division disagree). No float touches the statistic, so it
  * hash-gates.
  *
  * Shape: one edge×label join per endpoint (labels are |V|-sized —
  * broadcastable; co-partitioned by node at cluster scale), two
  * map-side-combined rollups (per-community intra weight and degree
  * mass), and a 1-row total that rides back as a broadcast — no
  * driver-side math on anything larger than one row. */
object Modularity {

  /** Per-community rows (label, n_nodes, in_w2, deg_w) with the global
    * `q_bp` repeated as a constant column — one frame carries both the
    * community table and the scalar verdict. `edges` must be the
    * MIRRORED weighted list ([[BasketGraph.mirroredEdges]] shape);
    * `labels` is (node, label). */
  def modularity(edges: DataFrame, labels: DataFrame): DataFrame = {
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"),
      col("w").cast("long"))
    val lab = labels.select(col("node").cast("long"),
      col("label").cast("long"))
    val tagged = e
      .join(lab.select(col("node").as("src"), col("label").as("cs")), Seq("src"))
      .join(lab.select(col("node").as("dst"), col("label").as("cd")), Seq("dst"))
    val degC = tagged.groupBy(col("cs").as("label"))
      .agg(sum(col("w")).as("deg_w"))
    val nodesC = lab.groupBy(col("label")).agg(count(lit(1)).as("n_nodes"))
    val inC = tagged.filter(col("cs") === col("cd"))
      .groupBy(col("cs").as("label")).agg(sum(col("w")).as("in_w2"))
    val perC = nodesC.join(degC, Seq("label"), "left")
      .join(inC, Seq("label"), "left")
      .select(col("label"), col("n_nodes"),
        coalesce(col("in_w2"), lit(0L)).as("in_w2"),
        coalesce(col("deg_w"), lit(0L)).as("deg_w"))
    val tot = e.agg(sum(col("w")).as("t")).select(col("t").cast("long"))
    // Q·t² numerator summed over ALL communities, then floor-divided —
    // the shifted-mod form gives the exact floor on both engines
    // (Spark div truncates toward zero, DuckDB // floors; they disagree
    // exactly when Q < 0)
    val q = perC.crossJoin(broadcast(tot))
      .agg(sum(col("in_w2") * col("t") - col("deg_w") * col("deg_w")).as("num"),
        first(col("t")).as("t"))
      .select((col("num") * lit(10000L)).as("n"),
        (col("t") * col("t")).as("d"))
      .select(expr("(n - (((n % d) + d) % d)) div d").as("q_bp"))
    perC.crossJoin(broadcast(q))
      .select(col("label"), col("n_nodes"), col("in_w2"), col("deg_w"),
        col("q_bp"))
  }

  // ----------------------------------------------------------------- query

  /** Modularity of the 3-round LPA communities over the co-purchase
    * basket graph — both stages consume the [[BasketGraph]] artifact. */
  def qModularity(spark: SparkSession, dir: String): DataFrame =
    modularity(BasketGraph.mirroredEdges(spark, dir),
      LabelProp.basketLabels(spark, dir))

  /** The label CTEs are [[LabelProp.qLabelPropSql]]'s; the modularity
    * algebra restates the integer form declaratively. */
  val qModularitySql: String =
    """WITH pp AS MATERIALIZED (
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
      |       FROM e JOIN l2 l ON l.node = e.src GROUP BY 1, 2),
      |l3 AS MATERIALIZED (
      |  SELECT node, label FROM (
      |    SELECT node, label,
      |           row_number() OVER (PARTITION BY node
      |                              ORDER BY c DESC, label) AS rn
      |    FROM c3) WHERE rn = 1),
      |tagged AS MATERIALIZED (
      |  SELECT e.w, ls.label AS cs, ld.label AS cd
      |  FROM e JOIN l3 ls ON ls.node = e.src
      |         JOIN l3 ld ON ld.node = e.dst),
      |deg AS (SELECT cs AS label, CAST(sum(w) AS BIGINT) AS deg_w
      |        FROM tagged GROUP BY 1),
      |nodes AS (SELECT label, CAST(count(*) AS BIGINT) AS n_nodes
      |          FROM l3 GROUP BY 1),
      |intra AS (SELECT cs AS label, CAST(sum(w) AS BIGINT) AS in_w2
      |          FROM tagged WHERE cs = cd GROUP BY 1),
      |perc AS MATERIALIZED (
      |  SELECT n.label, n.n_nodes,
      |         CAST(coalesce(i.in_w2, 0) AS BIGINT) AS in_w2,
      |         CAST(coalesce(d.deg_w, 0) AS BIGINT) AS deg_w
      |  FROM nodes n LEFT JOIN deg d USING (label)
      |               LEFT JOIN intra i USING (label)),
      |tot AS (SELECT CAST(sum(w) AS BIGINT) AS t FROM e),
      |q AS (SELECT CAST(
      |        (n - (((n % d) + d) % d)) // d AS BIGINT) AS q_bp
      |      FROM (SELECT CAST(sum(in_w2 * t - deg_w * deg_w) * 10000 AS BIGINT) AS n,
      |                   CAST(t * t AS BIGINT) AS d
      |            FROM perc CROSS JOIN tot GROUP BY t))
      |SELECT perc.label, perc.n_nodes, perc.in_w2, perc.deg_w, q.q_bp
      |FROM perc CROSS JOIN q""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_modularity" -> (qModularity _))

  val oracleSql: Map[String, String] = Map(
    "graph_modularity" -> qModularitySql)
}
