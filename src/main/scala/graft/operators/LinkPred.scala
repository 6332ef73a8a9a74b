package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._


/** Link prediction by neighborhood overlap — the recommendation face of
  * the graph family (centrality [[PageRank]], communities [[LabelProp]],
  * cohesion [[Triangles]], components [[Components]], prediction here).
  * For each NON-adjacent pair with enough shared neighbors it scores the
  * classic common-neighbours count plus the Jaccard coefficient of the
  * two neighborhoods (Liben-Nowell & Kleinberg 2003) — "customers who
  * bought these parts together will likely buy THIS pair together next";
  * in a training-data pipeline the same scores rank candidate merges
  * between near-duplicate clusters that blocking kept apart.
  *
  * Shape: candidate pairs enumerate as wedges (two hops through a shared
  * neighbor), which is Σ_w d(w)² work concentrated on hub centers — the
  * one graph shape degree-orientation cannot fix, because a pair's count
  * needs EVERY wedge, not one witness. The scale contract is therefore
  * explicit: centers with degree > `maxCenterDegree` are excluded from
  * wedge generation (the production stance for broker hubs — a part in
  * half the baskets predicts nothing; Twitter's WTF pipeline makes the
  * same cut), and `minCommon` floors the support before any join. Both
  * knobs are part of the semantics and mirrored in the oracle, never a
  * silent cap. Degrees are one map-side-combined rollup; the wedge join
  * keys on the center node (AQE skew split applies); existing edges
  * leave via one anti-join on the canonical (lo, hi) form.
  *
  * Determinism: counts and the basis-point Jaccard
  * `cn·10⁴ div (d(a)+d(b)−cn)` are exact integers end to end — no float
  * enters, so the cross-engine hash gate holds with no rounding pin. */
object LinkPred {

  /** Score non-adjacent pairs of an UNDIRECTED edge list (columns
    * src/dst, either or both directions). Output: (node_a, node_b, cn,
    * jaccard_bp) for every non-edge pair with ≥ `minCommon` shared
    * neighbors, both endpoints' full degrees in the denominator. */
  def linkPrediction(edges: DataFrame, minCommon: Int = 2,
                     maxCenterDegree: Int = 1000): DataFrame = {
    require(minCommon >= 1, s"minCommon must be >= 1, got $minCommon")
    require(maxCenterDegree >= 1, s"maxCenterDegree must be >= 1")
    val e = edges.select(
        least(col("src").cast("long"), col("dst").cast("long")).as("lo"),
        greatest(col("src").cast("long"), col("dst").cast("long")).as("hi"))
      .filter(col("lo").isNotNull && col("lo") < col("hi"))
      .distinct()
      .localCheckpoint(true) // consumed by degrees, wedges, and the anti-join
    val nbr = e.select(col("lo").as("c"), col("hi").as("x"))
      .unionAll(e.select(col("hi").as("c"), col("lo").as("x")))
    val deg = nbr.groupBy(col("c")).agg(count(lit(1)).as("d"))
    // wedge centers: full degree for scoring, capped degree for generation
    val centered = nbr.join(
      deg.filter(col("d") <= maxCenterDegree).select(col("c")), Seq("c"))
    val wedges = centered.as("wa").join(centered.as("wb"),
        col("wa.c") === col("wb.c") && col("wa.x") < col("wb.x"))
      .groupBy(col("wa.x").as("node_a"), col("wb.x").as("node_b"))
      .agg(count(lit(1)).as("cn"))
      .filter(col("cn") >= minCommon)
    val nonEdges = wedges.join(e,
      wedges("node_a") === e("lo") && wedges("node_b") === e("hi"), "left_anti")
    nonEdges
      .join(deg.select(col("c").as("node_a"), col("d").as("da")), Seq("node_a"))
      .join(deg.select(col("c").as("node_b"), col("d").as("db")), Seq("node_b"))
      .select(col("node_a"), col("node_b"), col("cn"),
        expr("(cn * 10000) div (da + db - cn)").as("jaccard_bp"))
  }

  // ----------------------------------------------------------------- query

  /** Predicted next co-purchases over the ≥2-support basket graph (the
    * same thresholded edges [[Components.qComponents]] uses — support 2
    * is also the hub screen that keeps wedge work bounded at scale). */
  def qLinkPred(spark: SparkSession, dir: String): DataFrame =
    linkPrediction(BasketGraph.supportEdges(spark, dir, minSupport = 2),
      minCommon = 2, maxCenterDegree = 1000)

  /** The identical wedge algebra, center cap, anti-join, and integer
    * Jaccard in DuckDB. */
  val qLinkPredSql: String =
    """WITH pp AS MATERIALIZED (
      |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p
      |  FROM lineitem
      |  WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
      |e AS MATERIALIZED (
      |  SELECT a.p AS lo, b.p AS hi
      |  FROM pp a JOIN pp b ON a.o = b.o AND a.p < b.p
      |  GROUP BY 1, 2 HAVING count(*) >= 2),
      |nbr AS MATERIALIZED (
      |  SELECT lo AS c, hi AS x FROM e
      |  UNION ALL SELECT hi, lo FROM e),
      |deg AS MATERIALIZED (
      |  SELECT c, CAST(count(*) AS BIGINT) AS d FROM nbr GROUP BY 1),
      |ctr AS MATERIALIZED (
      |  SELECT nbr.c, nbr.x FROM nbr JOIN deg USING (c) WHERE deg.d <= 1000),
      |wedge AS MATERIALIZED (
      |  SELECT wa.x AS node_a, wb.x AS node_b, CAST(count(*) AS BIGINT) AS cn
      |  FROM ctr wa JOIN ctr wb ON wa.c = wb.c AND wa.x < wb.x
      |  GROUP BY 1, 2 HAVING count(*) >= 2)
      |SELECT w.node_a, w.node_b, w.cn,
      |       (w.cn * 10000) // (da.d + db.d - w.cn) AS jaccard_bp
      |FROM wedge w
      |JOIN deg da ON da.c = w.node_a
      |JOIN deg db ON db.c = w.node_b
      |WHERE NOT EXISTS (SELECT 1 FROM e
      |                  WHERE e.lo = w.node_a AND e.hi = w.node_b)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_linkpred" -> (qLinkPred _))

  val oracleSql: Map[String, String] = Map(
    "graph_linkpred" -> qLinkPredSql)
}
