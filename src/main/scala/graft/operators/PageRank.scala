package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Fixed-iteration PageRank over an edge list — the graph-centrality
  * member of the operator family (influence ranking over a link /
  * citation / interaction graph; in a training-data pipeline, the
  * standard prior for domain-authority weighting).
  *
  * The whole computation is INTEGER arithmetic: ranks live in units of
  * 1/`Scale` (parts-per-10^12 of probability mass), contributions are
  * `rank div deg`, damping is `(15·r0) div 100 + (85·Σ) div 100`.
  * Truncating integer division loses mass (deterministically!) but
  * never precision: ranks are bit-identical at any partitioning, any
  * engine — a float PageRank can't be hash-gated at all, because its
  * per-node sums combine in shuffle order. The relative ORDER of nodes
  * — the thing PageRank exists to produce — is unaffected by the lost
  * trailing mass.
  *
  * Scale shape: per iteration, one equi-join of the edge list against
  * the (|V|-sized) rank table on src and one map-side-combined sum by
  * dst — the canonical distributed PageRank step. The edge list is
  * `localCheckpoint`ed once up front (scanned every iteration; on a
  * cluster this is a durable staged table), rank tables chain lazily —
  * with FIXED iterations the lineage is a shallow linear chain, no
  * per-round materialization needed (contrast
  * [[graft.llmops.Dedup.duplicateClusters]], which iterates to
  * convergence and must observe a count per round).
  *
  * Node universe = nodes with out-edges (every node must appear as a
  * src; feed both directions for undirected graphs, so deg ≥ 1 and no
  * dangling mass). Zero-IN-degree nodes — directed-graph sources — are
  * fine: the per-round update LEFT-joins incoming contributions, so a
  * source keeps its damped base rank `(15·r0) div 100` and continues
  * contributing to its successors every round.
  */
object PageRank {

  val Scale = 1000000000000L // rank units: 1e-12 of total mass
  val Iterations = 3

  /** (node, rank) after `iterations` damped rounds over `edges`
    * (columns src, dst; every node MUST appear as a src — feed both
    * directions for undirected graphs). Ranks are integer `Scale`ths. */
  def pageRank(edges: DataFrame, iterations: Int = Iterations): DataFrame =
    pageRankStaged(stageEdges(edges), iterations)

  /** Canonical staged edge frame: (src, dst) as non-null longs, eagerly
    * checkpointed — scanned every iteration (a durable staged table on
    * a cluster). Shared so the two query entries below stage the
    * bipartite build ONCE per (session, dir). */
  private def stageEdges(edges: DataFrame): DataFrame =
    edges.select(col("src").cast("long"), col("dst").cast("long"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .localCheckpoint(true)

  private def pageRankStaged(e: DataFrame, iterations: Int): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val deg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
    val init = deg.crossJoin(deg.agg(count(lit(1)).as("_n")))
      .select(col("node"), col("deg"),
        expr(s"${Scale}L div _n").as("r0"))
    var ranks = init.withColumn("rank", col("r0"))
    for (_ <- 1 to iterations) {
      val contrib = e
        .join(ranks.select(col("node").as("src"),
          expr("rank div deg").as("_c")), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("_c")).as("_in"))
      ranks = init.join(contrib, Seq("node"), "left")
        .select(col("node"), col("deg"), col("r0"),
          (expr("(15 * r0) div 100") +
            expr("(85 * coalesce(_in, 0L)) div 100")).as("rank"))
    }
    ranks.select(col("node"), col("rank"))
  }

  /** Personalized PageRank — random walk with restart to a SEED set
    * (Jeh & Widom 2003): the teleport vector is the uniform
    * distribution over seeds instead of over all nodes, so rank mass
    * measures proximity to the seeds — the "expand from a trusted
    * allowlist" prior a curation pipeline uses to score domains by
    * how tightly the link graph ties them to known-good ones (and the
    * TrustRank construction when seeds are vetted).
    *
    * The SAME integer step as [[pageRank]] — only the base vector
    * changes: seeds carry `(15 · Scale/|S|) div 100` per round, every
    * other node 0, so non-seed rank is purely inherited mass. Ranks
    * stay exact integer `Scale`ths, bit-identical cross-engine.
    * `isSeed` is a predicate over the `node` column; seeds must have
    * out-edges (they are drawn from the src universe like every other
    * node). */
  def personalizedPageRank(edges: DataFrame, isSeed: Column,
                           iterations: Int = Iterations): DataFrame =
    personalizedPageRankStaged(stageEdges(edges), isSeed, iterations)

  private def personalizedPageRankStaged(e: DataFrame, isSeed: Column,
                                         iterations: Int): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val deg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
    val nSeeds = deg.filter(isSeed).agg(count(lit(1)).as("_s"))
    val base = deg.crossJoin(broadcast(nSeeds))
      .select(col("node"), col("deg"),
        when(isSeed, expr(s"${Scale}L div _s")).otherwise(lit(0L)).as("r0"))
    var ranks = base.withColumn("rank", col("r0"))
    for (_ <- 1 to iterations) {
      val contrib = e
        .join(ranks.select(col("node").as("src"),
          expr("rank div deg").as("_c")), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("_c")).as("_in"))
      ranks = base.join(contrib, Seq("node"), "left")
        .select(col("node"), col("deg"), col("r0"),
          (expr("(15 * r0) div 100") +
            expr("(85 * coalesce(_in, 0L)) div 100")).as("rank"))
    }
    ranks.select(col("node"), col("rank"))
  }

  // ----------------------------------------------------------------- query

  /** Centrality of the supplier↔part bipartite graph (who-supplies-what
    * from lineitem): suppliers at even node ids (2k), parts odd (2k+1).
    * Output keeps the decoded id and kind so the ranking is readable. */
  /** The supplier↔part bipartite edge frame, staged ONCE per (session,
    * corpus dir) — [[qPageRank]] and [[qPersonalizedPageRank]] iterate
    * over the identical mirrored edge list, and each used to re-pay the
    * lineitem scan + distinct + its own checkpoint (the
    * [[graft.operators.BasketGraph.halfEdges]] staging pattern). */
  private val edgeMemo =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  private def stagedBipartite(spark: SparkSession, dir: String): DataFrame =
    edgeMemo.computeIfAbsent(s"${System.identityHashCode(spark)}|$dir", _ => {
      val li = Tables.load(spark, dir, "lineitem")
        .filter(col("l_suppkey").isNotNull && col("l_partkey").isNotNull)
      val pairs = li.select((col("l_suppkey") * 2).as("s"),
        (col("l_partkey") * 2 + 1).as("t")).distinct()
      stageEdges(pairs.select(col("s").as("src"), col("t").as("dst"))
        .unionAll(pairs.select(col("t").as("src"), col("s").as("dst"))))
    })

  def qPageRank(spark: SparkSession, dir: String): DataFrame =
    pageRankStaged(stagedBipartite(spark, dir), Iterations)
      .select(
        when(col("node") % 2 === 0, lit("supplier")).otherwise(lit("part"))
          .as("kind"),
        expr("node div 2").as("id"), col("rank"))

  val qPageRankSql: String = {
    // one damped integer step: prev(node, deg, rank) -> next(node, deg, rank).
    // LEFT join keeps zero-in-degree nodes (directed sources) at the
    // damped base rank, mirroring the Spark side's left join + coalesce.
    def step(prev: String): String =
      s"""SELECT d.node, d.deg,
         |       (15 * s.r0v) // 100 +
         |       (85 * CAST(coalesce(c.inm, 0) AS BIGINT)) // 100 AS rank
         |FROM d CROSS JOIN s
         |LEFT JOIN (SELECT e.dst AS node,
         |                  CAST(sum(r.rank // r.deg) AS BIGINT) AS inm
         |           FROM e JOIN $prev r ON r.node = e.src
         |           GROUP BY 1) c ON c.node = d.node""".stripMargin
    s"""WITH p AS MATERIALIZED (
       |  SELECT DISTINCT l_suppkey * 2 AS s, l_partkey * 2 + 1 AS t
       |  FROM lineitem
       |  WHERE l_suppkey IS NOT NULL AND l_partkey IS NOT NULL),
       |e AS MATERIALIZED (
       |  SELECT s AS src, t AS dst FROM p
       |  UNION ALL SELECT t AS src, s AS dst FROM p),
       |d AS MATERIALIZED (SELECT src AS node, count(*) AS deg
       |                   FROM e GROUP BY 1),
       |s AS MATERIALIZED (SELECT $Scale // CAST(count(*) AS BIGINT) AS r0v
       |                   FROM d),
       |r0 AS MATERIALIZED (SELECT d.node, d.deg, s.r0v AS rank
       |                    FROM d CROSS JOIN s),
       |r1 AS MATERIALIZED (${step("r0")}),
       |r2 AS MATERIALIZED (${step("r1")}),
       |r3 AS (${step("r2")})
       |SELECT CASE WHEN node % 2 = 0 THEN 'supplier' ELSE 'part' END AS kind,
       |       node // 2 AS id, rank
       |FROM r3""".stripMargin
  }

  /** Seed predicate for the PPR query: every 50th supplier (node ids
    * are 2·suppkey for suppliers) — the deterministic stand-in for a
    * vetted allowlist. */
  val PprSeedSql = "node % 2 = 0 AND (node // 2) % 50 = 1"

  /** Proximity-to-trusted-suppliers over the same bipartite graph:
    * which parts (and other suppliers) does the link structure tie most
    * closely to the seed suppliers? */
  def qPersonalizedPageRank(spark: SparkSession, dir: String): DataFrame =
    personalizedPageRankStaged(stagedBipartite(spark, dir),
      col("node") % 2 === 0 && expr("(node div 2) % 50 = 1"), Iterations)
      .select(
        when(col("node") % 2 === 0, lit("supplier")).otherwise(lit("part"))
          .as("kind"),
        expr("node div 2").as("id"), col("rank"))

  val qPprSql: String = {
    // identical integer step; only the base vector differs — seeds carry
    // the damped teleport share, every other node 0
    def step(prev: String): String =
      s"""SELECT d.node, d.deg,
         |       (15 * d.r0) // 100 +
         |       (85 * CAST(coalesce(c.inm, 0) AS BIGINT)) // 100 AS rank
         |FROM d
         |LEFT JOIN (SELECT e.dst AS node,
         |                  CAST(sum(r.rank // r.deg) AS BIGINT) AS inm
         |           FROM e JOIN $prev r ON r.node = e.src
         |           GROUP BY 1) c ON c.node = d.node""".stripMargin
    s"""WITH p AS MATERIALIZED (
       |  SELECT DISTINCT l_suppkey * 2 AS s, l_partkey * 2 + 1 AS t
       |  FROM lineitem
       |  WHERE l_suppkey IS NOT NULL AND l_partkey IS NOT NULL),
       |e AS MATERIALIZED (
       |  SELECT s AS src, t AS dst FROM p
       |  UNION ALL SELECT t AS src, s AS dst FROM p),
       |d0 AS MATERIALIZED (SELECT src AS node, count(*) AS deg
       |                    FROM e GROUP BY 1),
       |ns AS MATERIALIZED (
       |  SELECT CAST(count(*) AS BIGINT) AS n FROM d0 WHERE $PprSeedSql),
       |d AS MATERIALIZED (
       |  SELECT node, deg,
       |         CASE WHEN $PprSeedSql THEN $Scale // ns.n ELSE 0 END AS r0
       |  FROM d0 CROSS JOIN ns),
       |r0 AS MATERIALIZED (SELECT node, deg, r0 AS rank FROM d),
       |r1 AS MATERIALIZED (${step("r0")}),
       |r2 AS MATERIALIZED (${step("r1")}),
       |r3 AS (${step("r2")})
       |SELECT CASE WHEN node % 2 = 0 THEN 'supplier' ELSE 'part' END AS kind,
       |       node // 2 AS id, rank
       |FROM r3""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_pagerank" -> (qPageRank _),
    "graph_ppr" -> (qPersonalizedPageRank _))

  val oracleSql: Map[String, String] = Map(
    "graph_pagerank" -> qPageRankSql,
    "graph_ppr" -> qPprSql)
}
