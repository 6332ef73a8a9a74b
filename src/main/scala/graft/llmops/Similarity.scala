package graft.llmops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables
import Hashing._

/** Approximate-nearest-neighbor search over an `Array[Float]` embedding
  * column.
  *
  *  - Brute-force cosine top-k: the correctness baseline. The (small) query
  *    set is broadcast with precomputed norms; one kernel pass over the
  *    corpus scores every (query, vector) pair — the corpus is never
  *    collected, so the scan parallelizes across splits at 100 TB.
  *  - Sign-LSH (random-hyperplane) bucketed top-k: the scale path.
  *    A hyperplane-sign signature partitions the corpus; candidates are
  *    only the query's bucket (IVF-style probe=1). Hyperplane components
  *    are fixed ±1 constants (Hashing.hyperplaneSigns) embedded identically
  *    in the DuckDB oracle, so even the approximate path is hash-checkable.
  *
  * All dot products run in [[Kernels]] primitive loops folding
  * left-to-right in double precision — the same order as the
  * `aggregate(zip_with(...))` expressions they replace and as the oracle's
  * explicit sum chains — so scores and signatures are bit-identical across
  * engines. Scores are rounded AFTER ranking (ties broken by vec_id).
  */
object Similarity {

  val TopK = 10
  // 6 planes → 64 buckets: sized so buckets hold ~n/64 candidates at the
  // fixture corpus size. At larger corpora raise NumPlanes (buckets should
  // hold O(10·k) vectors) — the pipeline shape is unchanged.
  val NumPlanes = 6
  val Dim = 64
  val planes: IndexedSeq[IndexedSeq[Int]] = hyperplaneSigns(NumPlanes, Dim)
  private val planeSigns: Array[Array[Double]] =
    planes.map(_.map(_.toDouble).toArray).toArray

  /** Driver-size cap on every broadcast-side collect in this file (query
    * sets, centroid tables). ~100k vectors × Dim doubles ≈ 50 MB — a
    * comfortable broadcast artifact; anything bigger is a corpus. */
  val MaxDriverRows = 100000

  /** Collect a driver-sized artifact under [[MaxDriverRows]]: a
    * non-selective predicate fails with the actual problem named instead
    * of an executor-to-driver OOM (the same guard style as RangeJoin's
    * bin-overflow raise). `limit(cap + 1)` bounds the transfer itself,
    * so even the failing path never materializes the corpus. */
  private[llmops] def collectCapped(ds: org.apache.spark.sql.Dataset[(Long, Array[Double])],
                                    what: String): Array[(Long, Array[Double])] = {
    val rows = ds.limit(MaxDriverRows + 1).collect()
    require(rows.length <= MaxDriverRows,
      s"$what exceeds the $MaxDriverRows-row driver cap — it must stay a " +
        "driver-sized artifact (broadcast side); tighten the predicate or " +
        "keep the data distributed")
    rows
  }

  /** Shared typed corpus frame: NULL vec_id cannot ride the non-nullable
    * Long encoder (executor NPE) and NULL/ragged embeddings would crash
    * the dot-product kernels where DuckDB list indexing silently NULLs —
    * contract violations, excluded identically on both engines
    * ([[vecFilterSql]] is the oracle mirror; same rule as
    * [[randomProject]]). */
  private[llmops] def typedVecs(emb: DataFrame, dim: Int = Dim) = {
    emb.filter(col("vec_id").isNotNull && col("embedding").isNotNull &&
        size(col("embedding")) === dim)
      .select(col("vec_id").cast("long"), col("embedding").cast("array<double>"))
  }

  val vecFilterSql: String =
    s"vec_id IS NOT NULL AND embedding IS NOT NULL AND len(embedding) = $Dim"

  /** Scored (query, neighbor) pairs: the query set (with norms and, when
    * `bucketed`, LSH signatures) is broadcast; each corpus partition scores
    * its vectors against every query in a primitive loop. */
  private def scoredPairs(emb: DataFrame, isQuery: Column, bucketed: Boolean): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val signs = planeSigns
    val e = typedVecs(emb)
    val queries: Array[(Long, Array[Double], Double, Long)] =
      collectCapped(e.filter(isQuery).as[(Long, Array[Double])], "ANN query set")
        .map { case (id, v) =>
          (id, v, Kernels.norm(v), Kernels.lshSignature(v, signs))
        }
    val bc = spark.sparkContext.broadcast(queries)
    e.as[(Long, Array[Double])].mapPartitions { it =>
      val qs = bc.value
      it.flatMap { case (id, v) =>
        val nrm = Kernels.norm(v)
        val sig = if (bucketed) Kernels.lshSignature(v, signs) else 0L
        qs.iterator
          .filter { case (qid, _, _, qsig) =>
            qid != id && (!bucketed || qsig == sig)
          }
          .map { case (qid, qv, qn, _) =>
            (qid, id, Kernels.dot(qv, v) / (qn * nrm))
          }
      }
    }.toDF("query_id", "neighbor_id", "cos")
  }

  /** Cross-engine-stable 4-decimal rounding (see Hashing.stableRound). */
  private def roundE4(c: Column): Column = Hashing.stableRound(c, 4)

  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        roundE4(col("cos")).as("cos"))
  }

  /** Brute-force cosine top-k: every query vector against the full corpus. */
  def bruteForceTopK(emb: DataFrame, isQuery: Column, k: Int = TopK): DataFrame =
    rankTopK(scoredPairs(emb, isQuery, bucketed = false), k)

  /** LSH-bucketed approximate top-k: rank only within the query's bucket. */
  def lshTopK(emb: DataFrame, isQuery: Column, k: Int = TopK): DataFrame =
    rankTopK(scoredPairs(emb, isQuery, bucketed = true), k)

  // ---------------------------------------------------------------- IVF

  /** Probe count: a query scans the members of its `NProbe` nearest
    * centroids (IVF-style inverted lists, probe > 1 for recall). */
  val NProbe = 2

  /** IVF (inverted-file) approximate top-k — the second scale path next
    * to sign-LSH, with data-adaptive cells instead of fixed hyperplanes.
    *
    * The coarse quantizer is a deterministic sample of corpus vectors
    * (`isCentroid`), standing in for offline-trained k-means centroids —
    * the assignment/probe machinery is identical either way, and a fixed
    * sample keeps the operator oracle-checkable (see [[trainIvfCentroids]]
    * for the trained path). Every vector joins the inverted list of its
    * nearest centroid (argmax cosine, smallest-id tie-break); a query
    * scores only the members of its `nprobe` nearest cells.
    *
    * Scale shape (100 TB): centroids are tiny (nlist·dim doubles, MBs at
    * nlist=sqrt(n)) and broadcast; assignment + scoring is ONE map-side
    * pass over the corpus — no shuffle, no driver collect of the corpus.
    * Candidate work per query drops from n to ~nprobe·n/nlist. */
  def ivfTopK(emb: DataFrame, isQuery: Column, isCentroid: Column,
              k: Int = TopK, nprobe: Int = NProbe): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val e = typedVecs(emb)
    val cents: Array[(Long, Array[Double], Double)] =
      collectCapped(e.filter(isCentroid).as[(Long, Array[Double])], "IVF centroid set")
        .map { case (id, v) => (id, v, Kernels.norm(v)) }
        .sortBy(_._1) // id-ascending: assignCentroid's tie-break contract
    ivfTopKWith(emb, isQuery, cents, k, nprobe)
  }

  /** Shared IVF probe/score path over an in-memory centroid set. */
  private def ivfTopKWith(emb: DataFrame, isQuery: Column,
                          cents: Array[(Long, Array[Double], Double)],
                          k: Int, nprobe: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    require(cents.nonEmpty, "IVF needs at least one centroid")
    val e = typedVecs(emb)
    val queries: Array[(Long, Array[Double], Double, Array[Long])] =
      collectCapped(e.filter(isQuery).as[(Long, Array[Double])], "ANN query set")
        .map { case (id, v) =>
        val nrm = Kernels.norm(v)
        val probes = cents
          .map { case (cid, cv, cn) => (Kernels.dot(v, cv) / (nrm * cn), cid) }
          .sortBy { case (cos, cid) => (-cos, cid) }
          .take(nprobe).map(_._2)
        (id, v, nrm, probes)
      }
    val bcC = spark.sparkContext.broadcast(cents)
    val bcQ = spark.sparkContext.broadcast(queries)
    val scored = e.as[(Long, Array[Double])].mapPartitions { it =>
      val cs = bcC.value
      val qs = bcQ.value
      it.flatMap { case (id, v) =>
        val nrm = Kernels.norm(v)
        val cid = Kernels.assignCentroid(v, nrm, cs)
        qs.iterator
          .filter { case (qid, _, _, probes) => qid != id && probes.contains(cid) }
          .map { case (qid, qv, qn, _) => (qid, id, Kernels.dot(qv, v) / (qn * nrm)) }
      }
    }.toDF("query_id", "neighbor_id", "cos")
    rankTopK(scored, k)
  }

  // ------------------------------------------------------- k-means trainer

  /** Distributed spherical-k-means trainer for the IVF coarse quantizer
    * (Lloyd's iterations, cosine assignment). Each iteration is one
    * Spark-shaped pass:
    *
    *  1. broadcast the current centroids (k·dim doubles — MBs at
    *     k = sqrt(n); the trained-artifact pattern, never the corpus),
    *  2. a narrow `mapPartitions` kernel assigns every vector to its
    *     nearest centroid — the SAME `Kernels.assignCentroid` used at
    *     query time, so training and serving can never disagree on cell
    *     boundaries,
    *  3. per-cell means via a single declarative groupBy with one `avg`
    *     aggregate per dimension (codegen'd, map-side partial) — the only
    *     shuffle, k·dim output rows.
    *
    * Cells that lose all members keep their previous centroid (k stays
    * constant). Initialization is the caller's deterministic `isInit`
    * sample. Returns (cid, centroid) with cid = the init vector's id.
    *
    * Not oracle-gated: iterative refinement is not expressible as one
    * DuckDB query, and `avg` over shuffled doubles is not bit-stable
    * across partitionings — SimilaritySpec gates the invariants instead
    * (k constant, objective non-decreasing, assignment agreement). */
  def trainIvfCentroids(emb: DataFrame, isInit: Column,
                        iterations: Int = 5, dim: Int = Dim): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val e = typedVecs(emb, dim)
    var cents: Array[(Long, Array[Double], Double)] =
      collectCapped(e.filter(isInit).as[(Long, Array[Double])], "k-means init set")
        .map { case (id, v) => (id, v, Kernels.norm(v)) }
        .sortBy(_._1)
    require(cents.nonEmpty, "k-means needs at least one init centroid")
    var it = 0
    while (it < iterations) {
      val bc = spark.sparkContext.broadcast(cents)
      val assigned = e.as[(Long, Array[Double])].mapPartitions { rows =>
        val cs = bc.value
        rows.map { case (_, v) => (Kernels.assignCentroid(v, Kernels.norm(v), cs), v) }
      }.toDF("cid", "v")
      val avgCols = (0 until dim).map(i => avg(col("v").getItem(i)).as(s"c$i"))
      val means: Map[Long, Array[Double]] = assigned.groupBy(col("cid"))
        .agg(avgCols.head, avgCols.tail: _*)
        .collect()
        .map(r => r.getLong(0) -> Array.tabulate(dim)(i => r.getDouble(i + 1)))
        .toMap
      cents = cents.map { case (cid, prev, _) =>
        val c = means.getOrElse(cid, prev) // empty cell keeps its centroid
        (cid, c, Kernels.norm(c))
      }
      bc.unpersist()
      it += 1
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(cents.toIndexedSeq.map(c => (c._1, c._2.toSeq)), 1)
        .map { case (cid, v) => org.apache.spark.sql.Row(cid, v) },
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("cid", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("centroid",
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)))))
  }

  /** IVF top-k against a trained centroid table (cid, centroid) — the
    * serving side of [[trainIvfCentroids]]; same probe machinery as
    * [[ivfTopK]], centroids broadcast from the artifact instead of
    * sampled from the corpus. */
  def ivfTopKTrained(emb: DataFrame, isQuery: Column, centroids: DataFrame,
                     k: Int = TopK, nprobe: Int = NProbe): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val cents: Array[(Long, Array[Double], Double)] =
      collectCapped(centroids.select(col("cid").cast("long"),
          col("centroid").cast("array<double>")).as[(Long, Array[Double])],
          "trained centroid table")
        .map { case (id, v) => (id, v, Kernels.norm(v)) }
        .sortBy(_._1)
    ivfTopKWith(emb, isQuery, cents, k, nprobe)
  }

  /** DuckDB fragment for the sign-LSH signature over list column `v`.
    *
    * The projection is written as an explicit left-associated chain
    * `(0.0 + v[1] - v[2] + ...)` — NOT `list_dot_product` — so the FP
    * summation order is exactly the kernel's left fold (((0+p1)+p2)+...).
    * With ±1 weights every product is exact, so the two engines'
    * projections are bit-identical and the sign bit can never disagree,
    * even when a projection is within double noise of zero. */
  def signatureSql(vCol: String): String = signatureSqlFor(planes, vCol)

  /** Same fragment for an arbitrary hyperplane set (multi-band callers
    * pass one slice per band). */
  def signatureSqlFor(ps: Seq[Seq[Int]], vCol: String): String =
    ps.zipWithIndex.map { case (plane, j) =>
      val chain = plane.zipWithIndex.map { case (s, i) =>
        (if (s > 0) " + " else " - ") + s"$vCol[${i + 1}]"
      }.mkString
      s"(CASE WHEN (0.0$chain) > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  // ----------------------------------------------------------------- queries

  private[llmops] val isQuerySql = "vec_id < 10"

  def qBruteForce(spark: SparkSession, dir: String): DataFrame =
    bruteForceTopK(Tables.load(spark, dir, "embeddings"), expr(isQuerySql))

  val qBruteForceSql: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |           WHERE $vecFilterSql),
       |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |         list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
       |  FROM n q JOIN n c ON q.vec_id <> c.vec_id
       |  WHERE q.$isQuerySql),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cos,
       |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, rank, floor(cos * 10000.0 + 0.5) / 10000.0 AS cos
       |FROM ranked WHERE rank <= $TopK""".stripMargin

  def qLsh(spark: SparkSession, dir: String): DataFrame =
    lshTopK(Tables.load(spark, dir, "embeddings"), expr(isQuerySql))

  val qLshSql: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |           WHERE $vecFilterSql),
       |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm,
       |             ${signatureSql("v")} AS sig
       |      FROM e),
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |         list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
       |  FROM n q JOIN n c ON q.sig = c.sig AND q.vec_id <> c.vec_id
       |  WHERE q.$isQuerySql),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cos,
       |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, rank, floor(cos * 10000.0 + 0.5) / 10000.0 AS cos
       |FROM ranked WHERE rank <= $TopK""".stripMargin

  // ~17 centroids at the 500-vector fixture (≈sqrt(n) inverted lists);
  // any deterministic predicate works — at real scale this is the trained
  // centroid table, not a modulus.
  private[llmops] val isCentroidSql = "vec_id % 29 = 3"

  def qIvf(spark: SparkSession, dir: String): DataFrame =
    ivfTopK(Tables.load(spark, dir, "embeddings"), expr(isQuerySql), expr(isCentroidSql))

  /** nprobe=4 variant: the recall/latency knob served as its own oracle
    * query, so widening the probe set is hash-pinned cross-engine (the
    * spec additionally gates that recall rises monotonically with
    * nprobe). Candidate work scales linearly with nprobe — 4 of ~17
    * cells is still a ~4× cut over brute force at the fixture size, and
    * n/nlist·nprobe at scale. */
  val NProbeWide = 4

  def qIvfNprobe(spark: SparkSession, dir: String): DataFrame =
    ivfTopK(Tables.load(spark, dir, "embeddings"), expr(isQuerySql),
      expr(isCentroidSql), nprobe = NProbeWide)

  val qIvfSql: String = ivfSqlFor(NProbe)

  val qIvfNprobeSql: String = ivfSqlFor(NProbeWide)

  private def ivfSqlFor(nprobe: Int): String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |           WHERE $vecFilterSql),
       |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
       |cent AS (SELECT vec_id AS cid, v AS cv, nrm AS cnrm FROM n WHERE $isCentroidSql),
       |assign AS (
       |  SELECT n.vec_id, cid,
       |         row_number() OVER (PARTITION BY n.vec_id
       |           ORDER BY list_dot_product(v, cv) / (nrm * cnrm) DESC, cid) AS crnk
       |  FROM n CROSS JOIN cent),
       |member AS (SELECT vec_id, cid FROM assign WHERE crnk = 1),
       |probe AS (SELECT vec_id, cid FROM assign WHERE crnk <= $nprobe AND ($isQuerySql)),
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |         list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
       |  FROM probe p
       |  JOIN member m ON m.cid = p.cid
       |  JOIN n q ON q.vec_id = p.vec_id
       |  JOIN n c ON c.vec_id = m.vec_id
       |  WHERE c.vec_id <> q.vec_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cos,
       |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, rank, floor(cos * 10000.0 + 0.5) / 10000.0 AS cos
       |FROM ranked WHERE rank <= $TopK""".stripMargin

  // --------------------------------------------------- random projection

  /** Output dimensionality of [[randomProject]]'s query. */
  val ProjDims = 16

  /** ±1 projection matrix (seed distinct from the LSH planes — the two
    * operators must stay independent). */
  val projSigns: IndexedSeq[IndexedSeq[Int]] =
    graft.llmops.Hashing.hyperplaneSigns(ProjDims, Dim, seed = 19L)

  /** Random ±1 projection (Achlioptas-style Johnson–Lindenstrauss) —
    * compress `Dim`-float embeddings to `dims` components for cheap
    * downstream filtering: distances are preserved within JL distortion
    * at 1/4 the width, and a sign matrix needs no training, no floats,
    * no stored model — the seed IS the model.
    *
    * Components ride as exact integers: each float coordinate is pinned
    * to micro-units once (`round(x·1e6)` as BIGINT), and a ±1 dot
    * product is then an integer SUM — order-free, so the projected
    * vectors are bit-identical on any engine or partitioning and the
    * operator hash-gates END TO END (a float projection could only gate
    * on rounded copies). Per-row work is `dims`·`Dim` long multiply-adds
    * inside codegen'd higher-order functions; no shuffle, no UDF. */
  def randomProject(emb: DataFrame, dims: Int = ProjDims): DataFrame = {
    require(dims >= 1 && dims <= projSigns.length,
      s"dims must be in [1, ${projSigns.length}], got $dims")
    val micro = transform(col("embedding").cast("array<double>"),
      x => round(x * lit(1e6)).cast("long"))
    val comps = (0 until dims).map { j =>
      val s = array(projSigns(j).map(v => lit(v.toLong)): _*)
      aggregate(zip_with(col("_c"), s, (x, y) => x * y),
        lit(0L), (a, x) => a + x).as(s"p$j")
    }
    // ragged vectors are a contract violation, not a row to mangle:
    // zip_with would null-pad (Spark) where list indexing under-sums
    // (DuckDB) — both silently wrong, so they are excluded like NULLs
    emb.filter(col("vec_id").isNotNull && col("embedding").isNotNull &&
        size(col("embedding")) === Dim)
      .select(col("vec_id"), micro.as("_c"))
      .select(col("vec_id") +: comps: _*)
  }

  def qProject(spark: SparkSession, dir: String): DataFrame =
    randomProject(Tables.load(spark, dir, "embeddings"))

  val qProjectSql: String = {
    val signRows = projSigns.zipWithIndex.map { case (row, j) =>
      s"($j, [${row.mkString(", ")}])"
    }.mkString(",\n|          ")
    val pCols = (0 until ProjDims)
      .map(j => s"max(CASE WHEN s.j = $j THEN t.p END) AS p$j")
      .mkString(",\n|       ")
    s"""WITH c AS MATERIALIZED (
       |  SELECT vec_id,
       |         [CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)
       |          FOR x IN embedding] AS c
       |  FROM embeddings
       |  WHERE vec_id IS NOT NULL AND embedding IS NOT NULL
       |    AND len(embedding) = $Dim),
       |s(j, sg) AS (VALUES
       |          $signRows),
       |t AS MATERIALIZED (
       |  SELECT c.vec_id, s.j,
       |         CAST(sum(c.c[i.i] * s.sg[i.i]) AS BIGINT) AS p
       |  FROM c CROSS JOIN s
       |       CROSS JOIN (SELECT unnest(generate_series(1, $Dim)) AS i) i
       |  GROUP BY 1, 2)
       |SELECT t.vec_id,
       |       $pCols
       |FROM t JOIN s ON s.j = t.j
       |GROUP BY t.vec_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_topk_bruteforce" -> (qBruteForce _),
    "sim_topk_lsh" -> (qLsh _),
    "sim_topk_ivf" -> (qIvf _),
    "sim_topk_ivf_nprobe" -> (qIvfNprobe _),
    "embed_project" -> (qProject _))

  val oracleSql: Map[String, String] = Map(
    "sim_topk_bruteforce" -> qBruteForceSql,
    "sim_topk_lsh" -> qLshSql,
    "sim_topk_ivf" -> qIvfSql,
    "sim_topk_ivf_nprobe" -> qIvfNprobeSql,
    "embed_project" -> qProjectSql)
}
