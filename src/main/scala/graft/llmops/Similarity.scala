package graft.llmops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables
import Hashing._

/** Approximate-nearest-neighbor search over an `Array[Float]` embedding
  * column.
  *
  *  - Brute-force cosine top-k: the correctness baseline. Query set ×
  *    corpus join → per-query Window top-k. The query side is broadcast;
  *    the corpus is never collected, so the scan parallelizes across
  *    splits at 100 TB.
  *  - Sign-LSH (random-hyperplane) bucketed top-k: the scale path.
  *    A 16-bit hyperplane signature partitions the corpus; candidates are
  *    only the query's bucket (IVF-style probe=1). Hyperplane components
  *    are fixed ±1 constants (Hashing.hyperplaneSigns) embedded identically
  *    in the DuckDB oracle, so even the approximate path is hash-checkable.
  *
  * Dot products fold left-to-right in double precision in both engines;
  * scores are rounded AFTER ranking (ranking ties broken by vec_id).
  */
object Similarity {

  val TopK = 10
  // 6 planes → 64 buckets: sized so buckets hold ~n/64 candidates at the
  // fixture corpus size. At larger corpora raise NumPlanes (buckets should
  // hold O(10·k) vectors) — the pipeline shape is unchanged.
  val NumPlanes = 6
  val Dim = 64
  val planes: IndexedSeq[IndexedSeq[Int]] = hyperplaneSigns(NumPlanes, Dim)

  private val dotExpr =
    "aggregate(zip_with(va, vb, (x, y) -> x * y), cast(0 as double), (acc, p) -> acc + p)"

  private def normalized(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(expr(
        "aggregate(zip_with(v, v, (x, y) -> x * y), cast(0 as double), (acc, p) -> acc + p)")))

  /** Brute-force cosine top-k: every query vector against the full corpus. */
  def bruteForceTopK(emb: DataFrame, isQuery: Column, k: Int = TopK): DataFrame = {
    val e = normalized(emb)
    val q = e.filter(isQuery)
      .select(col("vec_id").as("query_id"), col("v").as("va"), col("nrm").as("na"))
    val c = e.select(col("vec_id").as("neighbor_id"), col("v").as("vb"), col("nrm").as("nb"))
    val scored = broadcast(q).join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", expr(dotExpr) / (col("na") * col("nb")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("cos"), 4).as("cos"))
  }

  /** 16-bit sign-LSH signature as an expression over a column named `vCol`. */
  def signatureExpr(vCol: String): Column =
    (0 until NumPlanes).map { j =>
      val weights = planes(j).map(s => s"cast($s as double)").mkString("array(", ", ", ")")
      when(expr(
        s"aggregate(zip_with($vCol, $weights, (x, y) -> x * y), cast(0 as double), (acc, p) -> acc + p)") > 0,
        lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** DuckDB fragment for the same signature over list column `v`.
    *
    * The projection is written as an explicit left-associated chain
    * `(0.0 + v[1] - v[2] + ...)` — NOT `list_dot_product` — so the FP
    * summation order is exactly Spark's `aggregate()` left fold
    * (((0+p1)+p2)+...). With ±1 weights every product is exact, so the two
    * engines' projections are bit-identical and the sign bit can never
    * disagree, even when a projection is within double noise of zero. */
  def signatureSql(vCol: String): String =
    (0 until NumPlanes).map { j =>
      val chain = planes(j).zipWithIndex.map { case (s, i) =>
        (if (s > 0) " + " else " - ") + s"$vCol[${i + 1}]"
      }.mkString
      s"(CASE WHEN (0.0$chain) > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** LSH-bucketed approximate top-k: rank only within the query's bucket. */
  def lshTopK(emb: DataFrame, isQuery: Column, k: Int = TopK): DataFrame = {
    val e = normalized(emb).withColumn("sig", signatureExpr("v"))
    val q = e.filter(isQuery)
      .select(col("vec_id").as("query_id"), col("v").as("va"),
        col("nrm").as("na"), col("sig"))
    val c = e.select(col("vec_id").as("neighbor_id"), col("v").as("vb"),
      col("nrm").as("nb"), col("sig"))
    val scored = broadcast(q).join(c, Seq("sig"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", expr(dotExpr) / (col("na") * col("nb")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("cos"), 4).as("cos"))
  }

  // ----------------------------------------------------------------- queries

  private val isQuerySql = "vec_id < 10"

  def qBruteForce(spark: SparkSession, dir: String): DataFrame =
    bruteForceTopK(Tables.load(spark, dir, "embeddings"), expr(isQuerySql))

  val qBruteForceSql: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
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
       |SELECT query_id, neighbor_id, rank, round(cos, 4) AS cos
       |FROM ranked WHERE rank <= $TopK""".stripMargin

  def qLsh(spark: SparkSession, dir: String): DataFrame =
    lshTopK(Tables.load(spark, dir, "embeddings"), expr(isQuerySql))

  val qLshSql: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
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
       |SELECT query_id, neighbor_id, rank, round(cos, 4) AS cos
       |FROM ranked WHERE rank <= $TopK""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_topk_bruteforce" -> (qBruteForce _),
    "sim_topk_lsh" -> (qLsh _))

  val oracleSql: Map[String, String] = Map(
    "sim_topk_bruteforce" -> qBruteForceSql,
    "sim_topk_lsh" -> qLshSql)
}
