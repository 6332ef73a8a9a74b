package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.llmops.Hashing

/** KMV (k-minimum-values) distinct-count sketch.
  *
  * Spark's native `approx_count_distinct` is HLL++, whose register
  * layout and estimate are engine-internal — useful, but unverifiable
  * against another engine. KMV is the sketch whose STATE is portable:
  * keep the k smallest distinct hash values; with hashes uniform on
  * [0, D), the kth minimum h₍k₎ estimates the distinct count as
  * (k-1)·D / h₍k₎. Built on the shared 60-bit md5 hash, the sketch —
  * and therefore the estimate — is bit-identical across engines,
  * partitionings, and runs, so even the APPROXIMATION is oracle-gated
  * exactly.
  *
  * Scale shape: per-partition top-k then a k-sized merge
  * (TakeOrderedAndProject — the same machinery as any `ORDER BY ...
  * LIMIT k`), so driver traffic is k longs regardless of input size.
  * Sketches merge by unioning values and re-taking the k smallest,
  * making this a proper distributed/mergeable summary. */
object Sketch {

  val D: Double = 1152921504606846976.0 // 2^60: md5Long's hash domain

  /** One-row frame (n_hashes, kth_hash, estimate): n_hashes < k means
    * the sketch saw every distinct value and the estimate is exact. */
  def kmvDistinct(df: DataFrame, column: String, k: Int = 256): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    // NULLs don't participate: count(DISTINCT col) semantics — and Spark
    // sorts NULLS FIRST while DuckDB's LIMIT takes NULLS LAST, so an
    // unfiltered NULL would both inflate the estimate and break the
    // sketch's cross-engine portability
    df.filter(col(column).isNotNull)
      .select(Hashing.md5Long(col(column).cast("string")).as("h"))
      .distinct()
      .orderBy(col("h"))
      .limit(k)
      .agg(count(lit(1)).as("n_hashes"), max(col("h")).as("kth_hash"))
      .select(col("n_hashes"), col("kth_hash"),
        Hashing.stableRound(
          when(col("n_hashes") < k, col("n_hashes").cast("double"))
            .otherwise(lit((k - 1) * D) / col("kth_hash")), 4).as("estimate"))
  }

  // ----------------------------------------------------------------- query

  /** Distinct l_partkey estimate at k=256, with the exact count beside
    * it so the gate also witnesses the estimate's accuracy. */
  def qKmv(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    kmvDistinct(li, "l_partkey", k = 256)
      .crossJoin(li.agg(countDistinct(col("l_partkey")).as("exact_distinct")))
  }

  val qKmvSql: String =
    s"""WITH h AS (SELECT DISTINCT ${Hashing.md5LongSql("CAST(l_partkey AS VARCHAR)")} AS h
       |           FROM lineitem WHERE l_partkey IS NOT NULL),
       |k AS (SELECT h FROM h ORDER BY h LIMIT 256),
       |s AS (SELECT count(*) AS n_hashes, max(h) AS kth_hash FROM k)
       |SELECT n_hashes, kth_hash,
       |       floor((CASE WHEN n_hashes < 256 THEN n_hashes * 1.0
       |              ELSE (255 * 1152921504606846976.0) / kth_hash END)
       |             * 10000.0 + 0.5) / 10000.0 AS estimate,
       |       (SELECT count(DISTINCT l_partkey) FROM lineitem) AS exact_distinct
       |FROM s""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q24_kmv_sketch" -> (qKmv _))

  val oracleSql: Map[String, String] = Map(
    "q24_kmv_sketch" -> qKmvSql)
}
