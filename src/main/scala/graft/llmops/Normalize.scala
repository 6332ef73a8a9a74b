package graft.llmops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Per-group feature normalization — the z-score pass an ML pipeline
  * runs before training on numeric features with group-dependent
  * scales.
  *
  * The classic hazard is that mean/variance are FLOAT SUMS whose
  * combine order varies with partitioning — irreproducible outputs and
  * an un-hashable oracle. Here every aggregated moment is an exact
  * INTEGER: values ride as cents, and n, Σx, Σx² are integer sums
  * (order-free). The float math — mean, the textbook
  * (Σx² − (Σx)²/n)/(n−1) sample variance, sqrt, the final division —
  * happens once per GROUP and once per ROW on identical IEEE
  * expression trees, so outputs are bit-stable at any parallelism
  * (sqrt is correctly rounded by IEEE-754, unlike log/pow).
  *
  * Integer-domain guard: |Σx²| < 2^63 needs Σ cents² under ~9.2e18 —
  * at 100 TB with large magnitudes, move the moments to DECIMAL(38,0)
  * (same order-free exactness, wider domain).
  *
  * Shape: one map-side-combined aggregate to |groups| moment rows,
  * broadcast back, then a narrow per-row projection. Groups with n < 2
  * OR zero variance are dropped (a singleton has no sample variance, a
  * constant group's z is 0/0 — and double /0 NaN/Inf semantics differ
  * across engines; the explicit filters pin the contract instead).
  */
object Normalize {

  /** (idCol, groupCol, z) — z-score of `valueCol` (as cents) within its
    * group. */
  def zScore(df: DataFrame, groupCol: String, valueCol: String,
             idCol: String): DataFrame = {
    val cents = round(col(valueCol) * 100).cast("long")
    val rows = df.select(col(idCol), col(groupCol), cents.as("_c"))
      .filter(col(groupCol).isNotNull && col("_c").isNotNull)
    val moments = rows.groupBy(col(groupCol))
      .agg(count(lit(1)).as("_n"), sum(col("_c")).as("_sx"),
        sum(col("_c") * col("_c")).as("_sxx"))
      // n >= 2 AND nonzero variance: a constant group's z is 0/0, whose
      // NaN-vs-NULL semantics differ across engines — drop it instead
      // (integer variance term, same guard as Stats.corrGrouped)
      .filter(col("_n") >= 2 &&
        col("_n") * col("_sxx") - col("_sx") * col("_sx") > 0)
    val mean = col("_sx").cast("double") / col("_n")
    val variance = (col("_sxx").cast("double") -
      col("_sx").cast("double") * col("_sx") / col("_n")) / (col("_n") - 1)
    rows.join(broadcast(moments), Seq(groupCol))
      .select(col(idCol), col(groupCol),
        Hashing.stableRound(
          (col("_c") - mean) / sqrt(variance), 4).as("z"))
  }

  /** (idCol, groupCol, mm) — min-max position of `valueCol` within its
    * group, in [0, 1]. The other standard feature scaler: rank-free,
    * outlier-sensitive where the z-score is variance-based — pipelines
    * pick per feature. Same exactness scheme as [[zScore]]: min/max are
    * order-free INTEGER extremes (cents), the one float division per
    * row runs on an identical IEEE tree in both engines. Groups whose
    * min = max are dropped (no scale — same contract as a singleton's
    * missing variance). */
  def minMax(df: DataFrame, groupCol: String, valueCol: String,
             idCol: String): DataFrame = {
    val cents = round(col(valueCol) * 100).cast("long")
    val rows = df.select(col(idCol), col(groupCol), cents.as("_c"))
      .filter(col(groupCol).isNotNull && col("_c").isNotNull)
    val ext = rows.groupBy(col(groupCol))
      .agg(min(col("_c")).as("_lo"), max(col("_c")).as("_hi"))
      .filter(col("_hi") > col("_lo"))
    rows.join(broadcast(ext), Seq(groupCol))
      .select(col(idCol), col(groupCol),
        Hashing.stableRound(
          (col("_c") - col("_lo")).cast("double") / (col("_hi") - col("_lo")),
          4).as("mm"))
  }

  // ----------------------------------------------------------------- query

  def qZScore(spark: SparkSession, dir: String): DataFrame =
    zScore(Tables.load(spark, dir, "events"),
      "event_type", "value", "event_id")

  /** Identical expression tree: moments as exact integer sums, one
    * float evaluation per group/row. */
  val qZScoreSql: String =
    s"""WITH r AS (SELECT event_id, event_type,
       |                  CAST(round(value * 100) AS BIGINT) AS c
       |           FROM events
       |           WHERE event_type IS NOT NULL AND value IS NOT NULL),
       |m AS (SELECT event_type, count(*) AS n,
       |             CAST(sum(c) AS BIGINT) AS sx,
       |             CAST(sum(c * c) AS BIGINT) AS sxx
       |      FROM r GROUP BY 1
       |      HAVING count(*) >= 2
       |         AND count(*) * CAST(sum(c * c) AS BIGINT)
       |             - CAST(sum(c) AS BIGINT) * CAST(sum(c) AS BIGINT) > 0)
       |SELECT r.event_id, r.event_type,
       |       ${Hashing.stableRoundSql(
         "(r.c - CAST(m.sx AS DOUBLE) / m.n) / " +
           "sqrt((CAST(m.sxx AS DOUBLE) - CAST(m.sx AS DOUBLE) * m.sx / m.n)" +
           " / (m.n - 1))", 4)} AS z
       |FROM r JOIN m USING (event_type)""".stripMargin

  def qMinMax(spark: SparkSession, dir: String): DataFrame =
    minMax(Tables.load(spark, dir, "events"),
      "event_type", "value", "event_id")

  val qMinMaxSql: String =
    s"""WITH r AS (SELECT event_id, event_type,
       |                  CAST(round(value * 100) AS BIGINT) AS c
       |           FROM events
       |           WHERE event_type IS NOT NULL AND value IS NOT NULL),
       |e AS (SELECT event_type, min(c) AS lo, max(c) AS hi
       |      FROM r GROUP BY 1 HAVING max(c) > min(c))
       |SELECT r.event_id, r.event_type,
       |       ${Hashing.stableRoundSql(
         "CAST(r.c - e.lo AS DOUBLE) / (e.hi - e.lo)", 4)} AS mm
       |FROM r JOIN e USING (event_type)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "normalize_z" -> (qZScore _),
    "normalize_minmax" -> (qMinMax _))

  val oracleSql: Map[String, String] = Map(
    "normalize_z" -> qZScoreSql,
    "normalize_minmax" -> qMinMaxSql)
}
