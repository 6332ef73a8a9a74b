package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** First-order event-transition mining — the empirical Markov chain
  * over per-entity event streams ("what follows what"): the behavioral
  * fingerprint session analytics reads (view→purchase vs view→error),
  * and the transition prior sequence models and next-event baselines
  * start from.
  *
  * Per entity, events order by (ts, id) — the deterministic tie-break
  * every windowed operator here uses — and each adjacent pair emits one
  * (from_type, to_type) observation; counts roll up to the transition
  * matrix with row-probabilities in exact integer basis points
  * (`(n·10⁴) div n_from`), so the matrix is hash-stable cross-engine.
  *
  * Shape at 100 TB: one per-key window (lag over the entity partition —
  * embarrassingly parallel, no global funnel) and one map-side-combined
  * |types|²-bounded rollup; the n_from attach joins the rollup against
  * its own row sums, never raw rows. */
object Transitions {

  /** (from_type, to_type, n, p_bp) over `events` (entity keyCol, event
    * typeCol, order by tsCol with idCol tie-break). */
  def transitionMatrix(events: DataFrame, keyCol: String, typeCol: String,
                       tsCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(idCol))
    val pairs = events
      .filter(col(keyCol).isNotNull && col(typeCol).isNotNull &&
        col(tsCol).isNotNull)
      .withColumn("_prev", lag(col(typeCol), 1).over(w))
      .filter(col("_prev").isNotNull)
      .groupBy(col("_prev").as("from_type"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n"))
    val rowSums = pairs.groupBy(col("from_type"))
      .agg(sum(col("n")).as("n_from"))
    pairs.join(rowSums, Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"), col("n_from"),
        expr("(n * 10000) div n_from").as("p_bp"))
  }

  // ----------------------------------------------------------------- query

  def qTransitions(spark: SparkSession, dir: String): DataFrame =
    transitionMatrix(Tables.load(spark, dir, "events"),
      "user_id", "event_type", "ts", "event_id")

  val qTransitionsSql: String =
    """WITH p AS (
      |  SELECT lag(event_type, 1) OVER (PARTITION BY user_id
      |           ORDER BY ts, event_id) AS from_type,
      |         event_type AS to_type
      |  FROM events
      |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
      |    AND ts IS NOT NULL),
      |c AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
      |      FROM p WHERE from_type IS NOT NULL GROUP BY 1, 2),
      |rs AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from
      |       FROM c GROUP BY 1)
      |SELECT c.from_type, c.to_type, c.n, rs.n_from,
      |       (c.n * 10000) // rs.n_from AS p_bp
      |FROM c JOIN rs USING (from_type)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "event_transitions" -> (qTransitions _))

  val oracleSql: Map[String, String] = Map(
    "event_transitions" -> qTransitionsSql)
}
