package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Backward as-of join — for each left row, attach the latest right row
  * whose timestamp is <= the left row's, per key. Spark has no native
  * as-of operator; the naive encoding (`l.key = r.key AND l.ts >= r.ts`
  * + a per-left-row argmax) plans as a theta join that explodes
  * quadratically per key and falls off the hash-join path entirely.
  *
  * The scalable expression is the union+window pattern: tag both sides,
  * union them, and carry the last right payload forward with one window
  * per key ordered by (ts, side) — right rows sort BEFORE left rows at
  * equal timestamps, so the match is inclusive. Cost at any scale is ONE
  * shuffle + sort on the key (exactly what a sort-merge join would pay),
  * zero pair explosion, and whole-stage codegen throughout; skewed keys
  * are AQE's standard territory. An optional tolerance nulls matches
  * staler than the given bound (match semantics, not filter semantics:
  * left rows always survive).
  *
  * Ties on the right side at one (key, ts) resolve deterministically to
  * the row latest in `rightOrder` (default: the payload's first column)
  * — callers needing a different winner pass the tiebreak column. */
object AsOfJoin {

  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               payload: Seq[String],
               tolerance: Option[Column] = None,
               rightOrder: Option[String] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    require(payload.nonEmpty, "as-of join needs at least one payload column")
    require(!payload.exists(leftCols.contains),
      s"payload columns ${payload.filter(leftCols.contains)} collide with left columns")
    val tiebreak = rightOrder.getOrElse(payload.head)
    // unified layout: keys ++ _ts ++ _side ++ left columns ++ payload ++ _right_ts
    val l = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(1))
      .withColumn("_tie", lit(null).cast(right.schema(tiebreak).dataType))
      .withColumn("_right_ts", lit(null).cast(right.schema(rightTs).dataType))
    val lAligned = payload.foldLeft(l) { (df, p) =>
      df.withColumn(p, lit(null).cast(right.schema(p).dataType))
    }
    var r = right
      .withColumn("_ts", col(rightTs))
      .withColumn("_side", lit(0))
      .withColumn("_tie", col(tiebreak))
      .withColumn("_right_ts", col(rightTs))
    leftCols.filterNot(keys.contains).foreach { c =>
      r = r.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val unionCols = (keys ++ Seq("_ts", "_side", "_tie", "_right_ts") ++
      leftCols.filterNot(keys.contains) ++ payload).map(col)
    val unioned = lAligned.select(unionCols: _*)
      .unionByName(r.select(unionCols: _*))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts"), col("_side"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = (payload :+ "_right_ts").foldLeft(unioned) { (df, p) =>
      df.withColumn(s"_m_$p", last(col(p), ignoreNulls = true).over(w))
    }
    val matched = carried.filter(col("_side") === 1)
    val withTolerance = tolerance match {
      case None => matched
      case Some(tol) =>
        // stale matches null out; the left row survives (match semantics)
        val fresh = col("_m__right_ts").isNotNull &&
          (col("_ts") - col("_m__right_ts")) <= tol
        (payload :+ "_right_ts").foldLeft(matched) { (df, p) =>
          df.withColumn(s"_m_$p", when(fresh, col(s"_m_$p")))
        }
    }
    val out = leftCols.map(col) ++
      (payload :+ "_right_ts").map(p => col(s"_m_$p").as(
        if (p == "_right_ts") "matched_ts" else p))
    withTolerance.select(out: _*)
  }

  // ----------------------------------------------------------------- query

  /** Attribution: each purchase joined as-of to the user's latest prior
    * click. The DuckDB oracle is its NATIVE `ASOF LEFT JOIN` — two
    * independent implementations of the operator agreeing row for row. */
  def qAsofAttribution(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("cts"),
        col("event_id").as("click_id"), round(col("value"), 2).as("click_value"))
    backward(purchases, clicks, keys = Seq("user_id"),
      leftTs = "ts", rightTs = "cts",
      payload = Seq("click_id", "click_value"),
      rightOrder = Some("click_id"))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("click_id"), col("click_value"), col("matched_ts").as("click_ts"))
  }

  val qAsofSql: String =
    """WITH p AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
      |           FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS cts, event_id AS click_id,
      |             round(value, 2) AS click_value
      |      FROM events WHERE event_type = 'click')
      |SELECT p.event_id, p.user_id, p.ts,
      |       c.click_id, c.click_value, c.cts AS click_ts
      |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.cts""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q22_asof_join" -> (qAsofAttribution _))

  val oracleSql: Map[String, String] = Map(
    "q22_asof_join" -> qAsofSql)
}
