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
  * zero pair explosion, and whole-stage codegen throughout. An optional
  * tolerance nulls matches staler than the given bound (match semantics,
  * not filter semantics: left rows always survive).
  *
  * SKEW: AQE's skew handling splits oversized *join* partitions, not
  * *window* partitions — a hot key's entire history still sorts inside
  * one task here (as it would in the sort-merge join the naive plan
  * needs). When one key dominates, use [[backwardSalted]]: it buckets
  * time into salt partitions, carries within each bucket, and fixes up
  * across buckets with a per-(key, bucket) summary — bounding any task
  * at (hot key rows / buckets) for one extra narrow join.
  *
  * Ties on the right side at one (key, ts) resolve deterministically to
  * the row latest in `rightOrder` (default: the payload's first column)
  * — callers needing a different winner pass the tiebreak column. */
object AsOfJoin {

  private val Reserved =
    Seq("_ts", "_side", "_tie", "_match", "_m", "_bucket", "_s", "_carry")

  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               payload: Seq[String],
               tolerance: Option[Column] = None,
               rightOrder: Option[String] = None): DataFrame = {
    val unioned = alignedUnion(left, right, keys, leftTs, rightTs, payload, rightOrder)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts"), col("_side"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("_m", last(col("_match"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    finish(carried, left.columns.toSeq, payload, tolerance)
  }

  /** Hot-key escape hatch: the same backward as-of, with each key's
    * history split into time buckets (`bucketOf(_ts)` must be monotone
    * non-decreasing in the timestamp — e.g. the day or hour of `ts`).
    *
    * Three phases:
    *  1. carry WITHIN each (key, bucket) window — the per-task sort is
    *     now bounded by the hot key's rows per bucket, not its lifetime;
    *  2. summarize each (key, bucket)'s latest right row (a groupBy of
    *     the same shuffle granularity) and carry the summary across
    *     buckets — one row per (key, bucket), so this window is tiny;
    *  3. left rows whose bucket held no earlier right row take the
    *     carried-in summary (strictly-earlier buckets, so the in-bucket
    *     match, when present, is always the later and wins).
    *
    * The fixup join keys on (keys, _bucket) — the same partitioning the
    * phase-1 window already established, so the big side does not
    * re-shuffle; only the summary table moves. */
  def backwardSalted(left: DataFrame, right: DataFrame, keys: Seq[String],
                     leftTs: String, rightTs: String,
                     payload: Seq[String],
                     bucketOf: Column => Column,
                     tolerance: Option[Column] = None,
                     rightOrder: Option[String] = None): DataFrame = {
    val unioned = alignedUnion(left, right, keys, leftTs, rightTs, payload, rightOrder)
      .withColumn("_bucket", bucketOf(col("_ts")))
    val kb = keys.map(col) :+ col("_bucket")
    val w = Window.partitionBy(kb: _*)
      .orderBy(col("_ts"), col("_side"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inBucket = unioned
      .withColumn("_m", last(col("_match"), ignoreNulls = true).over(w))
    // per-(key, bucket) summary of the latest right row; max over the
    // (ts, tie, match) struct = lexicographic latest, matching the
    // window's tie order
    val summaries = unioned.filter(col("_side") === 0)
      .groupBy(kb: _*)
      .agg(max(struct(col("_ts"), col("_tie"), col("_match"))).as("_s"))
    val buckets = unioned.select(kb: _*).distinct()
      .join(summaries, keys :+ "_bucket", "left")
    val wb = Window.partitionBy(keys.map(col): _*).orderBy(col("_bucket"))
      .rowsBetween(Window.unboundedPreceding, -1) // strictly earlier buckets
    val carryIn = buckets
      .withColumn("_carry", last(col("_s"), ignoreNulls = true).over(wb))
      .select((keys.map(col) :+ col("_bucket") :+
        col("_carry")("_match").as("_carry")): _*)
    val fixed = inBucket.filter(col("_side") === 1)
      .join(carryIn, keys :+ "_bucket", "left")
      .withColumn("_m", coalesce(col("_m"), col("_carry")))
    finish(fixed, left.columns.toSeq, payload, tolerance)
  }

  /** Tag, align, and union the two sides (shared by both variants). */
  private def alignedUnion(left: DataFrame, right: DataFrame, keys: Seq[String],
                           leftTs: String, rightTs: String,
                           payload: Seq[String],
                           rightOrder: Option[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(payload.nonEmpty, "as-of join needs at least one payload column")
    require(!payload.exists(leftCols.contains),
      s"payload columns ${payload.filter(leftCols.contains)} collide with left columns")
    val clash = (leftCols ++ right.columns).filter(
      c => Reserved.contains(c) || c == "matched_ts")
    require(clash.isEmpty,
      s"columns ${clash.distinct} collide with as-of internal/output names " +
        s"(${(Reserved :+ "matched_ts").mkString(", ")})")
    val tiebreak = rightOrder.getOrElse(payload.head)
    // The match travels as ONE struct of (payload ++ right ts), carried
    // by a single last(ignoreNulls) — per-column carries would resurrect
    // older rows' values wherever the matched row holds a legitimate
    // NULL, emitting a mix of rows that never co-existed.
    val matchStruct = struct(
      (payload.map(col) :+ col(rightTs).as("_right_ts")): _*)
    val nullMatch = lit(null).cast(
      org.apache.spark.sql.types.StructType(
        payload.map(p => org.apache.spark.sql.types.StructField(p, right.schema(p).dataType)) :+
          org.apache.spark.sql.types.StructField("_right_ts", right.schema(rightTs).dataType)))
    // single-select alignment (a withColumn per column re-runs analysis
    // per column and grows the plan quadratically on wide tables)
    val lAligned = left.select(
      (keys.map(col) :+ col(leftTs).as("_ts") :+ lit(1).as("_side") :+
        lit(null).cast(right.schema(tiebreak).dataType).as("_tie") :+
        nullMatch.as("_match")) ++
        leftCols.filterNot(keys.contains).map(col): _*)
    val rAligned = right.select(
      (keys.map(col) :+ col(rightTs).as("_ts") :+ lit(0).as("_side") :+
        col(tiebreak).as("_tie") :+ matchStruct.as("_match")) ++
        leftCols.filterNot(keys.contains).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)): _*)
    lAligned.unionByName(rAligned)
  }

  /** Tolerance gate + output projection (shared by both variants). */
  private def finish(carried: DataFrame, leftCols: Seq[String],
                     payload: Seq[String], tolerance: Option[Column]): DataFrame = {
    val gated = tolerance match {
      case None => carried
      case Some(tol) =>
        // stale matches null out; the left row survives (match semantics)
        carried.withColumn("_m",
          when(col("_m").isNotNull &&
            (col("_ts") - col("_m")("_right_ts")) <= tol, col("_m")))
    }
    val out = leftCols.map(col) ++
      payload.map(p => col("_m")(p).as(p)) :+
      col("_m")("_right_ts").as("matched_ts")
    gated.select(out: _*)
  }

  // ----------------------------------------------------------------- query

  /** Attribution: each purchase joined as-of to the user's latest prior
    * click. The oracle is a deterministic argmax window over the same
    * ordering this operator uses ((ts, tiebreak) descending) — DuckDB's
    * native ASOF JOIN agrees on tie-free data (verified on the fixture)
    * but leaves equal-timestamp winners unspecified, which would make
    * the gate nondeterministic if the fixture ever grew ties. */
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
      |      FROM events WHERE event_type = 'click'),
      |j AS (SELECT p.event_id, p.user_id, p.ts,
      |             c.click_id, c.click_value, c.cts,
      |             row_number() OVER (PARTITION BY p.event_id
      |               ORDER BY c.cts DESC, c.click_id DESC) AS rn
      |      FROM p LEFT JOIN c ON p.user_id = c.user_id AND c.cts <= p.ts)
      |SELECT event_id, user_id, ts, click_id, click_value, cts AS click_ts
      |FROM j WHERE rn = 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q22_asof_join" -> (qAsofAttribution _))

  val oracleSql: Map[String, String] = Map(
    "q22_asof_join" -> qAsofSql)
}
