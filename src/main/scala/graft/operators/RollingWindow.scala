package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Rolling time-range aggregates — "activity in the trailing hour" per
  * entity, evaluated AT EVERY EVENT (reference analog: the rolling
  * freshness/activity views the incremental models maintain,
  * `dbtwiz/model/generate.py` date-window family; here generalized to an
  * arbitrary trailing interval).
  *
  * Shape: ONE `Window.partitionBy(key).orderBy(time).rangeBetween(-w, 0)`
  * — a single shuffle on the entity key, then each partition computes its
  * sliding frames with a sorted scan. No self-join (the classic
  * `e1 JOIN e2 ON e2.ts BETWEEN e1.ts - w AND e1.ts` rewrite multiplies
  * rows by the average window population — quadratic in hot windows),
  * and no per-row subquery.
  *
  * At 100 TB the only hazard is a HOT ENTITY: a key with billions of
  * events makes one partition's sorted scan the straggler. The fix is
  * range-partitioning by (key, coarse time bucket) with frame-width
  * overlap stitching — left out until a real key histogram
  * ([[Quantiles.keyDistribution]]) says it's needed.
  *
  * Money rides as integer CENTS (`round(value·100)::long`) so the
  * sliding sums are exact integer arithmetic — the frame-by-frame
  * float-accumulation order (Spark rescans, DuckDB uses segment trees)
  * can never produce cross-engine drift.
  *
  * Time rides as epoch MICROS — matching the engine's timestamp
  * resolution, so the frame boundary `[t - 1h, t]` is exact; RANGE
  * frames include ties (same-instant events see each other) on both
  * engines by SQL semantics.
  */
object RollingWindow {

  val HourMicros: Long = 3600L * 1000000L

  /** Per `keyCol` entity, trailing-`windowMicros` event count and cents
    * sum at every event. `tsCol` must be a TimestampType column;
    * `idCol` is the row-identity column carried through the projection
    * (parameterized like ewma/twap's idCol — a hardcoded event_id made
    * the operator fail on any frame without that exact column). */
  def rollingByKey(events: DataFrame, keyCol: String, tsCol: String,
                   valueCol: String, idCol: String = "event_id",
                   windowMicros: Long = HourMicros): DataFrame = {
    require(windowMicros > 0, s"window must be positive, got $windowMicros")
    val w = Window.partitionBy(keyCol).orderBy(col("ts_us"))
      .rangeBetween(-(windowMicros - 1), 0) // (t - w, t]: w distinct instants
    events
      .select(col(idCol), col(keyCol),
        unix_micros(col(tsCol)).as("ts_us"),
        round(col(valueCol) * 100).cast("long").as("_cents"))
      .withColumn("roll_n", count(lit(1)).over(w))
      .withColumn("roll_cents", sum(col("_cents")).over(w))
      .drop("_cents")
  }

  // ----------------------------------------------------------------- query

  /** Trailing-hour activity per user over the events fixture. */
  def qRolling(spark: SparkSession, dir: String): DataFrame =
    rollingByKey(Tables.load(spark, dir, "events"),
      "user_id", "ts", "value")

  /** `CAST(ts AS TIMESTAMP)` truncates DuckDB's TIMESTAMP_NS to micros —
    * the same floor the Spark loader applies (`Tables.loadEvents`), so
    * both engines window over identical instants. The window sum of
    * BIGINT promotes to HUGEINT in DuckDB → cast back (driver hash is
    * type-sensitive outside int64). */
  val qRollingSql: String =
    """SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
      |       count(*) OVER w AS roll_n,
      |       CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT)
      |         AS roll_cents
      |FROM events
      |WINDOW w AS (PARTITION BY user_id
      |             ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
      |             RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW)"""
      .stripMargin

  /** Day-over-day deltas per event type — the lag() member of the
    * window family (trend monitoring over a daily rollup). The window
    * partitions by key and orders by day AFTER the rollup, so the sort
    * touches |keys|×|days| rows, never raw events; pct change is
    * NULL on each key's first day (no prior — a 0 would fake a flat
    * day) and stable-rounded where defined. */
  def qDailyDelta(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.load(spark, dir, "events")
      .filter(col("event_type").isNotNull && col("ts").isNotNull)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("event_type").orderBy("day")
    val lagN = lag(col("n"), 1).over(w)
    daily.select(col("event_type"), col("day"), col("n"),
      (col("n") - lagN).as("delta"),
      graft.llmops.Hashing.stableRound(
        (col("n") - lagN).cast("double") / lagN, 4).as("pct"))
  }

  val qDailyDeltaSql: String =
    s"""WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
       |           FROM events
       |           WHERE event_type IS NOT NULL AND ts IS NOT NULL
       |           GROUP BY 1, 2)
       |SELECT event_type, day, n,
       |       n - lag(n) OVER w AS delta,
       |       ${graft.llmops.Hashing.stableRoundSql(
        "CAST(n - lag(n) OVER w AS DOUBLE) / lag(n) OVER w", 4)} AS pct
       |FROM d
       |WINDOW w AS (PARTITION BY event_type ORDER BY day)""".stripMargin

  /** LOCF gap-fill resampling — the time-series regularizer: per key, a
    * contiguous daily spine over the key's own [first, last] active day,
    * each day carrying the key's latest observed value
    * (last-observation-carried-forward on gap days). Feature pipelines
    * and BI both need regular grids; a raw event table has neither
    * regular spacing nor explicit gaps.
    *
    * Semantics pinned for the oracle: the day's observation is the
    * value of the key's LAST event that day ((ts, id) descending —
    * deterministic under same-timestamp events); a NULL observed value
    * carries the previous value forward; `is_gap` marks days with NO
    * EVENT AT ALL (a day whose events all carried NULL values is NOT a
    * gap — data arrived, it was just null; liveness monitoring needs
    * the distinction). The filled value is an exact COPY of
    * an input double (no arithmetic), so the output hash-compares.
    *
    * Shape at scale: per-(key, day) argmax + per-key min/max are
    * map-side-combined aggregates; the spine explodes one row per
    * ACTIVE-RANGE day (bounded by keys × span, independent of event
    * volume); the LOCF window partitions by key and touches spine rows
    * only. A key active for years is a span of ~thousands — never a
    * funnel. */
  def resampleLocf(events: DataFrame, keyCol: String, tsCol: String,
                   valueCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = events
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol).as("k"), to_date(col(tsCol)).as("day"),
        col(tsCol).as("_ts"), col(idCol).as("_id"), col(valueCol).as("v"))
    val wObs = Window.partitionBy("k", "day")
      .orderBy(col("_ts").desc, col("_id").desc)
    val obs = e.withColumn("_rn", row_number().over(wObs))
      .filter(col("_rn") === 1)
      .select(col("k"), col("day"), col("v"), lit(true).as("_seen"))
    val spine = e.groupBy(col("k"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("k"),
        explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val wFill = Window.partitionBy("k").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(obs, Seq("k", "day"), "left")
      .select(col("k").as(keyCol), col("day"),
        last(col("v"), ignoreNulls = true).over(wFill).as("value_filled"),
        col("_seen").isNull.as("is_gap"))
  }

  /** Lags in the EWMA window (weights 2^(L−1−k) for lag k — α = 1/2). */
  val EwmaLags = 8

  /** Exponentially-weighted moving average per key — the smoothing pass
    * behind trend monitors and anomaly baselines — made EXACT: α = 1/2
    * gives power-of-two weights, so over the last [[EwmaLags]]
    * observations the weighted numerator `Σ x_{t−k}·2^(L−1−k)` and
    * denominator `Σ 2^(L−1−k)` (present lags only — series heads
    * normalize over what exists) are pure BIGINT sums on integer-cent
    * values, and the smoothed value is one exact integer division. A
    * float EWMA is a sequential recurrence (unparallelizable AND
    * order-drifting); the windowed power-of-two form is one
    * `lag`-chain over the per-key sort — a single shuffle, frames
    * evaluated with a sorted scan.
    *
    * Ordering ties pin by (ts, idCol) so the lag chain is deterministic
    * under any physical row order. */
  def ewmaByKey(events: DataFrame, keyCol: String, tsCol: String,
                valueCol: String, idCol: String,
                lags: Int = EwmaLags): DataFrame = {
    require(lags >= 1 && lags <= 62, s"lags must be in [1, 62], got $lags")
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(idCol))
    val cents = round(col(valueCol) * 100).cast("long")
    val base = events
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull &&
        col(valueCol).isNotNull)
      .withColumn("_c", cents)
    val terms = (0 until lags).map { k =>
      val weight = 1L << (lags - 1 - k)
      val l = lag(col("_c"), k).over(w)
      (when(l.isNotNull, l * weight).otherwise(lit(0L)),
        when(l.isNotNull, lit(weight)).otherwise(lit(0L)))
    }
    val num = terms.map(_._1).reduce(_ + _)
    val den = terms.map(_._2).reduce(_ + _)
    base.withColumn("_num", num.cast("long")).withColumn("_den", den.cast("long"))
      .select(col(keyCol), col(tsCol), col(idCol), col("_c").as("cents"),
        // FLOOR division pinned explicitly (den > 0 always): Spark's
        // `div` truncates toward zero while other engines floor, and
        // events.value may be negative — the shifted-mod form computes
        // floor(num/den) in exact BIGINT arithmetic for any sign of num.
        expr("(_num - ((_num % _den) + _den) % _den) div _den")
          .as("ewma_cents"))
  }

  def qEwma(spark: SparkSession, dir: String): DataFrame =
    ewmaByKey(Tables.load(spark, dir, "events"),
      "user_id", "ts", "value", "event_id")

  /** The identical lag chain and power-of-two algebra; the SAME
    * shifted-mod floor division so negative sums agree byte-for-byte
    * (both engines give `%` the dividend's sign, so the algebra is
    * engine-independent). */
  val qEwmaSql: String = {
    val lags = EwmaLags
    val nums = (0 until lags).map { k =>
      val weight = 1L << (lags - 1 - k)
      s"coalesce(lag(c, $k) OVER w * $weight, 0)"
    }.mkString(" + ")
    val dens = (0 until lags).map { k =>
      val weight = 1L << (lags - 1 - k)
      s"CASE WHEN lag(c, $k) OVER w IS NOT NULL THEN $weight ELSE 0 END"
    }.mkString(" + ")
    s"""SELECT user_id, ts, event_id, c AS cents,
       |       (n - ((n % d) + d) % d) // d AS ewma_cents
       |FROM (
       |  SELECT user_id, ts, event_id, c,
       |         CAST(($nums) AS BIGINT) AS n,
       |         CAST(($dens) AS BIGINT) AS d
       |  FROM (SELECT user_id, ts, event_id,
       |               CAST(round(value * 100) AS BIGINT) AS c
       |        FROM events
       |        WHERE user_id IS NOT NULL AND ts IS NOT NULL
       |          AND value IS NOT NULL)
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))""".stripMargin
  }

  /** Time-weighted average per key and day — the TWAP every
    * sensor/price pipeline needs: a value that held for an hour must
    * outweigh one that held a second, which a plain mean gets wrong.
    * Each observation weighs its HOLD duration (seconds to the key's
    * next event; a day's last event has no duration and drops —
    * documented half-open semantics). Exact integers end to end:
    * cents × whole seconds summed as BIGINT, one integer division —
    * hash-gateable where a float TWAP would drift. One key-sorted
    * window (lead) + one map-side-combined (key, day) roll-up. */
  def twapByKey(events: DataFrame, keyCol: String, tsCol: String,
                valueCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(idCol))
    events
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull &&
        col(valueCol).isNotNull)
      .withColumn("_c", round(col(valueCol) * 100).cast("long"))
      .withColumn("_dur",
        unix_micros(lead(col(tsCol), 1).over(w)) - unix_micros(col(tsCol)))
      .filter(col("_dur").isNotNull && col("_dur") > 0)
      .groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(sum(col("_c") * col("_dur")).as("vxd"), sum(col("_dur")).as("dur_us"))
      // floor division pinned (see ewmaByKey): negative cents must agree
      // across engines, and dur_us > 0 by the filter above
      .withColumn("twap_cents",
        expr("(vxd - ((vxd % dur_us) + dur_us) % dur_us) div dur_us"))
      .select(col(keyCol), col("day"), col("dur_us"), col("twap_cents"))
  }

  def qTwap(spark: SparkSession, dir: String): DataFrame =
    twapByKey(Tables.load(spark, dir, "events"),
      "user_id", "ts", "value", "event_id")

  /** Same lead-duration and integer algebra; EXACT micros both sides
    * (epoch_us ≡ unix_micros — a seconds cast would round vs floor
    * differently on fractional timestamps). */
  val qTwapSql: String =
    """WITH e AS (
      |  SELECT user_id, ts, event_id,
      |         CAST(round(value * 100) AS BIGINT) AS c
      |  FROM events
      |  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL),
      |d AS (
      |  SELECT user_id, ts, c,
      |         epoch_us(lead(ts, 1) OVER (PARTITION BY user_id
      |                                    ORDER BY ts, event_id))
      |           - epoch_us(ts) AS dur
      |  FROM e),
      |g AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day,
      |         CAST(sum(dur) AS BIGINT) AS dur_us,
      |         CAST(sum(c * dur) AS BIGINT) AS vxd
      |  FROM d WHERE dur IS NOT NULL AND dur > 0
      |  GROUP BY 1, 2)
      |SELECT user_id, day, dur_us,
      |       (vxd - ((vxd % dur_us) + dur_us) % dur_us) // dur_us
      |         AS twap_cents
      |FROM g""".stripMargin

  def qResample(spark: SparkSession, dir: String): DataFrame =
    resampleLocf(Tables.load(spark, dir, "events"),
      "user_id", "ts", "value", "event_id")

  /** Same argmax observation, per-key generate_series spine, and
    * IGNORE NULLS carry. */
  val qResampleSql: String =
    """WITH e AS (
      |  SELECT user_id AS k, CAST(ts AS DATE) AS day, ts, event_id, value
      |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
      |obs AS MATERIALIZED (
      |  SELECT k, day, value AS v FROM (
      |    SELECT k, day, value,
      |           row_number() OVER (PARTITION BY k, day
      |             ORDER BY ts DESC, event_id DESC) AS rn
      |    FROM e)
      |  WHERE rn = 1),
      |spine AS (
      |  SELECT k, unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
      |  FROM (SELECT k, min(day) AS d0, max(day) AS d1 FROM e GROUP BY 1)),
      |j AS (SELECT s.k, s.day, o.v, o.k IS NOT NULL AS seen
      |      FROM spine s LEFT JOIN obs o ON o.k = s.k AND o.day = s.day)
      |SELECT k AS user_id, day,
      |       last_value(v IGNORE NULLS) OVER (
      |         PARTITION BY k ORDER BY day
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |         AS value_filled,
      |       NOT seen AS is_gap
      |FROM j""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ewma_smooth" -> (qEwma _),
    "q63_twap" -> (qTwap _),
    "q30_rolling" -> (qRolling _),
    "q47_daily_delta" -> (qDailyDelta _),
    "q56_resample_locf" -> (qResample _))

  val oracleSql: Map[String, String] = Map(
    "ewma_smooth" -> qEwmaSql,
    "q63_twap" -> qTwapSql,
    "q30_rolling" -> qRollingSql,
    "q47_daily_delta" -> qDailyDeltaSql,
    "q56_resample_locf" -> qResampleSql)
}
