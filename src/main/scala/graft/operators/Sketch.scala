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

  // ------------------------------------------------------------ Count-Min

  /** Count-Min frequency sketch over a key column: depth rows of width
    * counters; `est(x) = min_d counter[d][h_d(x)]` never underestimates.
    * Like KMV (and unlike Spark's native `count_min_sketch`, whose binary
    * state is engine-internal), the hash family is the shared md5 — so
    * counters and estimates are bit-identical across engines and the
    * APPROXIMATION itself is oracle-gated.
    *
    * The depth hashes are Kirsch-Mitzenmacher double hashing,
    * `h_d(x) = (h1 + d·h2) mod width` with h1/h2 the digest's two 60-bit
    * halves: ONE md5 per input row (not one per row per depth — at depth
    * 4 that's 4× the dominant kernel cost) while preserving the CMS error
    * bounds. h1 + d·h2 < 2^60 + 4·2^60 stays well inside a signed Long.
    *
    * Scale shape: building is one aggregation with map-side combine down
    * to depth×width rows (each input row expands to `depth` bucket
    * increments — a constant-factor narrow explode, no corpus shuffle
    * beyond the final combine); the finished sketch is KBs, broadcast for
    * point estimates. Sketches of disjoint inputs merge by adding
    * counters, so this is a proper distributed summary. */
  def cmsBuild(df: DataFrame, column: String, width: Int, depth: Int): DataFrame = {
    require(width >= 2 && depth >= 1, s"need width>=2, depth>=1; got $width x $depth")
    withCmsHashes(df.filter(col(column).isNotNull), column)
      .select(explode(bucketArray(width, depth)).as("db"))
      .groupBy(col("db.d").as("d"), col("db.bucket").as("bucket"))
      .agg(count(lit(1)).as("c"))
  }

  /** Pin h1/h2 as REAL columns in their own projection so the digest is
    * evaluated once per row — referencing the md5 expression tree from
    * every array element would re-evaluate it per depth. */
  private def withCmsHashes(df: DataFrame, column: String): DataFrame = {
    val k = col(column).cast("string")
    df.select(col(column), Hashing.md5Long(k).as("_h1"), Hashing.md5LongHi(k).as("_h2"))
  }

  /** The depth (d, bucket) pairs from the pinned hash columns:
    * `h_d = (h1 + d·h2) mod width`. */
  private def bucketArray(width: Int, depth: Int): org.apache.spark.sql.Column =
    array((0 until depth).map { d =>
      struct(lit(d).as("d"),
        pmod(col("_h1") + lit(d.toLong) * col("_h2"), lit(width)).as("bucket"))
    }: _*)

  /** Point estimates for `keys` (a one-column frame named like `column`)
    * against a built sketch: broadcast the depth×width sketch, take the
    * min counter per key. Keys absent from the input estimate 0. */
  def cmsEstimate(sketch: DataFrame, keys: DataFrame, column: String,
                  width: Int, depth: Int): DataFrame =
    withCmsHashes(keys, column)
      .select(col(column), explode(bucketArray(width, depth)).as("db"))
      .select(col(column), col("db.d").as("d"), col("db.bucket").as("bucket"))
      .join(broadcast(sketch), Seq("d", "bucket"), "left")
      .groupBy(col(column))
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))

  val CmsWidth = 512
  val CmsDepth = 4

  /** Pre-flight JOIN-SIZE estimation from two CMS sketches — the AMS
    * inner-product trick: |A ⋈_k B| = Σ_k cntA(k)·cntB(k), and the
    * per-depth inner product of the two counter grids computes exactly
    * that PLUS non-negative collision cross-terms, so every depth
    * over-estimates and the MIN over depths is the tightest. The
    * planner question this answers at 100 TB — "will this join explode?"
    * — costs two sketch builds (map-side-combined, never a shuffle of
    * either input) and a (d, bucket)-keyed join of two grid frames,
    * instead of running the join.
    *
    * Width governs the error: expected cross-term ≈ |A|·|B|/width per
    * depth, so size width ≫ |A|·|B|/tolerable_error — [[JoinWidth]]'s
    * 2^20 puts the fixture error under 2%. Counter products stay in
    * int64 while cntA·cntB·width < 2^63 (~10B×10B rows at 2^20 — cast
    * the grid to DECIMAL beyond that). */
  def cmsJoinSize(a: DataFrame, aCol: String, b: DataFrame, bCol: String,
                  width: Int = JoinWidth, depth: Int = CmsDepth): DataFrame = {
    val spark = a.sparkSession
    import spark.implicits._
    val sa = cmsBuild(a, aCol, width, depth).withColumnRenamed("c", "ca")
    val sb = cmsBuild(b, bCol, width, depth).withColumnRenamed("c", "cb")
    val ips = sa.join(sb, Seq("d", "bucket")) // absent buckets: 0 terms
      .groupBy(col("d")).agg(sum(col("ca") * col("cb")).as("ip"))
    // anchor EVERY depth: a depth whose grids share no bucket has inner
    // product 0 (the join is provably empty) and must clamp the min —
    // dropping it (inner-join only) would inflate disjoint inputs to
    // whatever their colliding depths say, and all-disjoint inputs to a
    // NULL row
    (0 until depth).toDF("d").join(ips, Seq("d"), "left")
      .agg(min(coalesce(col("ip"), lit(0L))).as("est_join_rows"))
  }

  val JoinWidth: Int = 1 << 20

  /** CMS frequency estimates for the 8 smallest part keys, with exact
    * counts beside them: at width 512 over thousands of distinct keys,
    * some buckets collide, so the gate witnesses REAL over-estimates
    * (est >= exact always; equality where no collision) — bit-identical
    * in both engines. */
  def qCms(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    val sketch = cmsBuild(li, "l_partkey", CmsWidth, CmsDepth)
    val keys = li.select(col("l_partkey")).filter(col("l_partkey") <= 8).distinct()
    val exact = li.filter(col("l_partkey") <= 8)
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("exact_n"))
    cmsEstimate(sketch, keys, "l_partkey", CmsWidth, CmsDepth)
      .join(exact, Seq("l_partkey"))
      .select(col("l_partkey"), col("exact_n"), col("est"))
  }

  val qCmsSql: String = {
    s"""WITH ds AS (SELECT unnest(generate_series(0, ${CmsDepth - 1})) AS d),
       |hashed AS MATERIALIZED (
       |  SELECT l_partkey,
       |         ${Hashing.md5LongSql("CAST(l_partkey AS VARCHAR)")} AS h1,
       |         ${Hashing.md5LongHiSql("CAST(l_partkey AS VARCHAR)")} AS h2
       |  FROM lineitem),
       |sketch AS MATERIALIZED (
       |  SELECT ds.d AS d, (hashed.h1 + ds.d * hashed.h2) % $CmsWidth AS bucket,
       |         count(*) AS c
       |  FROM hashed CROSS JOIN ds
       |  GROUP BY 1, 2),
       |sel AS (SELECT DISTINCT l_partkey, h1, h2 FROM hashed WHERE l_partkey <= 8),
       |est AS (
       |  SELECT sel.l_partkey, min(coalesce(s.c, 0)) AS est
       |  FROM sel CROSS JOIN ds
       |  LEFT JOIN sketch s ON s.d = ds.d
       |    AND s.bucket = (sel.h1 + ds.d * sel.h2) % $CmsWidth
       |  GROUP BY 1)
       |SELECT e.l_partkey, x.exact_n, e.est
       |FROM est e JOIN (SELECT l_partkey, count(*) AS exact_n FROM lineitem
       |                 WHERE l_partkey <= 8 GROUP BY 1) x USING (l_partkey)""".stripMargin
  }

  // ------------------------------------------------------------------- hll

  /** HyperLogLog register count (p=8). Raw-estimator territory wants
    * n/m ≳ 2.5; the fixture's 2000 distinct keys over 256 registers sit
    * comfortably there. */
  val HllBuckets = 256

  /** Bits left in the 60-bit hash after the bucket index. */
  private val HllVBits = 52

  /** alpha_m · m² · 2^62 — the full estimator numerator as ONE double,
    * computed once here and embedded as the same literal in the oracle
    * SQL, so neither engine re-derives it in a different operation
    * order. */
  val HllNumerator: Double =
    0.7213 / (1.0 + 1.079 / HllBuckets) * HllBuckets * HllBuckets *
      4.611686018427387904e18

  private val TwoPow62 = new java.math.BigDecimal("4611686018427387904")

  /** HyperLogLog distinct-count estimate — the REGISTER-PORTABLE twin of
    * [[kmvDistinct]]: bucket = low 8 hash bits, register M_j = max over
    * the bucket of the remaining 52 bits' leading-zero rank, estimate =
    * alpha·m²/Σ2^−M_j. Like the CMS/KMV, every step is reproducible in
    * plain SQL: the rank comes from the binary-string length of the
    * value (integer-exact in both engines, no log2 rounding hazard), and
    * the harmonic sum is taken in INTEGER units of 2^−62 as
    * DECIMAL(38,0) — 2^(62−M_j) is an exact power of two, so the sum is
    * exact and ORDER-FREE where a double fold would be
    * order-sensitive and break the cross-engine hash.
    *
    * Scale shape: one narrow hash projection, one 256-row groupBy with
    * map-side combine, one scalar agg. Registers merge by max, so
    * sketches of disjoint inputs compose. */
  /** Register table (keys* , bucket, mj) — the shared sketch state both
    * the global and the per-group estimators aggregate. Mergeable by
    * `max(mj)` per (keys, bucket). */
  private def hllReg(df: DataFrame, keys: Seq[String],
                     column: String): DataFrame = {
    val m = HllBuckets
    val h1 = Hashing.md5Long(col(column).cast("string"))
    // integer div, NOT `/`: h1 is up to 60 bits and `/` detours through
    // a double whose 53-bit mantissa would corrupt the value
    val v = expr(s"h1 div $m")
    val rho = when(col("v") === 0, HllVBits + 1)
      .otherwise(lit(HllVBits + 1) - length(bin(col("v"))))
    val keep = keys.map(k => col(k).isNotNull)
      .foldLeft(col(column).isNotNull)(_ && _)
    val k = keys.map(col)
    df.filter(keep)
      .select(k :+ h1.as("h1"): _*)
      .select(k ++ Seq((col("h1") % m).as("bucket"), v.as("v")): _*)
      .select(k ++ Seq(col("bucket"), rho.as("rho")): _*)
      .groupBy((k :+ col("bucket")): _*).agg(max(col("rho")).as("mj"))
  }

  /** The two harmonic-sum aggregates over a register table. */
  private val hllAggs = Seq(
    sum(pow(lit(2.0), lit(62) - col("mj")).cast("decimal(38,0)")).as("ssum"),
    count(lit(1)).as("nz"))

  /** estimate = numerator / (Σ2^(62−mj) + empty·2^62), stable-rounded. */
  private def hllEstimate: org.apache.spark.sql.Column = Hashing.stableRound(
    lit(HllNumerator) /
      (col("ssum") + (lit(HllBuckets) - col("nz")).cast("decimal(38,0)") *
        lit(TwoPow62)).cast("double"), 4)

  def hllDistinct(df: DataFrame, column: String): DataFrame =
    hllReg(df, Nil, column)
      .agg(hllAggs.head, hllAggs.tail: _*)
      .select(col("nz").as("n_buckets_used"), hllEstimate.as("estimate"))

  /** Per-GROUP HLL sketches — "distinct users per event type / per day /
    * per source" at sketch cost: the register table is
    * |groups| × 256 rows however large the input, registers still merge
    * by max (so per-day sketches roll up to per-month by a second max),
    * and each group's estimate uses the identical integer-unit harmonic
    * sum as [[hllDistinct]]. The grouped rollup this replaces —
    * `groupBy(g).agg(countDistinct(x))` — shuffles every distinct
    * (g, x) pair; this shuffles at most 256 rows per group. */
  def hllDistinctBy(df: DataFrame, groupCol: String,
                    column: String): DataFrame =
    hllReg(df, Seq(groupCol), column)
      .groupBy(col(groupCol))
      .agg(hllAggs.head, hllAggs.tail: _*)
      .select(col(groupCol), col("nz").as("n_buckets_used"),
        hllEstimate.as("estimate"))

  def qHll(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    hllDistinct(li, "l_partkey")
      .crossJoin(li.agg(countDistinct(col("l_partkey")).as("exact_distinct")))
  }

  val qHllSql: String = {
    val m = HllBuckets
    val h = Hashing.md5LongSql("CAST(l_partkey AS VARCHAR)")
    val num = f"$HllNumerator%.17e"
    s"""WITH b AS (SELECT $h % $m AS bucket, $h // $m AS v FROM lineitem),
       |r AS (SELECT bucket, CASE WHEN v = 0 THEN ${HllVBits + 1}
       |                          ELSE ${HllVBits + 1} - length(bin(v)) END AS rho
       |      FROM b),
       |reg AS (SELECT bucket, max(rho) AS mj FROM r GROUP BY 1),
       |s AS (SELECT sum(CAST(power(2, 62 - mj) AS DECIMAL(38,0))) AS ssum,
       |             count(*) AS nz FROM reg),
       |tot AS (SELECT nz, ssum + CAST($m - nz AS DECIMAL(38,0)) *
       |               CAST(4611686018427387904 AS DECIMAL(38,0)) AS st
       |        FROM s)
       |SELECT nz AS n_buckets_used,
       |       ${Hashing.stableRoundSql(s"$num / CAST(st AS DOUBLE)", 4)}
       |         AS estimate,
       |       (SELECT count(DISTINCT l_partkey) FROM lineitem)
       |         AS exact_distinct
       |FROM tot""".stripMargin
  }

  /** Distinct users per event type: sketch estimate beside the exact
    * count, one row per type. */
  def qHllGrouped(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    hllDistinctBy(e, "event_type", "user_id")
      .join(e.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("exact_distinct")),
        Seq("event_type"))
  }

  /** DuckDB CTE chain shared by the BATCH (`hll_grouped`) and STREAMING
    * (`q39_stream_hll`) grouped-HLL oracles — one statement of the
    * register math, so the two gates provably check the same sketch. */
  val HllGroupedOracleCtes: String = {
    val m = HllBuckets
    val h = Hashing.md5LongSql("CAST(user_id AS VARCHAR)")
    s"""WITH b AS (SELECT event_type, $h % $m AS bucket, $h // $m AS v
       |           FROM events
       |           WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
       |r AS (SELECT event_type, bucket,
       |             CASE WHEN v = 0 THEN ${HllVBits + 1}
       |                  ELSE ${HllVBits + 1} - length(bin(v)) END AS rho
       |      FROM b),
       |reg AS (SELECT event_type, bucket, max(rho) AS mj FROM r GROUP BY 1, 2),
       |s AS (SELECT event_type,
       |             sum(CAST(power(2, 62 - mj) AS DECIMAL(38,0))) AS ssum,
       |             count(*) AS nz FROM reg GROUP BY 1),
       |tot AS (SELECT event_type, nz,
       |               ssum + CAST($m - nz AS DECIMAL(38,0)) *
       |                 CAST(4611686018427387904 AS DECIMAL(38,0)) AS st
       |        FROM s)""".stripMargin
  }

  /** Estimate select fragment against `tot` (qualify with `prefix`). */
  def hllGroupedEstimateSql(prefix: String): String = {
    val num = f"$HllNumerator%.17e"
    Hashing.stableRoundSql(s"$num / CAST(${prefix}st AS DOUBLE)", 4)
  }

  val qHllGroupedSql: String =
    s"""$HllGroupedOracleCtes,
       |ex AS (SELECT event_type, count(DISTINCT user_id) AS exact_distinct
       |       FROM events GROUP BY 1)
       |SELECT t.event_type, t.nz AS n_buckets_used,
       |       ${hllGroupedEstimateSql("t.")} AS estimate,
       |       ex.exact_distinct
       |FROM tot t JOIN ex USING (event_type)""".stripMargin

  /** Estimated vs exact size of orders ⋈ lineitem on the order key —
    * the estimate never under-counts (inner product ≥ true size). */
  def qJoinSize(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val li = Tables.load(spark, dir, "lineitem")
    cmsJoinSize(o, "o_orderkey", li, "l_orderkey")
      .crossJoin(o.join(li, col("o_orderkey") === col("l_orderkey"))
        .agg(count(lit(1)).as("exact_join_rows")))
  }

  val qJoinSizeSql: String = {
    val w = JoinWidth
    val hA = Hashing.md5LongSql("CAST(o_orderkey AS VARCHAR)")
    val hA2 = Hashing.md5LongHiSql("CAST(o_orderkey AS VARCHAR)")
    val hB = Hashing.md5LongSql("CAST(l_orderkey AS VARCHAR)")
    val hB2 = Hashing.md5LongHiSql("CAST(l_orderkey AS VARCHAR)")
    s"""WITH ds AS (SELECT unnest(generate_series(0, ${CmsDepth - 1})) AS d),
       |ha AS MATERIALIZED (
       |  SELECT $hA AS h1, $hA2 AS h2 FROM orders
       |  WHERE o_orderkey IS NOT NULL),
       |hb AS MATERIALIZED (
       |  SELECT $hB AS h1, $hB2 AS h2 FROM lineitem
       |  WHERE l_orderkey IS NOT NULL),
       |sa AS (SELECT ds.d, (h1 + ds.d * h2) % $w AS bucket, count(*) AS ca
       |       FROM ha CROSS JOIN ds GROUP BY 1, 2),
       |sb AS (SELECT ds.d, (h1 + ds.d * h2) % $w AS bucket, count(*) AS cb
       |       FROM hb CROSS JOIN ds GROUP BY 1, 2),
       |ip AS (SELECT sa.d, CAST(sum(sa.ca * sb.cb) AS BIGINT) AS ip
       |       FROM sa JOIN sb USING (d, bucket) GROUP BY 1)
       |SELECT (SELECT CAST(min(coalesce(ip.ip, 0)) AS BIGINT)
       |        FROM ds LEFT JOIN ip USING (d)) AS est_join_rows,
       |       (SELECT count(*) FROM orders JOIN lineitem
       |        ON o_orderkey = l_orderkey) AS exact_join_rows""".stripMargin
  }

  /** Sliding-window distinct estimation — "7-day active users, per day"
    * — the query whose EXACT form is quadratic (every day re-counts its
    * whole window) and whose sketch form is almost free: daily HLL
    * registers merge by max, so each day's register row fans out to the
    * ≤ `windowDays` windows it belongs to (a constant ≤ w×256-row
    * explode of the TINY register table, never of the data) and a
    * second max-merge per (window-day, bucket) yields every window's
    * sketch in one pass. The raw data is touched exactly once, identical
    * to the plain daily sketch; window width changes cost nothing.
    *
    * Days ride as integer epoch-day numbers end to end (date
    * `sequence()` semantics differ across engines; integers don't).
    * Output days are clamped to days that exist in the data (a trailing
    * ghost window after the last day would estimate from stale
    * registers). Estimates use the shared exact-integer harmonic sum,
    * so the approximation itself is oracle-gated like [[hllDistinct]]'s. */
  def hllSlidingDistinct(df: DataFrame, tsCol: String, column: String,
                         windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val withDay = df
      .filter(col(tsCol).isNotNull)
      .withColumn("day", datediff(to_date(col(tsCol)), lit("1970-01-01"))
        .cast("long"))
    // the register table feeds both the day-clamp and the fan-out —
    // stage the |days|×256 frame once instead of sketching data twice
    val reg = hllReg(withDay, Seq("day"), column).localCheckpoint(true)
    val days = reg.select(col("day")).distinct()
    val merged = reg
      .withColumn("out_day",
        explode(sequence(col("day"), col("day") + (windowDays - 1))))
      .join(days.withColumnRenamed("day", "out_day"), Seq("out_day"),
        "left_semi")
      .groupBy(col("out_day"), col("bucket")).agg(max(col("mj")).as("mj"))
    val result = merged.groupBy(col("out_day"))
      .agg(hllAggs.head, hllAggs.tail: _*)
      .select(col("out_day").as("day"), col("nz").as("n_buckets_used"),
        hllEstimate.as("estimate"))
    // |days|-row result re-stages, the register table releases — no
    // orphaned checkpoint per invocation (the Stats.chi2 pattern)
    val out = result.localCheckpoint(true)
    reg.unpersist()
    out
  }

  /** Trailing-7-day active users per day, with the exact count beside
    * it (computed by the SAME fan-out trick on the distinct (day, user)
    * pairs — equi-joins only, no per-day range rescan). */
  def qHllSliding(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
    val est = hllSlidingDistinct(e, "ts", "user_id")
    val pairs = e.select(
      datediff(to_date(col("ts")), lit("1970-01-01")).cast("long").as("day"),
      col("user_id")).distinct()
    val days = pairs.select(col("day")).distinct()
    val exact = pairs
      .withColumn("out_day", explode(sequence(col("day"), col("day") + 6)))
      .join(days.withColumnRenamed("day", "out_day"), Seq("out_day"),
        "left_semi")
      .select(col("out_day").as("day"), col("user_id")).distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("exact_distinct"))
    est.join(exact, Seq("day"))
  }

  val qHllSlidingSql: String = {
    val m = HllBuckets
    val h = Hashing.md5LongSql("CAST(user_id AS VARCHAR)")
    s"""WITH e AS MATERIALIZED (
       |  SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
       |         user_id
       |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
       |b AS (SELECT day, $h % $m AS bucket, $h // $m AS v FROM e),
       |r AS (SELECT day, bucket,
       |             CASE WHEN v = 0 THEN ${HllVBits + 1}
       |                  ELSE ${HllVBits + 1} - length(bin(v)) END AS rho
       |      FROM b),
       |reg AS MATERIALIZED (
       |  SELECT day, bucket, max(rho) AS mj FROM r GROUP BY 1, 2),
       |days AS MATERIALIZED (SELECT DISTINCT day FROM reg),
       |fan AS (SELECT reg.day + w.w AS out_day, reg.bucket, reg.mj
       |        FROM reg CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS w) w),
       |mrg AS (SELECT out_day, bucket, max(mj) AS mj
       |        FROM fan WHERE out_day IN (SELECT day FROM days)
       |        GROUP BY 1, 2),
       |s AS (SELECT out_day AS day,
       |             sum(CAST(power(2, 62 - mj) AS DECIMAL(38,0))) AS ssum,
       |             count(*) AS nz FROM mrg GROUP BY 1),
       |tot AS (SELECT day, nz,
       |               ssum + CAST($m - nz AS DECIMAL(38,0)) *
       |                 CAST(4611686018427387904 AS DECIMAL(38,0)) AS st
       |        FROM s),
       |pairs AS MATERIALIZED (SELECT DISTINCT day, user_id FROM e),
       |ex AS (SELECT f.out_day AS day, count(DISTINCT f.user_id)
       |                AS exact_distinct
       |       FROM (SELECT p.day + w.w AS out_day, p.user_id
       |             FROM pairs p CROSS JOIN
       |               (SELECT unnest(generate_series(0, 6)) AS w) w) f
       |       WHERE f.out_day IN (SELECT day FROM days)
       |       GROUP BY 1)
       |SELECT t.day, t.nz AS n_buckets_used,
       |       ${hllGroupedEstimateSql("t.")} AS estimate,
       |       ex.exact_distinct
       |FROM tot t JOIN ex USING (day)""".stripMargin
  }

  // ------------------------------------------------------- KMV set algebra

  /** KMV INTERSECTION estimate — "how many training users also appear in
    * eval?" answered from two k-sized sketches instead of a
    * distinct-distinct join. The classic KMV closure property: the k
    * smallest hashes of A ∪ B are computable from the k smallest of A
    * and the k smallest of B alone (any union-top-k hash h satisfies
    * h ≤ τ_U ≤ min(τ_A, τ_B), so h's membership in A is decided by kA —
    * full-set membership never needs consulting). ρ = |union-top-k ∩ A
    * ∩ B| / k is an unbiased Jaccard estimate and est_inter = ρ · est_U.
    *
    * Under k total distinct hashes everything degrades to EXACT counts —
    * the CASE keeps one expression tree so both engines agree bit-wise
    * on either path.
    *
    * 100 TB shape: each side is one hash-projection + distinct +
    * TakeOrdered(k) — the only full-data operation is the narrow
    * distinct; everything after runs on ≤ 2k rows. Sketches are
    * mergeable (min-k of min-ks), so per-partition / per-day sketches
    * union without touching raw data again. */
  def kmvIntersect(a: DataFrame, aExpr: org.apache.spark.sql.Column,
                   b: DataFrame, bExpr: org.apache.spark.sql.Column,
                   k: Int = 256): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    // each min-k sketch is consumed twice (union + membership join);
    // staging the k-row result stops the corpus distinct+TakeOrdered
    // from running twice per side
    def minK(df: DataFrame, e: org.apache.spark.sql.Column): DataFrame =
      df.filter(e.isNotNull)
        .select(Hashing.md5Long(e.cast("string")).as("h"))
        .distinct().orderBy(col("h")).limit(k)
        .localCheckpoint(true)
    val kA = minK(a, aExpr)
    val kB = minK(b, bExpr)
    val unionK = kA.union(kB).distinct().orderBy(col("h")).limit(k)
    val marked = unionK
      .join(kA.select(col("h").as("_ha")), col("h") === col("_ha"), "left")
      .join(kB.select(col("h").as("_hb")), col("h") === col("_hb"), "left")
    val s = marked.agg(count(lit(1)).as("n_hashes"),
      max(col("h")).as("tau"),
      count(when(col("_ha").isNotNull && col("_hb").isNotNull, 1))
        .as("inter_in_k"))
    val estU = when(col("n_hashes") < k, col("n_hashes").cast("double"))
      .otherwise(lit((k - 1) * D) / col("tau"))
    val estI = when(col("n_hashes") < k, col("inter_in_k").cast("double"))
      .otherwise(col("inter_in_k").cast("double") / k * estU)
    val result = s.select(col("n_hashes"), col("inter_in_k"),
      Hashing.stableRound(estU, 4).as("est_union"),
      Hashing.stableRound(estI, 4).as("est_intersect"))
    // one-row result re-stages, both k-row sketches release — no
    // orphaned checkpoints per invocation (the Stats.chi2 pattern)
    val out = result.localCheckpoint(true)
    kA.unpersist(); kB.unpersist()
    out
  }

  /** Active (user, day) pairs that clicked vs purchased: sketch-estimated
    * union and intersection with the exact intersection beside them. */
  def qKmvIntersect(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    val key = concat(col("user_id").cast("string"), lit(":"),
      datediff(to_date(col("ts")), lit("1970-01-01")).cast("string"))
    val clicks = ev.filter(col("event_type") === "click" &&
      col("user_id").isNotNull && col("ts").isNotNull)
    val buys = ev.filter(col("event_type") === "purchase" &&
      col("user_id").isNotNull && col("ts").isNotNull)
    val exact = clicks.select(to_date(col("ts")).as("d"), col("user_id"))
      .intersect(buys.select(to_date(col("ts")).as("d"), col("user_id")))
      .agg(count(lit(1)).as("exact_intersect"))
    kmvIntersect(clicks, key, buys, key).crossJoin(exact)
  }

  val qKmvIntersectSql: String = {
    val key = "CAST(user_id AS VARCHAR) || ':' || " +
      "CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS VARCHAR)"
    val h = Hashing.md5LongSql(key)
    val k = 256
    s"""WITH ka AS MATERIALIZED (
       |  SELECT DISTINCT $h AS h FROM events
       |  WHERE event_type = 'click' AND user_id IS NOT NULL
       |    AND ts IS NOT NULL ORDER BY 1 LIMIT $k),
       |kb AS MATERIALIZED (
       |  SELECT DISTINCT $h AS h FROM events
       |  WHERE event_type = 'purchase' AND user_id IS NOT NULL
       |    AND ts IS NOT NULL ORDER BY 1 LIMIT $k),
       |u AS MATERIALIZED (
       |  SELECT h FROM (SELECT h FROM ka UNION SELECT h FROM kb)
       |  ORDER BY h LIMIT $k),
       |s AS (SELECT count(*) AS n_hashes, max(h) AS tau,
       |             count(CASE WHEN h IN (SELECT h FROM ka)
       |                         AND h IN (SELECT h FROM kb) THEN 1 END)
       |               AS inter_in_k
       |      FROM u)
       |SELECT n_hashes, inter_in_k,
       |       ${Hashing.stableRoundSql(
        s"CASE WHEN n_hashes < $k THEN CAST(n_hashes AS DOUBLE) " +
          s"ELSE (${k - 1} * 1152921504606846976.0) / tau END", 4)}
       |         AS est_union,
       |       ${Hashing.stableRoundSql(
        s"CASE WHEN n_hashes < $k THEN CAST(inter_in_k AS DOUBLE) " +
          s"ELSE CAST(inter_in_k AS DOUBLE) / $k * " +
          s"(CASE WHEN n_hashes < $k THEN CAST(n_hashes AS DOUBLE) " +
          s"ELSE (${k - 1} * 1152921504606846976.0) / tau END) END", 4)}
       |         AS est_intersect,
       |       (SELECT count(*) FROM
       |          (SELECT DISTINCT CAST(ts AS DATE), user_id FROM events
       |           WHERE event_type = 'click' AND user_id IS NOT NULL
       |             AND ts IS NOT NULL
       |           INTERSECT
       |           SELECT DISTINCT CAST(ts AS DATE), user_id FROM events
       |           WHERE event_type = 'purchase' AND user_id IS NOT NULL
       |             AND ts IS NOT NULL)) AS exact_intersect
       |FROM s""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q24_kmv_sketch" -> (qKmv _),
    "kmv_intersect" -> (qKmvIntersect _),
    "freq_cms" -> (qCms _),
    "card_hll" -> (qHll _),
    "hll_grouped" -> (qHllGrouped _),
    "hll_sliding" -> (qHllSliding _),
    "q40_join_size" -> (qJoinSize _))

  val oracleSql: Map[String, String] = Map(
    "q24_kmv_sketch" -> qKmvSql,
    "kmv_intersect" -> qKmvIntersectSql,
    "freq_cms" -> qCmsSql,
    "card_hll" -> qHllSql,
    "hll_grouped" -> qHllGroupedSql,
    "hll_sliding" -> qHllSlidingSql,
    "q40_join_size" -> qJoinSizeSql)
}
