package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.BloomMightContain
import graft.llmops.Hashing

/** Bloom-filter-accelerated semi-join — the shuffle killer for
  * "keep fact rows whose key exists in a dim subset" at 100 TB: instead
  * of shuffling the full fact table into a sort-merge semi-join, build a
  * Bloom filter over the (small) dim keys DISTRIBUTEDLY, broadcast the
  * bitmap (kilobytes–megabytes), and discard non-matching fact rows
  * map-side inside whole-stage codegen. Only the surviving sliver pays
  * the exact semi-join that removes Bloom false positives — so the
  * result is EXACT (a Bloom filter has no false negatives; the oracle's
  * plain `IN` subquery hash-checks that property end to end).
  *
  *  - Build: dim keys → md5 double hashing (`h1 + j·h2 floorMod m`,
  *    j < k) → explode positions → one vocab-sized groupBy(word) with
  *    `bit_or` — fully distributed, one small shuffle.
  *  - Bitmap: m/64 longs collected to the driver (guarded ≤ [[MaxBits]],
  *    16 MiB) and re-broadcast inside a [[BloomMightContain]] codegen
  *    expression.
  *  - Probe: narrow codegen'd filter, no shuffle of the fact table.
  *  - Verify: broadcast semi-join of the survivors against the dim keys.
  *
  * Spark's own runtime row-filtering covers some of this shape when
  * statistics line up; this operator makes it explicit, deterministic,
  * and available on any boolean-expressible key.
  */
object BloomJoin {

  /** Bitmap cap: 2^27 bits = 16 MiB of longs on the driver/broadcast. */
  val MaxBits: Int = 1 << 27

  /** Default sizing for the query below. */
  val DefaultBits: Int = 1 << 20
  val DefaultK: Int = 4

  private val md5 = ThreadLocal.withInitial(
    () => java.security.MessageDigest.getInstance("MD5"))

  /** Probe-side membership check (called from generated code; one static
    * call per row). Hashing matches the SQL build side exactly:
    * md5 → first/second 60 bits → `(h1 + j·h2) floorMod m`. With h1, h2
    * < 2^60 and j ≤ 7 (k capped at 8), `h1 + j·h2 ≤ 2^63 - 8` — no Long
    * overflow on either side, so floorMod here and `pmod` in the SQL
    * build agree exactly (and ANSI mode never trips). */
  def contains(bits: Array[Long], mBits: Int, k: Int, key: String): Boolean = {
    val md = md5.get()
    val d = md.digest(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 15 hex chars = 60 bits; next 15 hex chars = 60 bits
    var h1 = 0L
    var i = 0
    while (i < 7) { h1 = (h1 << 8) | (d(i) & 0xffL); i += 1 }
    h1 = (h1 << 4) | ((d(7) & 0xf0L) >>> 4)
    var h2 = (d(7) & 0x0fL)
    i = 8
    while (i < 15) { h2 = (h2 << 8) | (d(i) & 0xffL); i += 1 }
    var j = 0
    while (j < k) {
      val pos = java.lang.Math.floorMod(h1 + j * h2, mBits.toLong).toInt
      if ((bits(pos >>> 6) & (1L << (pos & 63))) == 0L) return false
      j += 1
    }
    true
  }

  /** Distributed build: bitmap words of the dim-key Bloom filter. */
  private[graft] def buildBits(dim: DataFrame, dimKey: String,
                               mBits: Int, k: Int): Array[Long] = {
    val keyed = dim.select(
      Hashing.md5Long(col(dimKey).cast("string")).as("h1"),
      Hashing.md5LongHi(col(dimKey).cast("string")).as("h2"))
    val words = keyed
      .select(explode(sequence(lit(0L), lit(k - 1L))).as("j"),
        col("h1"), col("h2"))
      .select(pmod(col("h1") + col("j") * col("h2"), lit(mBits.toLong))
        .cast("int").as("pos"))
      .select((col("pos") / 64).cast("int").as("w"),
        expr("shiftleft(1L, pos % 64)").as("bit"))
      .groupBy(col("w")).agg(expr("bit_or(bit)").as("bits"))
      .collect()
    val arr = new Array[Long](mBits / 64)
    words.foreach(r => arr(r.getInt(0)) = r.getLong(1))
    arr
  }

  /** Exact semi-join of `fact` against `dim`'s `dimKey`, Bloom-pruned
    * map-side before the verify join. Keys are compared through their
    * canonical string form (`cast as string`) on both build and probe. */
  def bloomSemiJoin(fact: DataFrame, factKey: String,
                    dim: DataFrame, dimKey: String,
                    mBits: Int = DefaultBits, k: Int = DefaultK): DataFrame = {
    require(mBits >= 64 && mBits % 64 == 0 && mBits <= MaxBits,
      s"mBits must be a multiple of 64 in [64, $MaxBits], got $mBits " +
        "(the bitmap is collected to the driver and broadcast)")
    require(k >= 1 && k <= 8,
      s"k must be in [1, 8], got $k (j*h2 must stay within Long range)")
    val bits = buildBits(dim, dimKey, mBits, k)
    import org.apache.spark.sql.GraftBridge
    val probe = GraftBridge.column(BloomMightContain(
      GraftBridge.expression(col(factKey).cast("string")), bits, mBits, k))
    fact.filter(probe)
      .join(broadcast(dim.select(col(dimKey).as(factKey)).distinct()),
        Seq(factKey), "left_semi")
  }

  // ----------------------------------------------------------------- query

  /** Lineitem rows whose part is size-1 (38 of 2000 parts at sf0.01):
    * the selective-dim shape where Bloom pruning pays. */
  def qBloomJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    val dim = Tables.load(spark, dir, "part").filter(col("p_size") === 1)
    bloomSemiJoin(li, "l_partkey", dim, "p_partkey")
      .select(col("l_orderkey"), col("l_partkey"), col("l_linenumber"),
        col("l_quantity"))
  }

  /** The oracle is the PLAIN semi-join — any Bloom false negative (a
    * dropped matching row) breaks the hash match. */
  val qBloomJoinSql: String =
    """SELECT l_orderkey, l_partkey, l_linenumber, l_quantity
      |FROM lineitem
      |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size = 1)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q25_bloom_join" -> (qBloomJoin _))

  val oracleSql: Map[String, String] = Map(
    "q25_bloom_join" -> qBloomJoinSql)
}
