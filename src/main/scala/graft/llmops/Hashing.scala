package graft.llmops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, cross-engine hashing primitives.
  *
  * Everything here must be computable identically in Spark and DuckDB so
  * that the dedup/similarity pipelines are oracle-checkable end to end:
  * the shared 60-bit hash is `int(md5(s)[0:15], 16)` (md5 is bit-identical
  * across engines; 15 hex chars = 60 bits, always fits a signed Long).
  *
  * MinHash seed pairs and hyperplane signs are generated from a fixed
  * splitmix64-style sequence so the SAME constants are embedded in both the
  * Spark Column expressions and the generated oracle SQL.
  */
object Hashing {

  /** Mersenne prime 2^31-1: minhash modulus. With x reduced mod P first,
    * a*x+b stays < 2^62 (no Long overflow) in both engines. */
  val P: Long = 2147483647L

  /** 60-bit hash of a string column; identical in DuckDB via
    * `('0x' || substr(md5(s),1,15))::BIGINT`. Served by the native
    * [[graft.functions.Md5Long60]] expression — bit-identical to
    * `conv(substring(md5(c), 1, 15), 16, 10)` (every oracle hash gate
    * re-proves it) without rendering and re-parsing the hex string. */
  def md5Long(c: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(graft.functions.Md5Long60(
      GraftBridge.expression(c), hi = false))
  }

  /** DuckDB SQL fragment for [[md5Long]]. */
  def md5LongSql(expr: String): String =
    s"('0x' || substr(md5($expr), 1, 15))::BIGINT"

  /** The md5 digest's SECOND 60 bits (hex chars 16-30) — an independent
    * companion hash from the same single digest, for double-hashing
    * schemes (h_d = h1 + d·h2) that need two hashes without paying for
    * two md5 evaluations. Identical in DuckDB via [[md5LongHiSql]]. */
  def md5LongHi(c: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(graft.functions.Md5Long60(
      GraftBridge.expression(c), hi = true))
  }

  /** DuckDB SQL fragment for [[md5LongHi]]. */
  def md5LongHiSql(expr: String): String =
    s"('0x' || substr(md5($expr), 16, 15))::BIGINT"

  /** Cross-engine-stable rounding: `floor(x·10^scale + 0.5)/10^scale` is
    * the same IEEE op sequence in Spark and DuckDB, so the output double
    * is bit-identical — Spark's `round()` detours through BigDecimal
    * (shortest decimal repr, HALF_UP) while DuckDB rounds from the exact
    * binary value, and the two disagree on `.xx5` boundaries. Every
    * oracle-compared double should round through THIS (and its SQL twin
    * [[stableRoundSql]]), never through `round()` on both sides. */
  def stableRound(c: Column, scale: Int): Column = {
    val f = math.pow(10.0, scale)
    floor(c * lit(f) + lit(0.5)) / lit(f)
  }

  /** DuckDB fragment for [[stableRound]]. */
  def stableRoundSql(expr: String, scale: Int): String = {
    val f = math.pow(10.0, scale)
    s"floor(($expr) * $f + 0.5) / $f"
  }

  /** Deterministic pseudo-random Long stream (splitmix64). */
  def splitmix(seed: Long): Iterator[Long] = {
    var s = seed
    Iterator.continually {
      s += 0x9e3779b97f4a7c15L
      var z = s
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
  }

  /** nHashes (a, b) minhash seed pairs with 1 <= a < P, 0 <= b < P. */
  def minhashSeeds(n: Int, seed: Long = 42L): IndexedSeq[(Long, Long)] = {
    val it = splitmix(seed)
    (0 until n).map { _ =>
      val a = java.lang.Long.remainderUnsigned(it.next(), P - 1) + 1
      val b = java.lang.Long.remainderUnsigned(it.next(), P)
      (a, b)
    }
  }

  /** dim × nPlanes matrix of ±1 hyperplane components (sign LSH). */
  def hyperplaneSigns(nPlanes: Int, dim: Int, seed: Long = 7L): IndexedSeq[IndexedSeq[Int]] = {
    val it = splitmix(seed)
    IndexedSeq.fill(nPlanes)(IndexedSeq.fill(dim)(if ((it.next() & 1L) == 0L) 1 else -1))
  }
}
