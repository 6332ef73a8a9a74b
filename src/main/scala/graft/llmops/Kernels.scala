package graft.llmops

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.Locale

/** JVM-side per-partition kernels for the llmops hot paths.
  *
  * These replace interpreted Catalyst higher-order-function lambdas
  * (`aggregate(zip_with(...))`, `transform(sequence(...))`, per-language
  * `filter(...)`) with tight primitive loops run inside `mapPartitions`.
  * The numerics are bit-compatible with the SQL expressions they replace —
  * and therefore with the DuckDB oracles:
  *
  *  - [[md5Hex]]/[[md5Long]] produce exactly Spark `md5()` /
  *    `conv(substr(md5(s),1,15),16,10)` (md5 is bit-identical across
  *    engines; 15 hex chars = 60 bits, always fits a signed Long).
  *  - Every floating-point reduction folds left-to-right in double
  *    precision, the same order as Spark's `aggregate()` left fold, so
  *    doubles are bit-identical to the expressions they replace.
  *  - [[round4]] reproduces Spark's `round(x, 4)` (BigDecimal HALF_UP on
  *    the double's shortest decimal representation).
  *  - Tokenization is `text.split(" ", -1)` — the same "keep empty
  *    tokens" semantics as Spark `split(text, ' ')` and DuckDB
  *    `string_split(text, ' ')`.
  *
  * All kernels take an explicit [[MessageDigest]] so callers allocate one
  * instance per partition, not per row.
  */
object Kernels {

  def newMd5(): MessageDigest = MessageDigest.getInstance("MD5")

  private val HEX = "0123456789abcdef".toCharArray

  /** Lowercase hex md5 — bit-identical to Spark/DuckDB `md5(s)`. */
  def md5Hex(md: MessageDigest, s: String): String = {
    val d = md.digest(s.getBytes(StandardCharsets.UTF_8))
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < 16) {
      val b = d(i) & 0xff
      sb.append(HEX(b >>> 4)).append(HEX(b & 0xf))
      i += 1
    }
    sb.toString
  }

  /** First 60 bits of md5 as a non-negative Long —
    * `cast(conv(substr(md5(s),1,15),16,10) as bigint)` (Hashing.md5Long). */
  def md5Long(md: MessageDigest, s: String): Long = {
    val d = md.digest(s.getBytes(StandardCharsets.UTF_8))
    // First 15 hex chars = bytes 0..6 plus the high nibble of byte 7.
    var acc = 0L
    var i = 0
    while (i < 7) { acc = (acc << 8) | (d(i) & 0xffL); i += 1 }
    (acc << 4) | ((d(7) & 0xf0L) >>> 4)
  }

  /** Spark `round(x, 4)`: HALF_UP on the shortest decimal rep of x. */
  def round4(x: Double): Double =
    if (x.isNaN || x.isInfinite) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  /** `floor(x*1e4 + 0.5)/1e4` — the bit-stable rounding used by quality. */
  def floorRound4(x: Double): Double = math.floor(x * 10000.0 + 0.5) / 10000.0

  /** Spark `split(text, ' ')` (limit -1: trailing empties kept). */
  def splitSpace(text: String): Array[String] = text.split(" ", -1)

  // ------------------------------------------------------------------ simhash

  /** 60-bit count-weighted SimHash over space-split words (all occurrences,
    * empties included) — same bits as the 60 `sum(case ...)` aggregates. */
  def simhash(md: MessageDigest, text: String): Long = {
    val counts = new Array[Int](60)
    val words = splitSpace(text)
    var wi = 0
    while (wi < words.length) {
      val h = md5Long(md, words(wi))
      var j = 0
      while (j < 60) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      wi += 1
    }
    var fp = 0L
    var j = 0
    while (j < 60) { if (counts(j) > 0) fp |= (1L << j); j += 1 }
    fp
  }

  // ----------------------------------------------------------------- shingles

  /** Distinct word-3-gram shingles of a doc, as sorted 60-bit hashes.
    * Empty when the doc has fewer than 3 space-split tokens. Distinctness
    * is on the shingle STRING (then hashed) — identical to
    * `SELECT DISTINCT doc_id, s` followed by md5Long in both engines. */
  def distinctShingleHashes(md: MessageDigest, text: String): Array[Long] = {
    val w = splitSpace(text)
    if (w.length < 3) return Array.emptyLongArray
    val seen = new java.util.HashSet[String]((w.length - 2) * 2)
    val out = new java.util.ArrayList[Long](w.length - 2)
    var i = 0
    while (i + 2 < w.length) {
      val s = new java.lang.StringBuilder(
        w(i).length + w(i + 1).length + w(i + 2).length + 2)
        .append(w(i)).append(' ').append(w(i + 1)).append(' ').append(w(i + 2))
        .toString
      if (seen.add(s)) out.add(md5Long(md, s))
      i += 1
    }
    val arr = new Array[Long](out.size)
    var k = 0
    while (k < arr.length) { arr(k) = out.get(k); k += 1 }
    java.util.Arrays.sort(arr)
    arr
  }

  /** MinHash signature over a doc's shingle hashes: for each seed j,
    * min over shingles of (a_j * (h % P) + b_j) % P. Integer math only. */
  def minhashSig(hashes: Array[Long], a: Array[Long], b: Array[Long], p: Long): Array[Long] = {
    val n = a.length
    val sig = new Array[Long](n)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < hashes.length) {
      val x = hashes(i) % p
      var j = 0
      while (j < n) {
        val v = (a(j) * x + b(j)) % p
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    sig
  }

  /** Size of the intersection of two sorted long arrays (merge scan). */
  def sortedIntersectionSize(xs: Array[Long], ys: Array[Long]): Int = {
    var i = 0; var j = 0; var n = 0
    while (i < xs.length && j < ys.length) {
      val c = java.lang.Long.compare(xs(i), ys(j))
      if (c == 0) { n += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    n
  }

  // ------------------------------------------------------------ fingerprints

  /** `lower(regexp_replace(text, "\\s+", " "))` — replace FIRST, then
    * lowercase, matching the Spark/DuckDB expression order. */
  def normalizeWs(text: String): String =
    text.replaceAll("\\s+", " ").toLowerCase(Locale.ROOT)

  /** Winnowing fingerprint: min md5Long over all 8-char substrings of the
    * normalized text (`substring(norm, i, 8)` for i in 1..max(len-7, 1) —
    * shorter tail substrings appear only when len < 8, as in SQL). */
  def winnowFingerprint(md: MessageDigest, norm: String): Long = {
    val len = norm.length
    val last = math.max(len - 7, 1)
    var best = Long.MaxValue
    var i = 1
    while (i <= last) {
      val h = md5Long(md, norm.substring(i - 1, math.min(i + 7, len)))
      if (h < best) best = h
      i += 1
    }
    best
  }

  // ------------------------------------------------------------- embeddings

  /** Left-to-right dot product — Spark
    * `aggregate(zip_with(a, b, x*y), 0.0d, acc+p)` fold order. */
  def dot(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }

  /** sqrt of the left-to-right self dot product. */
  def norm(v: Array[Double]): Double = math.sqrt(dot(v, v))

  /** IVF coarse assignment: id of the centroid maximizing
    * dot(v,c)/(nrm·cnrm), ties to the smallest centroid id. `cents` must
    * be sorted by id ascending — iterating in id order with a strict `>`
    * keeps the first (smallest-id) maximum, matching the oracle's
    * `ORDER BY cos DESC, cid` row_number tie-break. The cosine is the
    * same op sequence as the SQL (`dot / (nrm * cnrm)`), so assignments
    * are bit-identical across engines. */
  def assignCentroid(v: Array[Double], nrm: Double,
                     cents: Array[(Long, Array[Double], Double)]): Long = {
    var best = Double.NegativeInfinity
    var bestId = -1L
    var i = 0
    while (i < cents.length) {
      val c = cents(i)
      val cos = dot(v, c._2) / (nrm * c._3)
      if (cos > best) { best = cos; bestId = c._1 }
      i += 1
    }
    bestId
  }

  /** Sign-LSH signature: bit j set iff the left-to-right fold of
    * v(i) * signs(j)(i) is > 0. Signs are ±1.0 so every product is exact
    * and the fold matches `aggregate(zip_with(v, weights, x*y), ...)`
    * bit-for-bit. */
  def lshSignature(v: Array[Double], signs: Array[Array[Double]]): Long = {
    var sig = 0L
    var j = 0
    while (j < signs.length) {
      val w = signs(j)
      var acc = 0.0
      var i = 0
      while (i < v.length) { acc += v(i) * w(i); i += 1 }
      if (acc > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}
