package graft.core

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.file.{Files, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.util.sketch.BloomFilter

/** Per-FILE Bloom-filter sidecars for point-lookup data skipping on
  * columns the physical layout does NOT cluster — the complement of
  * [[ZoneMaps]]: zones prune by range and need the layout sorted or
  * partitioned by the predicate column; a GDPR lookup
  * (`user_id = X` over a DATE-partitioned table) hits every zone range
  * and scans everything. A Bloom filter per (file, column) answers
  * "definitely absent" for equality/IN probes regardless of layout —
  * the Delta/Iceberg bloom-index pattern.
  *
  * Soundness: Bloom filters produce FALSE POSITIVES only, so a "might
  * contain" keeps the file (scan — correct) and "definitely absent"
  * drops it (provably no matching row). Deletion-vector masks leave
  * masked rows in the filter — false-positive direction, still sound.
  * The sidecar covers EVERY file of its entry or is refused at read
  * (the zone-sidecar completeness rule: a partial index would silently
  * hide uncovered files from pruned reads — [[Warehouse]] intersects
  * bloom verdicts with zone verdicts per file).
  *
  * Supported probe shapes: `EqualTo`/`EqualNullSafe(attr, literal)`,
  * all-literal `In`/`InSet`, composed through And/Or. Supported column
  * types: integral (probed as long) and string — the id shapes point
  * lookups actually use; anything else never prunes. */
object BloomIndex {

  private val Magic = 0x42463133 // "BF13"

  /** column → (valueType "long"|"string", fileName → filter) */
  final case class EntryBlooms(cols: Map[String, (String, Map[String, BloomFilter])])

  def bloomPath(tableDir: Path, entryPath: String): Path =
    // ZoneMaps.sidecarName: INJECTIVE — see its scaladoc for why a lossy
    // flattening is a correctness (not hygiene) bug for sidecars
    tableDir.resolve("_stats").resolve(
      ZoneMaps.sidecarName(entryPath) + ".bloom")

  def write(tableDir: Path, entryPath: String, blooms: EntryBlooms): Unit = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(Magic)
    out.writeInt(blooms.cols.size)
    blooms.cols.toSeq.sortBy(_._1).foreach { case (c, (typ, files)) =>
      out.writeUTF(c)
      out.writeUTF(typ)
      out.writeInt(files.size)
      files.toSeq.sortBy(_._1).foreach { case (f, bf) =>
        out.writeUTF(f)
        val b = new ByteArrayOutputStream()
        bf.writeTo(b)
        out.writeInt(b.size())
        out.write(b.toByteArray)
      }
    }
    out.flush()
    val p = bloomPath(tableDir, entryPath)
    Files.createDirectories(p.getParent)
    Files.write(p, bos.toByteArray)
    if (cache.size < MaxCached) cache.put(p, blooms) else cache.remove(p)
  }

  /** Process-wide sidecar cache (the ZoneMaps.cache twin, same
    * soundness argument — any bloom built from the immutable fragment
    * is a valid may-contain filter, so even a cross-process re-analyze
    * can only change pruning POWER, never correctness). The SQL read
    * path probes blooms at plan time; a thousand-fragment table must
    * not pay a thousand file opens per statement. */
  private val cache = new java.util.concurrent.ConcurrentHashMap[Path, EntryBlooms]()
  private val MaxCached = 16384

  /** Drop a deleted sidecar from the cache (ZoneMaps.vacuumStats owns
    * the sweep over both sidecar kinds). */
  private[core] def invalidate(p: Path): Unit = { cache.remove(p); () }

  def read(tableDir: Path, entryPath: String): Option[EntryBlooms] = {
    val p = bloomPath(tableDir, entryPath)
    val hit = cache.get(p)
    // stat-on-hit: out-of-band deletion keeps reading as "no filter"
    // (see ZoneMaps.read — the deserialization is what's saved)
    if (hit != null) {
      if (Files.exists(p)) return Some(hit)
      cache.remove(p)
      return None
    }
    if (!Files.exists(p)) return None
    try {
      val in = new DataInputStream(new ByteArrayInputStream(Files.readAllBytes(p)))
      require(in.readInt() == Magic, "bad bloom sidecar magic")
      val nCols = in.readInt()
      val cols = (0 until nCols).map { _ =>
        val c = in.readUTF()
        val typ = in.readUTF()
        val nFiles = in.readInt()
        val files = (0 until nFiles).map { _ =>
          val f = in.readUTF()
          val len = in.readInt()
          val bytes = new Array[Byte](len)
          in.readFully(bytes)
          f -> BloomFilter.readFrom(new ByteArrayInputStream(bytes))
        }.toMap
        c -> (typ, files)
      }.toMap
      val eb = EntryBlooms(cols)
      if (cache.size < MaxCached) cache.put(p, eb)
      Some(eb)
    } catch { case _: Exception => None } // corrupt sidecar = no pruning
  }

  /** Build per-file filters for `cols` over one entry's files. `df` must
    * be the entry's BARE per-file read; files are tagged inside. Returns
    * None when a column's type is unsupported everywhere or the data
    * frame is missing the column (caller records nothing — absence
    * never lies). One distributed pass; filters merge per file across
    * partitions (same capacity per file, so merges are compatible). */
  def build(df: DataFrame, cols: Seq[String],
            expectedPerFile: Long, fpp: Double): EntryBlooms = {
    val present = df.columns.toSet
    val typed: Seq[(String, String)] = cols.filter(present).flatMap { c =>
      df.schema(c).dataType match {
        case org.apache.spark.sql.types.LongType |
             org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.ShortType |
             org.apache.spark.sql.types.ByteType => Some(c -> "long")
        case org.apache.spark.sql.types.StringType => Some(c -> "string")
        case _ => None
      }
    }
    if (typed.isEmpty) return EntryBlooms(Map.empty)
    val n = math.max(64L, expectedPerFile)
    val tagged = df.select(
      element_at(split(col("_metadata.file_path"), "/"), -1).as("_bf_file") +:
        typed.map { case (c, t) =>
          if (t == "long") col(c).cast("long").as(c) else col(c).cast("string").as(c)
        }: _*)
    val colIdx = typed.map(_._1).zipWithIndex.toMap
    val merged: Map[(String, String), BloomFilter] = tagged.rdd.mapPartitions { it =>
      val local = scala.collection.mutable.HashMap[(String, String), BloomFilter]()
      it.foreach { row =>
        val f = row.getString(0)
        typed.foreach { case (c, t) =>
          val i = colIdx(c) + 1
          // the filter is created for every (file, col) SEEN even when
          // the value is null: an all-null file must still be covered
          // (absent-from-map reads as "not covered, keep"), and an
          // empty filter correctly answers "definitely absent"
          val bf = local.getOrElseUpdate((f, c), BloomFilter.create(n, fpp))
          if (!row.isNullAt(i)) {
            if (t == "long") bf.putLong(row.getLong(i))
            else bf.putString(row.getString(i))
          }
        }
      }
      Iterator.single(local.toMap)
    }.reduce { (a, b) =>
      val out = scala.collection.mutable.HashMap[(String, String), BloomFilter]() ++ a
      b.foreach { case (k, bf) =>
        out.get(k) match {
          case Some(existing) => existing.mergeInPlace(bf)
          case None => out(k) = bf
        }
      }
      out.toMap
    }
    EntryBlooms(typed.map { case (c, t) =>
      c -> (t, merged.collect { case ((f, `c`), bf) => f -> bf }.toMap)
    }.toMap)
  }

  // --------------------------------------------------------------- pruning

  private object Attr {
    def unapply(e: Expression): Option[String] = e match {
      case a: AttributeReference => Some(a.name)
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute => Some(u.name)
      case _ => None
    }
  }

  private object Lit {
    def unapply(e: Expression): Option[Any] = e match {
      case Literal(v, _) => Some(v)
      case _ if e.foldable && e.deterministic =>
        try Some(e.eval(null)) catch { case _: Exception => None }
      case _ => None
    }
  }

  private def probe(bf: BloomFilter, typ: String, v: Any): Boolean = v match {
    case null => true // equality with NULL is never TRUE, but range rules own that
    case l: java.lang.Long if typ == "long" => bf.mightContainLong(l)
    case i: java.lang.Integer if typ == "long" => bf.mightContainLong(i.longValue)
    case s: java.lang.Short if typ == "long" => bf.mightContainLong(s.longValue)
    case b: java.lang.Byte if typ == "long" => bf.mightContainLong(b.longValue)
    case u: org.apache.spark.unsafe.types.UTF8String if typ == "string" =>
      bf.mightContainString(u.toString)
    case s: String if typ == "string" => bf.mightContainString(s)
    case _ => true // type mismatch: never prune
  }

  /** Conservative "file `f` may contain a row satisfying `pred`" under
    * this entry's filters — composes with the zone verdict by AND. */
  def mayMatchFile(pred: Expression, blooms: EntryBlooms, f: String): Boolean =
    pred match {
      case And(l, r) => mayMatchFile(l, blooms, f) && mayMatchFile(r, blooms, f)
      case Or(l, r) => mayMatchFile(l, blooms, f) || mayMatchFile(r, blooms, f)
      case EqualTo(Attr(c), Lit(v)) => probeCol(blooms, c, f, v)
      case EqualTo(Lit(v), Attr(c)) => probeCol(blooms, c, f, v)
      case EqualNullSafe(Attr(c), Lit(v)) if v != null => probeCol(blooms, c, f, v)
      case EqualNullSafe(Lit(v), Attr(c)) if v != null => probeCol(blooms, c, f, v)
      case In(Attr(c), vs) =>
        val lits = vs.map(Lit.unapply)
        if (lits.exists(_.isEmpty)) true
        else lits.flatten.exists(v => probeCol(blooms, c, f, v))
      case InSet(Attr(c), vs) => vs.exists(v => probeCol(blooms, c, f, v))
      case _ => true
    }

  /** Re-key an entry's filters from PHYSICAL column names (the names
    * at build time) to CURRENT names — the Bloom twin of
    * [[ZoneMaps.rekey]], with the same ambiguity rule: two physical
    * columns landing on one current name drop the filter (a probe
    * against the wrong column's filter could skip a real match). */
  def rekey(blooms: EntryBlooms, rm: Map[String, String]): EntryBlooms =
    if (rm.isEmpty) blooms
    else EntryBlooms(blooms.cols.toSeq
      .groupBy { case (p, _) => rm.getOrElse(p, p) }
      .collect { case (n, Seq((_, cf))) => n -> cf }
      .toMap)

  private def probeCol(blooms: EntryBlooms, c: String, f: String, v: Any): Boolean =
    blooms.cols.get(c) match {
      case Some((typ, files)) => files.get(f) match {
        case Some(bf) => probe(bf, typ, v)
        case None => true // file not covered (callers refuse partial sidecars)
      }
      case None => true
    }
}
