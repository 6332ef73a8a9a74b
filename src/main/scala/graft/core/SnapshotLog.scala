package graft.core

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Minimal per-table commit log giving Parquet tables Delta-style
  * versioned snapshots — the mechanism behind BigQuery-decorator-style
  * time travel (`table@epoch_ms`, dbtwiz/integrations/bigquery.py:439)
  * and restore-of-deleted (dbtwiz/admin/restore.py:131-141), which pure
  * catalog state cannot answer: the log outlives the table.
  *
  * Layout under the table directory:
  * {{{
  *   _data/<uuid>/            immutable parquet fragments (one per write)
  *   _log/v00001.manifest     one commit per version
  * }}}
  *
  * A commit manifest lists `(partitionValue, dataDir)` entries — the full
  * state of the table at that version. Incremental (insert_overwrite)
  * commits reuse the previous version's untouched entries and swap only
  * the overwritten partitions, so a commit costs O(changed partitions),
  * never a table rewrite — the property that matters at 100 TB. Data
  * fragments are immutable; [[vacuum]] deletes fragments unreferenced by
  * any commit within the retention window (7 days in the reference).
  *
  * Commit atomicity: the manifest file write (create-new, fail if exists)
  * is the commit point — concurrent writers race on the version number.
  * State-independent commits ([[commit]]) retry at the next version
  * (last-writer-wins); state-dependent ones ([[commitWith]]) re-read the
  * winner's state and recompute before retrying, so no commit is lost.
  */
final class SnapshotLog(tableDir: Path) {

  private val logDir = tableDir.resolve("_log")
  private val dataDir = tableDir.resolve("_data")

  import SnapshotLog.{Commit, Entry, LatestPointer}

  def exists: Boolean = Files.isDirectory(logDir)

  /** Allocate a fresh immutable fragment dir for a writer to fill. */
  def newFragmentDir(): Path = {
    Files.createDirectories(dataDir)
    dataDir.resolve(java.util.UUID.randomUUID().toString.take(8))
  }

  def commits: Seq[Commit] =
    if (!exists) Seq.empty
    else Files.list(logDir).iterator().asScala.toSeq
      .filter(_.getFileName.toString.endsWith(".manifest"))
      .sortBy(_.getFileName.toString)
      .map(readManifest)

  private def manifestPath(v: Int): Path = logDir.resolve(f"v$v%05d.manifest")

  /** Latest commit in O(1) manifest reads: the `_latest` pointer file
    * (written best-effort after each commit — NOT the commit point) names
    * a version known to exist; probing forward from it covers writers
    * that crashed between manifest and pointer writes or lost a pointer
    * race. Cost is 1 + (pointer staleness) reads instead of listing and
    * parsing every manifest — the difference between O(1) and O(9k file
    * reads per query) after a year of hourly commits. A missing or
    * corrupt pointer falls back to the full listing. */
  def latest: Option[Commit] = {
    if (!exists) return None
    val hinted = try {
      val s = new String(Files.readAllBytes(logDir.resolve(LatestPointer)),
        StandardCharsets.UTF_8).trim.toInt
      if (Files.exists(manifestPath(s))) Some(s) else None
    } catch { case _: Exception => None }
    hinted match {
      case None => commits.lastOption
      case Some(start) =>
        var v = start
        while (Files.exists(manifestPath(v + 1))) v += 1
        Some(readManifest(manifestPath(v)))
    }
  }

  /** A specific version in one manifest read (no log listing). */
  def version(v: Int): Option[Commit] = {
    val f = manifestPath(v)
    if (Files.exists(f)) Some(readManifest(f)) else None
  }

  /** Latest commit whose timestamp is <= tsMillis (time-travel read).
    * A filter, not takeWhile: version order need not be timestamp order
    * (caller-supplied tsMillis can interleave with wall-clock defaults).
    * Deliberately O(versions): tolerating non-monotonic commit
    * timestamps rules out binary search, and time-travel reads are rare
    * next to [[latest]]-path reads, which are pointer-O(1). */
  def asOf(tsMillis: Long): Option[Commit] =
    commits.filter(_.tsMillis <= tsMillis).lastOption

  /** Append a commit whose entries do NOT depend on prior state (full
    * replace / drop); a lost version race just retries at the next
    * version — last-writer-wins is the intended semantics. */
  def commit(action: String, entries: Seq[Entry],
             tsMillis: Long = System.currentTimeMillis(),
             schemaDdl: Option[String] = None): Commit =
    commitWith(action, _ => entries, tsMillis, schemaDdl)

  /** Optimistic-concurrency commit for state-dependent writes
    * (insert_overwrite's kept-partition list, TTL expiry): `compute`
    * derives the FULL table state from the current latest commit. On a
    * lost race the log is re-read and `compute` re-runs against the
    * winner's state — a Delta-style re-base — so a losing writer merges
    * with, rather than silently overwrites, the winning commit.
    *
    * `schemaDdl` pins the table schema AT THIS COMMIT (the union of every
    * referenced fragment's columns): readers pad old fragments to it, so
    * additive evolution is a metadata change, never a data rewrite, and
    * time-travel reads serve the schema as of the commit they read.
    * `None` carries the previous commit's schema forward (expiry, drop). */
  def commitWith(action: String, compute: Option[Commit] => Seq[Entry],
                 tsMillis: Long = System.currentTimeMillis(),
                 schemaDdl: Option[String] = None): Commit =
    commitWithSchema(action, compute,
      cur => schemaDdl.orElse(cur.flatMap(_.schemaDdl)), tsMillis)

  /** [[commitWith]] variant whose pinned schema is RECOMPUTED from the
    * current commit on every CAS attempt — required for additive
    * evolution under concurrency: a schema unioned against a stale base
    * and then committed after a lost race would silently drop the
    * winning writer's new columns from every subsequent read. */
  def commitWithSchema(action: String, compute: Option[Commit] => Seq[Entry],
                       schemaWith: Option[Commit] => Option[String],
                       tsMillis: Long = System.currentTimeMillis()): Commit = {
    Files.createDirectories(logDir)
    var done: Option[Commit] = None
    while (done.isEmpty) {
      val cur = latest
      val v = cur.map(_.version).getOrElse(0) + 1
      val c = Commit(v, tsMillis, action, compute(cur),
        schemaWith(cur).orElse(cur.flatMap(_.schemaDdl)))
      val f = logDir.resolve(f"v$v%05d.manifest")
      try {
        Files.write(f, render(c).getBytes(StandardCharsets.UTF_8),
          java.nio.file.StandardOpenOption.CREATE_NEW)
        done = Some(c)
        advancePointer(v)
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => () // lost race: re-base
      }
    }
    done.get
  }

  /** Best-effort `_latest` advance (atomic rename; never moves backwards
    * past a concurrent winner thanks to [[latest]]'s forward probe — a
    * stale pointer only costs extra probe reads, never correctness). */
  private def advancePointer(v: Int): Unit =
    try {
      val tmp = logDir.resolve(s"$LatestPointer.${java.util.UUID.randomUUID().toString.take(8)}")
      Files.write(tmp, v.toString.getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, logDir.resolve(LatestPointer),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    } catch { case _: Exception => () }

  /** Paths (absolute) making up a commit's table state. */
  def dataPaths(c: Commit): Seq[String] =
    c.entries.map(e => tableDir.resolve(e.path).toString)

  /** Delete fragments referenced ONLY by commits older than the retention
    * window, and their manifests — keeping at least the latest commit.
    * Returns removed fragment paths. */
  def vacuum(retainMillis: Long,
             nowMillis: Long = System.currentTimeMillis()): Seq[String] = {
    val all = commits
    if (all.isEmpty) return Seq.empty
    val cutoff = nowMillis - retainMillis
    val (expired, live) = all.splitAt(
      math.min(all.count(_.tsMillis < cutoff), all.size - 1))
    val liveRefs = live.flatMap(_.entries.map(_.path)).toSet
    val removable = expired.flatMap(_.entries.map(_.path)).distinct
      .filterNot(liveRefs)
    removable.foreach { rel =>
      deleteRecursive(tableDir.resolve(rel))
    }
    expired.foreach(c => Files.deleteIfExists(logDir.resolve(f"v${c.version}%05d.manifest")))
    removable.map(rel => tableDir.resolve(rel).toString)
  }

  private def render(c: Commit): String = {
    val sb = new StringBuilder
    sb.append(s"#version=${c.version}\n#ts=${c.tsMillis}\n#action=${c.action}\n")
    c.schemaDdl.foreach(d => sb.append(s"#schema=${SnapshotLog.escape(d)}\n"))
    c.entries.foreach(e => sb.append(e.partition).append('\t').append(e.path).append('\n'))
    sb.toString
  }

  private def readManifest(f: Path): Commit = {
    val lines = Files.readAllLines(f, StandardCharsets.UTF_8).asScala.toSeq
    val header = lines.takeWhile(_.startsWith("#"))
      .map(_.drop(1).split("=", 2)).map(a => a(0) -> a(1)).toMap
    val entries = lines.dropWhile(_.startsWith("#")).filter(_.nonEmpty).map { l =>
      val i = l.indexOf('\t')
      Entry(l.substring(0, i), l.substring(i + 1))
    }
    Commit(header("version").toInt, header("ts").toLong,
      header.getOrElse("action", "write"), entries,
      header.get("schema").map(SnapshotLog.unescape))
  }

  private def deleteRecursive(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    }
}

object SnapshotLog {
  /** One table state entry: a partition value ("" for unpartitioned) → the
    * immutable parquet dir holding that partition's rows. */
  final case class Entry(partition: String, path: String)

  /** `schemaDdl`: the union schema of this commit's fragments (None on
    * manifests written before schema pinning — readers fall back to the
    * physical file schemas). */
  final case class Commit(version: Int, tsMillis: Long, action: String,
                          entries: Seq[Entry],
                          schemaDdl: Option[String] = None) {
    def isDrop: Boolean = action == "drop"
  }

  /** Single-line manifest-header encoding for a schema DDL (column
    * COMMENTs may carry newlines). */
  private[core] def escape(s: String): String =
    s.replace("\\", "\\\\").replace("\n", "\\n").replace("\r", "\\r")

  private[core] def unescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case c => sb.append(c); i += 2
        }
      } else { sb.append(s.charAt(i)); i += 1 }
    }
    sb.toString
  }

  /** Checkpoint file naming the newest known version (Delta's
    * `_last_checkpoint` analog). */
  val LatestPointer = "_latest"

  val TimeTravelWindowMillis: Long = 7L * 24 * 3600 * 1000 // restore.py:60-70
  def forTable(root: String, dataset: String, table: String): SnapshotLog =
    new SnapshotLog(Paths.get(root, dataset, table))
}
