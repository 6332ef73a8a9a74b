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
  * Manifests come in two forms (the Delta checkpoint + JSON-tail
  * design): a CHECKPOINT manifest lists the full `(partitionValue,
  * dataDir)` state, a DELTA manifest lists only `+`/`-` lines against
  * its parent version. Every [[CheckpointInterval]]-th version (and
  * v1) checkpoints; the versions between write O(changed partitions)
  * bytes — without this, a 10k-fragment table would rewrite a
  * 10k-line manifest on EVERY commit, making commit IO O(table), the
  * exact cost this log exists to avoid at 100 TB. Resolving any
  * version replays at most CheckpointInterval−1 small deltas from the
  * nearest checkpoint, so version reads stay O(1) manifests + O(K)
  * tail. Pre-checkpoint manifests (no `#delta` header) read as
  * checkpoints — the format is backward-compatible. Data fragments are
  * immutable; [[vacuum]] deletes fragments unreferenced by any commit
  * within the retention window (7 days in the reference) and
  * re-checkpoints the oldest surviving manifest first when it is a
  * delta (its ancestry is about to disappear).
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

  /** Allocate a fresh immutable fragment dir for a writer to fill.
    * FULL UUID (122 random bits), never a truncation: fragment names
    * must be collision-free across every writer over the table's whole
    * lifetime — at a 32-bit prefix a hot append table reaches 50%
    * birthday-collision odds around 65k fragments, and a colliding
    * writer's `mode("overwrite")` lands INSIDE a live fragment dir,
    * silently corrupting committed data. */
  def newFragmentDir(): Path = {
    Files.createDirectories(dataDir)
    dataDir.resolve(java.util.UUID.randomUUID().toString)
  }

  /** All commits, resolved to full states in ONE ascending replay:
    * checkpoints reset the state, deltas fold into it — total cost
    * O(total changed entries), never versions × fragments. */
  def commits: Seq[Commit] = {
    if (!exists) return Seq.empty
    val files = Files.list(logDir).iterator().asScala.toSeq
      .filter(_.getFileName.toString.endsWith(".manifest"))
      .sortBy(_.getFileName.toString)
    val resolved = scala.collection.mutable.Map.empty[Int, Commit]
    files.map { f =>
      val c = readManifest(f) match {
        case SnapshotLog.FullM(full) => full
        case d: SnapshotLog.DeltaM =>
          val base = resolved.get(d.parent).orElse(version(d.parent))
            .getOrElse(throw new IllegalStateException(
              s"delta manifest v${d.version} orphaned: parent v${d.parent} missing"))
          SnapshotLog.applyDelta(base, d)
      }
      resolved(c.version) = c
      c
    }
  }

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
        version(v)
    }
  }

  /** A specific version without listing the log: one manifest read for
    * a checkpoint, plus at most CheckpointInterval−1 parent reads for a
    * delta tail. */
  def version(v: Int): Option[Commit] = {
    val f = manifestPath(v)
    if (!Files.exists(f)) None
    else readManifest(f) match {
      case SnapshotLog.FullM(c) => Some(c)
      case d: SnapshotLog.DeltaM =>
        val base = version(d.parent).getOrElse(throw new IllegalStateException(
          s"delta manifest v$v orphaned: parent v${d.parent} missing"))
        Some(SnapshotLog.applyDelta(base, d))
    }
  }

  /** Whether ANY commit carries `action` — the idempotency-tag probe.
    * Scans manifest HEADERS only (the `#action=` line sits in the first
    * few lines of every manifest): no entry resolution, no delta replay,
    * no schema parse — O(versions) small reads where [[commits]] is a
    * full-state fold. For a streaming sink probing once per micro-batch
    * this is the difference between linear and quadratic work over the
    * stream's lifetime between vacuums. */
  def hasAction(action: String): Boolean = {
    if (!exists) return false
    val needle = s"#action=$action"
    Files.list(logDir).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".manifest"))
      .exists { f =>
        val in = Files.newBufferedReader(f, StandardCharsets.UTF_8)
        try {
          var line = in.readLine()
          var found = false
          while (line != null && line.startsWith("#") && !found) {
            found = line == needle
            line = in.readLine()
          }
          found
        } finally in.close()
      }
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
             schemaDdl: Option[String] = None,
             lexclWith: Option[(Option[Commit], Int) => Seq[(Int, Int)]] = None): Commit =
    commitWith(action, _ => entries, tsMillis, schemaDdl, lexclWith)

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
                 schemaDdl: Option[String] = None,
                 lexclWith: Option[(Option[Commit], Int) => Seq[(Int, Int)]] = None): Commit =
    commitWithSchema(action, compute,
      cur => schemaDdl.orElse(cur.flatMap(_.schemaDdl)), tsMillis, lexclWith)

  /** [[commitWith]] variant whose pinned schema is RECOMPUTED from the
    * current commit on every CAS attempt — required for additive
    * evolution under concurrency: a schema unioned against a stale base
    * and then committed after a lost race would silently drop the
    * winning writer's new columns from every subsequent read. */
  def commitWithSchema(action: String, compute: Option[Commit] => Seq[Entry],
                       schemaWith: Option[Commit] => Option[String],
                       tsMillis: Long = System.currentTimeMillis(),
                       lexclWith: Option[(Option[Commit], Int) => Seq[(Int, Int)]] = None): Commit = {
    Files.createDirectories(logDir)
    var done: Option[Commit] = None
    while (done.isEmpty) {
      val cur = latest
      val v = cur.map(_.version).getOrElse(0) + 1
      // rename-link exclusions INHERIT by default (every ordinary
      // commit keeps its parent's branch view); restore replaces them
      val lex = lexclWith.map(_(cur, v))
        .getOrElse(cur.map(_.lexcl).getOrElse(Nil))
      val c = Commit(v, tsMillis, action, compute(cur),
        schemaWith(cur).orElse(cur.flatMap(_.schemaDdl)), lexcl = lex)
      val f = logDir.resolve(f"v$v%05d.manifest")
      // checkpoint cadence: full state at v1 and every Kth version;
      // everything between writes O(changed entries) delta bytes
      val body =
        if (cur.isEmpty || v % SnapshotLog.CheckpointInterval == 0) render(c)
        else renderDelta(c, cur.get)
      try {
        Files.write(f, body.getBytes(StandardCharsets.UTF_8),
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

  // ------------------------------------------------------------------ tags

  private val TagsFile = "_tags.properties"

  /** Named snapshot refs (Iceberg-tag analog): a tag pins a version
    * FOREVER — [[vacuum]] keeps a tagged commit's manifest and fragments
    * no matter how far past retention it falls, so `readTag` works years
    * later where the time-travel window has long closed. Tag writes are
    * metadata-only (a properties file in the log dir). */
  def tag(name: String, version: Int): Unit = {
    require(name.matches("[A-Za-z0-9_.-]+"),
      s"tag name must be a simple identifier, got '$name'")
    require(this.version(version).exists(!_.isDrop),
      s"cannot tag: no live version $version")
    val t = tags + (name -> version)
    writeTags(t)
  }

  def dropTag(name: String): Unit = writeTags(tags - name)

  def tags: Map[String, Int] = {
    val f = logDir.resolve(TagsFile)
    if (!Files.exists(f)) return Map.empty
    val p = new java.util.Properties()
    val in = Files.newInputStream(f)
    try p.load(in) finally in.close()
    p.stringPropertyNames().asScala.map(n => n -> p.getProperty(n).toInt).toMap
  }

  private def writeTags(t: Map[String, Int]): Unit = {
    val p = new java.util.Properties()
    t.foreach { case (n, v) => p.setProperty(n, v.toString) }
    Files.createDirectories(logDir)
    val out = Files.newOutputStream(logDir.resolve(TagsFile))
    try p.store(out, null) finally out.close()
  }

  /** Delete fragments referenced ONLY by commits older than the retention
    * window, and their manifests — keeping at least the latest commit and
    * every TAGGED commit (tags protect their manifest AND their fragments
    * regardless of age; a tagged delta manifest is re-checkpointed to a
    * self-contained full state before its ancestry disappears).
    * Returns removed fragment paths. */
  def vacuum(retainMillis: Long,
             nowMillis: Long = System.currentTimeMillis()): Seq[String] = {
    val all = commits
    if (all.isEmpty) return Seq.empty
    val cutoff = nowMillis - retainMillis
    val tagged = tags.values.toSet
    val (expired0, live0) = all.splitAt(
      math.min(all.count(_.tsMillis < cutoff), all.size - 1))
    val (protectedC, expired) = expired0.partition(c => tagged(c.version))
    val live = protectedC ++ live0
    val liveRefs = live.flatMap(_.entries.flatMap(e => e.path +: e.dv.toSeq)).toSet
    // FOREIGN refs (absolute paths — zero-copy clone entries pointing
    // into another table's data pool) are NEVER vacuum candidates here:
    // their lifecycle belongs to the owning table's log + the clone pin
    val removable = expired.flatMap(_.entries.flatMap(e => e.path +: e.dv.toSeq))
      .distinct.filterNot(liveRefs)
      .filterNot(rel => Paths.get(rel).isAbsolute)
    removable.foreach { rel =>
      deleteRecursive(tableDir.resolve(rel))
    }
    // survivors whose delta ancestry is about to disappear — the oldest
    // untagged survivor plus every protected (tagged) commit — are
    // re-checkpointed (atomic replace with their RESOLVED full state:
    // same version, same state, self-contained) BEFORE deleting
    if (expired.nonEmpty)
      (protectedC ++ live0.headOption).foreach { c =>
        readManifest(manifestPath(c.version)) match {
          case _: SnapshotLog.DeltaM =>
            val tmp = logDir.resolve(
              s"v${c.version}.ckpt.${java.util.UUID.randomUUID().toString.take(8)}")
            Files.write(tmp, render(c).getBytes(StandardCharsets.UTF_8))
            Files.move(tmp, manifestPath(c.version),
              java.nio.file.StandardCopyOption.REPLACE_EXISTING,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          case _ => ()
        }
      }
    expired.foreach(c => Files.deleteIfExists(logDir.resolve(f"v${c.version}%05d.manifest")))
    removable.map(rel => tableDir.resolve(rel).toString)
  }

  private def lexclHeader(l: Seq[(Int, Int)]): String =
    if (l.isEmpty) ""
    else l.map { case (a, b) => s"$a:$b" }.mkString("#lexcl=", ",", "\n")

  private def render(c: Commit): String = {
    val sb = new StringBuilder
    sb.append(s"#version=${c.version}\n#ts=${c.tsMillis}\n#action=${c.action}\n")
    sb.append(lexclHeader(c.lexcl))
    c.schemaDdl.foreach(d => sb.append(s"#schema=${SnapshotLog.escape(d)}\n"))
    c.entries.foreach { e =>
      sb.append(e.partition).append('\t').append(e.path)
      // 3rd field dv, 4th spec, 5th era: a non-default later field
      // forces (empty/zero) placeholders so the columns stay
      // positional; old manifests and all-default entries render
      // exactly as before
      if (e.era != -1) sb.append('\t').append(e.dv.getOrElse(""))
        .append('\t').append(e.spec).append('\t').append(e.era)
      else if (e.spec != 0) sb.append('\t').append(e.dv.getOrElse(""))
        .append('\t').append(e.spec)
      else e.dv.foreach(d => sb.append('\t').append(d))
      sb.append('\n')
    }
    sb.toString
  }

  /** Delta body: `+<TAB>partition<TAB>path` per added entry,
    * `-<TAB>path` per removed one, against `parent`'s state. The schema
    * header always rides along (it is small next to fragment lists and
    * makes every manifest self-describing for schema). */
  private def renderDelta(c: Commit, parent: Commit): String = {
    // entry identity is (path, dv): a merge-on-read delete keeps the
    // fragment path but swaps the deletion-vector pointer, and a
    // path-only diff would silently drop that change from the delta —
    // such entries render as remove + re-add (applyDelta removes by
    // path, then appends the re-add, so replay is exact)
    val parentIds = parent.entries.map(e => (e.path, e.dv)).toSet
    val newIds = c.entries.map(e => (e.path, e.dv)).toSet
    val sb = new StringBuilder
    sb.append(s"#version=${c.version}\n#ts=${c.tsMillis}\n#action=${c.action}\n")
    sb.append(s"#delta=1\n#parent=${parent.version}\n")
    sb.append(lexclHeader(c.lexcl))
    c.schemaDdl.foreach(d => sb.append(s"#schema=${SnapshotLog.escape(d)}\n"))
    parent.entries.filterNot(e => newIds((e.path, e.dv)))
      .foreach(e => sb.append("-\t").append(e.path).append('\n'))
    c.entries.filterNot(e => parentIds((e.path, e.dv)))
      .foreach { e =>
        sb.append("+\t").append(e.partition).append('\t').append(e.path)
        if (e.era != -1) sb.append('\t').append(e.dv.getOrElse(""))
          .append('\t').append(e.spec).append('\t').append(e.era)
        else if (e.spec != 0) sb.append('\t').append(e.dv.getOrElse(""))
          .append('\t').append(e.spec)
        else e.dv.foreach(d => sb.append('\t').append(d))
        sb.append('\n')
      }
    sb.toString
  }

  private def readManifest(f: Path): SnapshotLog.Manifest = {
    val lines = Files.readAllLines(f, StandardCharsets.UTF_8).asScala.toSeq
    val header = lines.takeWhile(_.startsWith("#"))
      .map(_.drop(1).split("=", 2)).map(a => a(0) -> a(1)).toMap
    val body = lines.dropWhile(_.startsWith("#")).filter(_.nonEmpty)
    val v = header("version").toInt
    val ts = header("ts").toLong
    val action = header.getOrElse("action", "write")
    val schema = header.get("schema").map(SnapshotLog.unescape)
    val lexcl: Seq[(Int, Int)] = header.get("lexcl").filter(_.nonEmpty)
      .map(_.split(",").toSeq.map { r =>
        val Array(a, b) = r.split(":"); (a.toInt, b.toInt)
      }).getOrElse(Nil)
    if (header.contains("delta")) {
      val adds = body.filter(_.startsWith("+\t")).map { l =>
        val f = l.substring(2).split('\t')
        Entry(f(0), f(1),
          if (f.length > 2 && f(2).nonEmpty) Some(f(2)) else None,
          if (f.length > 3) f(3).toInt else 0,
          if (f.length > 4) f(4).toInt else -1)
      }
      val removes = body.filter(_.startsWith("-\t")).map(_.substring(2))
      SnapshotLog.DeltaM(v, ts, action, schema, header("parent").toInt,
        adds, removes, lexcl)
    } else {
      val entries = body.map { l =>
        val f = l.split('\t')
        Entry(f(0), f(1),
          if (f.length > 2 && f(2).nonEmpty) Some(f(2)) else None,
          if (f.length > 3) f(3).toInt else 0,
          if (f.length > 4) f(4).toInt else -1)
      }
      SnapshotLog.FullM(Commit(v, ts, action, entries, schema, lexcl))
    }
  }

  private def deleteRecursive(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    }
}

object SnapshotLog {
  /** One table state entry: a partition value ("" for unpartitioned) → the
    * immutable parquet dir holding that partition's rows. `dv` is the
    * OPTIONAL deletion-vector attachment (merge-on-read deletes): the
    * relative path of a parquet dir of (entry, file, pos) rows naming
    * the positions deleted from this entry's files as of this commit —
    * readers anti-join it, compaction materializes and drops it. The
    * fragment itself stays immutable; a delete commit changes only this
    * pointer. */
  final case class Entry(partition: String, path: String,
                         dv: Option[String] = None,
                         /** Partition-spec version the entry was written
                           * under ([[graft.core.TableMeta.partitionSpecVersion]]):
                           * hidden-transform entry pruning applies ONLY to
                           * current-spec entries; -1 = unknown provenance
                           * (a compaction that merged specs) — never
                           * transform-pruned, always readable. 0 for every
                           * pre-evolution manifest (backward compatible). */
                         spec: Int = 0,
                         /** Rename ERA: the LENGTH of the table's
                           * logical-rename chain when this fragment's
                           * bytes were written — its physical column
                           * names already reflect links [0, era), so
                           * read-time re-labeling and sidecar pruning
                           * apply only links [era, ∞). The one honest
                           * disambiguator when a renamed-away name is
                           * later REUSED (a→b then ADD COLUMN a / RENAME
                           * c→a): physical name `a` means different
                           * columns on the two sides of the rename, and
                           * a table-wide map mislabels one of them.
                           * Copies/restores carry it verbatim (physical
                           * names and the chain copy together); rewrites
                           * (compaction, z-order, DV materialization)
                           * stamp the chain length at rewrite. -1 =
                           * legacy manifest (unknown) → every link
                           * applies, the exact pre-era behavior. */
                         era: Int = -1)

  /** `schemaDdl`: the union schema of this commit's fragments (None on
    * manifests written before schema pinning — readers fall back to the
    * physical file schemas). */
  final case class Commit(version: Int, tsMillis: Long, action: String,
                          entries: Seq[Entry],
                          schemaDdl: Option[String] = None,
                          /** RENAME-LINK EXCLUSIONS as of this commit:
                            * a RESTORE abandons the branch between the
                            * restored version and itself, and the
                            * rename links committed strictly inside
                            * each (lo, hi) range must not re-label
                            * fragments in reads OF this commit or its
                            * descendants (they belong to the abandoned
                            * branch). Inherited by every later commit;
                            * replaced by the next restore with the set
                            * as of ITS restored version. Time-travel
                            * reads of pre-restore commits use those
                            * commits' own (smaller) sets — exactly the
                            * branch they sit on. */
                          lexcl: Seq[(Int, Int)] = Nil) {
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

  /** Every Kth version writes a full-state checkpoint manifest; the
    * versions between write O(changed entries) deltas. Resolving any
    * version replays at most K−1 deltas. 20 balances commit IO against
    * version-read replay depth (Delta Lake's default checkpoint
    * interval is 10; fragments lists here are one line each). */
  val CheckpointInterval = 20

  /** Parsed manifest: a self-contained full state or a delta tail. */
  private[core] sealed trait Manifest
  private[core] final case class FullM(c: Commit) extends Manifest
  private[core] final case class DeltaM(version: Int, tsMillis: Long,
                                        action: String, schema: Option[String],
                                        parent: Int, adds: Seq[Entry],
                                        removes: Seq[String],
                                        lexcl: Seq[(Int, Int)]) extends Manifest

  /** Resolved state of a delta: parent entries minus removes (kept in
    * parent order — stable across replay paths) plus adds. */
  private[core] def applyDelta(base: Commit, d: DeltaM): Commit = {
    val removed = d.removes.toSet
    Commit(d.version, d.tsMillis, d.action,
      base.entries.filterNot(e => removed(e.path)) ++ d.adds,
      d.schema.orElse(base.schemaDdl),
      lexcl = d.lexcl)
  }

  val TimeTravelWindowMillis: Long = 7L * 24 * 3600 * 1000 // restore.py:60-70
  def forTable(root: String, dataset: String, table: String): SnapshotLog =
    new SnapshotLog(Paths.get(root, dataset, table))
}
