package graft.admin

import graft.core.{TableMeta, Warehouse}
import graft.admin.Admin.Grant

/** Atomic table migration with compensating rollback
  * (dbtwiz/integrations/bigquery.py:737-801, rollback :1033-1036): replace
  * an existing table with a pointer to its new home, keeping a backup.
  *
  * Steps (each with a compensating action applied in reverse on failure):
  *  1. verify prerequisites — old exists, new exists, backup missing
  *     (`_check_expected_table_states` semantics, bigquery.py:850-882)
  *  2. back up the old table (copy, description tagged BACKUP)
  *  3. replace the old table with a deprecated redirect view onto the new
  *     location (description tagged DEPRECATED)
  *  4. merge grants from the old table onto the redirect
  *     (`_copy_iam_policy` merge semantics, bigquery.py:884-896)
  *
  * There are no cross-table transactions in either warehouse — the
  * compensating-action pattern is the faithful mapping.
  */
object Migrate {

  val BackupMessage = "Backup table from migration"
  val DeprecationMessage = "DEPRECATED: table has moved"

  sealed trait State
  case object Missing extends State
  case object Exists extends State
  case object Backup extends State
  case object Deprecated extends State

  /** Classify a table the way `_check_expected_table_states` does:
    * missing / backup (tagged description) / deprecated (tagged) /
    * exists. */
  def state(wh: Warehouse, dataset: String, table: String): State =
    if (!wh.exists(dataset, table)) Missing
    else wh.meta(dataset, table).description match {
      case Some(d) if d.contains(BackupMessage) => Backup
      case Some(d) if d.contains(DeprecationMessage) => Deprecated
      case _ => Exists
    }

  final case class MigrationResult(migrated: Boolean, reason: String,
                                   grantsMerged: Seq[Grant])

  /** RENAME `old` → `new` (the reference's atomic migrate applied to a
    * rename, `bigquery.py:947-950` + the :737-801 flow): a METADATA-ONLY
    * directory move ([[graft.core.Warehouse.moveTable]] — grants, zone
    * sidecars and the full commit history travel, O(1) in data size),
    * then a live DEPRECATED redirect VIEW at the old name — readers of
    * the old name keep working and see the new table's CURRENT data (a
    * view, not a frozen copy, so post-rename writes show through).
    * Compensating rollback on mid-flight failure: any partial view
    * artifacts at the vacated old path are removed and the directory
    * moves back — the old table is intact because the move never copies.
    * Throws on precondition failures — this is the catalog-DDL entry
    * point ([[graft.sql.GraftCatalog.renameTable]]), where Spark expects
    * exceptions, not result objects.
    *
    * `newRef` is the name the redirect view's SQL embeds — the caller
    * qualifies it (catalog.dataset.table) so the text re-resolves in any
    * session that can reach the catalog. */
  def renameTable(wh: Warehouse,
                  oldDs: String, oldTable: String,
                  newDs: String, newTable: String,
                  newRef: String, currentCatalog: String = ""): Unit = {
    val bad =
      (if (wh.isView(oldDs, oldTable))
        Seq(s"$oldDs.$oldTable is a view — recreate it under the new name")
      else if (state(wh, oldDs, oldTable) != Exists)
        Seq(s"$oldDs.$oldTable: expected `Exists` but had " +
          s"`${state(wh, oldDs, oldTable)}`")
      else Nil) ++
      (if (wh.isView(newDs, newTable) || state(wh, newDs, newTable) != Missing)
        Seq(s"$newDs.$newTable already exists")
      else if (wh.droppedHistoryAt(newDs, newTable))
        // CREATE TABLE can reuse a dropped name (it appends to the
        // surviving log) but a directory MOVE cannot merge histories,
        // and the dropped history must stay at its name for
        // restore-of-dropped — refuse here with a catalog-level error
        // instead of leaking moveTable's filesystem exception
        Seq(s"$newDs.$newTable: a dropped table or view's history " +
          "occupies that name for the time-travel window — pick another " +
          "name or vacuum the old history first")
      else Nil)
    if (bad.nonEmpty) throw new IllegalArgumentException(
      s"cannot rename: ${bad.mkString("; ")}")
    var moved = false
    try {
      // METADATA-ONLY: one directory move — grants, zone sidecars and
      // the full commit history travel with the table (time travel
      // keeps working under the new name; a copy-based rename would
      // both pay O(data) and reset the new name's lineage to v1)
      wh.moveTable(oldDs, oldTable, newDs, newTable)
      moved = true
      wh.createView(oldDs, oldTable, graft.core.StoredView(
        sql = s"SELECT * FROM $newRef",
        currentCatalog = currentCatalog,
        currentNamespace = Seq(newDs),
        schemaDdl = wh.schemaDdl(newDs, newTable).getOrElse(""),
        queryColumnNames = Seq.empty, columnAliases = Seq.empty,
        columnComments = Seq.empty,
        properties = Map("comment" ->
          s"$DeprecationMessage: use $newDs.$newTable")), orReplace = false)
    } catch {
      case e: Exception =>
        if (moved) {
          try rollbackRename(wh, oldDs, oldTable, newDs, newTable)
          catch {
            // a failed rollback strands the table at the NEW name — the
            // caller must know, so it rides as a suppressed exception
            // instead of being silently swallowed (the original failure
            // alone would read as "nothing changed")
            case r: Exception => e.addSuppressed(r)
          }
        }
        throw e
    }
  }

  /** Compensation for a rename that failed AFTER the directory move:
    * clear any partial redirect-view artifacts from the vacated old path
    * (a half-written view file / entry-less view log — anything else
    * there fail-louds, see [[graft.core.Warehouse.removePartialView]]),
    * then move the directory back. Package-visible so the spec can
    * exercise it against hand-built partial states — the mid-createView
    * failure window is not reachable deterministically from the outside. */
  private[graft] def rollbackRename(wh: Warehouse,
                                    oldDs: String, oldTable: String,
                                    newDs: String, newTable: String): Unit = {
    wh.removePartialView(oldDs, oldTable)
    wh.moveTable(newDs, newTable, oldDs, oldTable)
  }

  /** Migrate `old` → `new`: backup, redirect, grant merge; compensate on
    * failure. `grants` is the metadata grants table (the engine models IAM
    * as data — SURVEY §7 hard parts). Returns what happened. */
  def migrateTable(wh: Warehouse,
                   oldDs: String, oldTable: String,
                   newDs: String, newTable: String,
                   grants: Seq[Grant] = Seq.empty): MigrationResult = {
    val backupTable = s"${oldTable}__bck"
    // 1. prerequisites (skip, don't throw — reference skips with an error log)
    val checks = Seq(
      (oldDs, oldTable, Exists), (newDs, newTable, Exists),
      (oldDs, backupTable, Missing))
    val bad = checks.collect {
      case (d, t, want) if state(wh, d, t) != want =>
        s"$d.$t: expected `$want` but had `${state(wh, d, t)}`"
    }
    if (bad.nonEmpty)
      return MigrationResult(migrated = false,
        s"state wasn't as expected: ${bad.mkString("; ")}", Seq.empty)

    var backupDone = false
    try {
      // 2. backup
      wh.copy(oldDs, oldTable, oldDs, backupTable)
      wh.setMeta(oldDs, backupTable,
        wh.meta(oldDs, backupTable).copy(description = Some(BackupMessage)))
      backupDone = true
      // 3. replace old with a deprecated redirect: the old location now
      // serves the new table's current data (a copy commit onto the old
      // log — readers of the old name see the new data plus the tag).
      wh.copy(newDs, newTable, oldDs, oldTable)
      wh.setMeta(oldDs, oldTable,
        wh.meta(oldDs, oldTable).copy(
          description = Some(s"$DeprecationMessage: use $newDs.$newTable")))
      // 4. merge grants old → redirect (preserve existing target grants)
      val oldKey = s"$oldDs.$oldTable"
      val newKey = s"$newDs.$newTable"
      val merged = (grants.filter(_.table == newKey) ++
        grants.filter(_.table == oldKey).map(_.copy(table = newKey))).distinct
      MigrationResult(migrated = true, "ok", merged)
    } catch {
      case e: Exception =>
        // Compensate in reverse: restore the old table from the backup,
        // then remove the backup (rollback path bigquery.py:1033-1036).
        if (backupDone) {
          try {
            wh.copy(oldDs, backupTable, oldDs, oldTable)
            wh.setMeta(oldDs, oldTable,
              wh.meta(oldDs, oldTable).copy(description = None))
            wh.drop(oldDs, backupTable)
          } catch { case _: Exception => () }
        }
        MigrationResult(migrated = false, s"rolled back: ${e.getMessage}", Seq.empty)
    }
  }
}
