package graft.admin

import org.apache.spark.sql.DataFrame
import graft.core.Warehouse
import graft.manifest.Manifest

/** Warehouse-administration dataflows of the reference, over the engine's
  * [[Warehouse]] + [[Manifest]]: orphan reconciliation (cleanup.py),
  * grants reconcile (grants.py), description sync (descriptions.py),
  * partition-spec reconcile (partition.py), and plan-stats work sizing
  * (backfill.py dry-run analog). All are driver-side metadata dataflows at
  * catalog cardinality; heavy lifting (the actual rewrites/deletes) runs
  * through Spark jobs.
  */
object Admin {

  // ----------------------------------------------------------- orphans (J2)

  /** Warehouse tables absent from the manifest — the anti-join of
    * cleanup.py:89-101, guarded: empty manifest side → nothing reported
    * (same guard as the reference). Keys are (dataset, table). */
  def orphanedTables(wh: Warehouse, manifest: Manifest): Seq[(String, String)] = {
    val manifestRelations: Set[(String, String)] =
      manifest.models.values
        .filter(m => Set("view", "table", "incremental")(m.materialized))
        .map(m => (m.schema, m.aliasOrName)).toSet
    if (manifestRelations.isEmpty) return Seq.empty
    (for {
      ds <- wh.listDatasets()
      t <- wh.listTables(ds)
      if !t.contains("__dbt_tmp_") // P1 NOT LIKE filter (cleanup.py:71)
      if !manifestRelations((ds, t))
    } yield (ds, t)).sorted
  }

  /** J6 — suffix-match orphaned tables to deleted model files:
    * `name == table or name.endswith("__" + table)`
    * (cleanup.py:209-219). */
  def matchDeletedFiles(orphans: Seq[(String, String)],
                        deletedModelNames: Seq[String]): Map[(String, String), Seq[String]] =
    orphans.map { case (ds, t) =>
      (ds, t) -> deletedModelNames.filter(n => n == t || n.endsWith("__" + t)).sorted
    }.toMap

  // ------------------------------------------------------------ grants (J3)

  final case class Grant(table: String, role: String, principal: String)

  /** Full-outer diff of desired vs current IAM members per (table, role):
    * needs_granting = desired − current, needs_revoking = current −
    * desired (grants.py:260-292). Returned sorted for determinism. */
  def grantsDiff(desired: Seq[Grant], current: Seq[Grant]): (Seq[Grant], Seq[Grant]) = {
    val d = desired.toSet
    val c = current.toSet
    ((d -- c).toSeq.sortBy(g => (g.table, g.role, g.principal)),
      (c -- d).toSeq.sortBy(g => (g.table, g.role, g.principal)))
  }

  /** A6 — grantee-set accumulation from the reference's five sources
    * (explicit grants, teams, access policy, service consumers,
    * open-access; grants.py:71-106), deduplicated and sorted. */
  def resolveGrantees(explicit: Seq[String], teams: Seq[String],
                      accessPolicy: Seq[String], serviceConsumers: Seq[String],
                      openAccess: Boolean): Seq[String] = {
    val all = explicit ++ teams ++ accessPolicy ++ serviceConsumers ++
      (if (openAccess) Seq("allAuthenticatedUsers") else Seq.empty)
    all.distinct.sorted
  }

  // ----------------------------------------------------- descriptions (J4)

  /** Mismatched column descriptions: manifest-declared vs live schema,
    * joined on lowercased dotted column path (descriptions.py:85-97,
    * 147-172). Returns (path, declared, live) triples needing sync. */
  def descriptionDiff(declared: Map[String, String],
                      live: Map[String, String]): Seq[(String, String, String)] = {
    val d = declared.map { case (k, v) => k.toLowerCase -> v }
    val l = live.map { case (k, v) => k.toLowerCase -> v }
    d.toSeq.collect {
      case (path, text) if text.nonEmpty && l.getOrElse(path, "") != text =>
        (path, text, l.getOrElse(path, ""))
    }.sortBy(_._1)
  }

  // ------------------------------------------------- partition specs (J5)

  /** Tables whose declared partition expiration differs from the live
    * warehouse value (partition.py:48-77). Input maps keyed by table
    * name; None = no expiration. */
  def expirationMismatches(declared: Map[String, Option[Int]],
                           live: Map[String, Option[Int]]): Seq[(String, Option[Int], Option[Int])] =
    declared.toSeq.collect {
      case (t, want) if live.contains(t) && live(t) != want =>
        (t, want, live(t))
    }.sortBy(_._1)

  // ------------------------------------------------------- work sizing (S7)

  /** Dry-run cost scan analog: Catalyst's optimized-plan statistics give
    * the bytes a query would read after pruning — the engine-side
    * equivalent of BigQuery's total_bytes_processed
    * (backfill.py:76-80 → optimizedPlan.stats.sizeInBytes). */
  def estimatedBytes(df: DataFrame): Long =
    df.queryExecution.optimizedPlan.stats.sizeInBytes.toLong
}
