package graft.admin

import org.apache.spark.sql.DataFrame
import graft.config.{DbtProject, ProjectSettings}
import graft.core.Warehouse
import graft.manifest.{Manifest, ModelFiles}

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

  /** empty_development_dataset (cleanup.py:15-44): the dev dataset named
    * by the PROFILE target (config-tree fed — `dataset` with `schema`
    * fallback) is emptied; every live table drops through the snapshot
    * log, so data stays restorable for the time-travel window. Returns
    * the dropped table names. */
  def emptyDevelopmentDataset(wh: Warehouse, profiles: graft.config.Profiles,
                              target: String,
                              env: Map[String, String] = sys.env): Seq[String] = {
    val prof = profiles.profileConfig(target, env)
    val dataset = prof.getOrElse("dataset", prof.getOrElse("schema", ""))
    require(dataset.nonEmpty, s"profile target '$target' names no dataset/schema")
    val tables = wh.listTables(dataset)
    tables.foreach(t => wh.drop(dataset, t))
    tables
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

  /** _collect_principals (grants.py:14-40): resolve meta-config names to
    * principals through the project's var dictionary — an unknown name
    * fails loudly with the valid choices, a known name without a
    * `principal` contributes nothing, and an empty access dict resolves
    * to nothing (the reference short-circuits before the lookup loop).
    * `configKey` is the model-meta key named in the error ("access-policy"),
    * which differs from the var-dict name ("access-policies"). */
  def collectPrincipals(metaValues: Seq[String], project: DbtProject,
                        varName: String, configKey: String,
                        nodeName: String): Seq[String] =
    if (metaValues.isEmpty || project.validNamesOf(varName).isEmpty) Nil
    else metaValues.flatMap { item =>
      project.principalsOf(varName, item).getOrElse(
        throw new IllegalArgumentException(
          s"$nodeName - Unable to find $configKey with name '$item'. " +
            s"Valid values are: ${project.validNamesOf(varName).mkString("|")}"))
    }

  /** _resolve_desired_grants (grants.py:43-106) fed by the CONFIG TREES
    * instead of pre-resolved lists: model-meta team / access-policy /
    * service-consumer names resolve via dbt_project.yml vars, the
    * pyproject open-access group joins for protected/public models, and
    * every principal must be a group or service account. */
  def desiredGrantees(explicit: Seq[String], metaTeams: Seq[String],
                      metaAccessPolicies: Seq[String],
                      metaServiceConsumers: Seq[String],
                      project: DbtProject, settings: ProjectSettings,
                      access: Option[String], nodeName: String): Seq[String] = {
    val open = settings.grantsOpenAccessGroup
      .filter(_ => access.exists(Set("protected", "public")))
    val all = (explicit ++
      collectPrincipals(metaTeams, project, "teams", "teams", nodeName) ++
      collectPrincipals(metaAccessPolicies, project, "access-policies",
        "access-policy", nodeName) ++
      collectPrincipals(metaServiceConsumers, project, "service-consumers",
        "service-consumers", nodeName) ++
      open).distinct.sorted
    // substring containment, not a prefix check — the reference's exact
    // rule (grants.py:99: `"group:" not in g and "serviceAccount:" not in g`)
    val invalid = all.filterNot(g => g.contains("group:") || g.contains("serviceAccount:"))
    require(invalid.isEmpty,
      s"Invalid principals '${invalid.mkString(", ")}'; " +
        "Can only grant permissions to groups and service accounts!")
    all
  }

  final case class GrantSweep(
      desired: Map[(String, String), Map[String, Seq[String]]],
      errors: Seq[String], skipped: Int)

  /** _resolve_all_grants (grants.py:109-180): manifest-wide desired-grant
    * sweep for the configured role. Per node: elementary-package models
    * are ignored; `skip_grants` meta and ephemeral materializations skip
    * silently; meta `teams` / `access-policy` / `service-consumers`
    * (comma-separated in this engine's flat meta map) resolve through the
    * config trees; resolution failures (unknown names, invalid
    * principals) collect as errors instead of aborting the sweep; a model
    * that ends up with NO grantees outside `grants_skip_schemas` is an
    * error (it would be unavailable to everyone). Returns
    * {(database, schema) → {table → grantees}}. */
  def resolveAllGrants(models: Seq[graft.manifest.ModelNode],
                       explicitGrants: Map[String, Seq[String]],
                       project: DbtProject, settings: ProjectSettings): GrantSweep = {
    val errors = Seq.newBuilder[String]
    var skipped = 0
    val desired = scala.collection.mutable.Map.empty[(String, String), Map[String, Seq[String]]]
    def metaList(m: graft.manifest.ModelNode, key: String): Seq[String] =
      m.meta.get(key).toSeq.flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    models.filterNot(_.packageName == "elementary").foreach { m =>
      if (m.meta.get("skip_grants").contains("true") || m.materialized == "ephemeral")
        skipped += 1
      else {
        try {
          val grantees = desiredGrantees(
            explicitGrants.getOrElse(m.name, Nil),
            metaList(m, "teams"), metaList(m, "access-policy"),
            metaList(m, "service-consumers"),
            project, settings, m.meta.get("access"), m.name)
          if (grantees.isEmpty) {
            if (!m.schema.endsWith("_elementary") &&
                !settings.grantsSkipSchemas.contains(m.schema))
              errors += s"No grant config: Model '${m.schema}.${m.name}' has no " +
                "grant config, and will be unavailable for all as a result."
            else skipped += 1
          } else {
            val key = (m.database, m.schema)
            desired(key) = desired.getOrElse(key, Map.empty)
              .updated(m.aliasOrName, grantees)
          }
        } catch {
          case e: IllegalArgumentException => errors += e.getMessage
        }
      }
    }
    GrantSweep(desired.toMap, errors.result(), skipped)
  }

  /** check_source_reader_access (bigquery.py:188-233), the pure core: a
    * service account has sufficient access when it reads at the DATASET
    * level, or at the table level for every checked table; otherwise it
    * maps to its missing tables. */
  def missingSourceReaders(datasetReaders: Set[String],
                           tableReaders: Map[String, Set[String]],
                           serviceAccounts: Seq[String],
                           tables: Seq[String]): Map[String, Seq[String]] =
    serviceAccounts.collect {
      case sa if !datasetReaders.contains(sa) =>
        sa -> tables.filterNot(t => tableReaders.getOrElse(t, Set.empty).contains(sa))
    }.collect { case (sa, missing) if missing.nonEmpty => sa -> missing }.toMap

  /** Config-fed source-reader check (source/create.py's gate): projects in
    * `source_reader_unchecked_projects` skip entirely (access is granted
    * at project level); otherwise the configured reader SAs are checked
    * with [[missingSourceReaders]]. */
  def checkSourceReaders(settings: ProjectSettings, project: String,
                         datasetReaders: Set[String],
                         tableReaders: Map[String, Set[String]],
                         tables: Seq[String]): Map[String, Seq[String]] =
    if (settings.sourceReaderUncheckedProjects.contains(project)) Map.empty
    else missingSourceReaders(datasetReaders, tableReaders,
      settings.sourceReaderServiceAccounts.keys.toSeq, tables)

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

  /** resolve_partition_expiration (partition.py:36-46): a model's declared
    * expiration is either a literal day count or a `{{ var('…') }}`
    * reference into dbt_project.yml vars; unknown vars resolve to 0 (the
    * reference's `partition_vars.get(var_name, 0)`). The resolved map
    * feeds [[expirationMismatches]]. */
  def resolveDeclaredExpiration(defined: String, project: DbtProject): Int =
    if (defined.forall(_.isDigit) && defined.nonEmpty) defined.toInt
    else ModelFiles.extractVarName(defined).map(v => project.varInt(v).getOrElse(0))
      .getOrElse(0)

  // -------------------------------------------------- descriptions strip (F16)

  val AugmentedStart = "[comment]: <> (START AUGMENTED DOCS)"
  val AugmentedEnd = "[comment]: <> (END AUGMENTED DOCS)"

  /** _strip_augmented_docs (descriptions.py:11-23): remove the deploy-
    * augmented block. An unterminated block truncates at its start; a
    * terminated one keeps ONLY the tail — text before the block is
    * dropped, exactly as the reference does (`description[end + len:]`,
    * not prefix + tail): the augmenter always appends authored text
    * after the block, so the prefix is deploy-generated. */
  def stripAugmentedDocs(description: String): String = {
    if (description == null || !description.contains(AugmentedStart)) return description
    val start = description.indexOf(AugmentedStart)
    val end = description.indexOf(AugmentedEnd)
    if (end == -1) description.take(start).trim
    else description.substring(end + AugmentedEnd.length).trim
  }

  // ------------------------------------------------------- work sizing (S7)

  /** Dry-run cost scan analog: Catalyst's optimized-plan statistics give
    * the bytes a query would read after pruning — the engine-side
    * equivalent of BigQuery's total_bytes_processed
    * (backfill.py:76-80 → optimizedPlan.stats.sizeInBytes). */
  def estimatedBytes(df: DataFrame): Long =
    df.queryExecution.optimizedPlan.stats.sizeInBytes.toLong
}
