package graft.manifest

import scala.collection.mutable

/** A model node — the projection of a dbt manifest node the engine works
  * with (dbtwiz/dbt/manifest.py:281-309). */
final case class ModelNode(
    uniqueId: String,
    database: String,
    schema: String,
    name: String,
    alias: String = "",
    path: String = "",
    tags: Set[String] = Set.empty,
    meta: Map[String, String] = Map.empty,
    group: String = "",
    materialized: String = "view",
    description: String = "",
    packageName: String = "",
    deprecated: Boolean = false) {
  def aliasOrName: String = if (alias.nonEmpty) alias else name
  def relationName: String = s"$database.$schema.$aliasOrName"
}

/** A source node (dbtwiz/dbt/manifest.py:373-394). */
final case class SourceNode(
    uniqueId: String,
    database: String,
    schema: String,
    name: String,
    sourceName: String,
    identifier: String = "",
    description: String = "",
    tags: Set[String] = Set.empty) {
  def identifierOrName: String = if (identifier.nonEmpty) identifier else name
  def relationName: String = s"$database.$schema.$identifierOrName"
}

/** The DAG of models and sources: the reference's Manifest
  * (dbtwiz/dbt/manifest.py:31-55) re-expressed as immutable Scala maps +
  * adjacency lists, with the same derived operations:
  *
  *  - recursive upstream/downstream closures (manifest.py:340-370)
  *  - relation-name → ref()/source() lookup (manifest.py:396-430, J7)
  *  - selector language: exact name, `+model`, `model+`, `tag:t`,
  *    `materialized:m`, space/comma-separated unions
  *    (manifest.py:201-210, commands/build.py:73-78)
  *  - stg_/int_/other ordering key (manifest.py:331-338, W2)
  */
final class Manifest(val models: Map[String, ModelNode],
                     val sources: Map[String, SourceNode],
                     val parentMap: Map[String, Set[String]]) {

  /** child_map derived by inverting parent_map (manifest.py:43-48). */
  val childMap: Map[String, Set[String]] = {
    val m = mutable.Map.empty[String, mutable.Set[String]]
    parentMap.foreach { case (child, parents) =>
      parents.foreach(p => m.getOrElseUpdate(p, mutable.Set.empty) += child)
    }
    m.map { case (k, v) => k -> v.toSet }.toMap
  }

  private val byUniqueId: Map[String, ModelNode] =
    models.values.map(n => n.uniqueId -> n).toMap

  /** Transitive model parents of `name` (model_dependencies_upstream):
    * pairs of (uniqueId, materialized). */
  def upstream(name: String): Set[(String, String)] =
    closure(models(name).uniqueId, parentMap)

  /** Transitive model children of `name` (model_dependencies_downstream). */
  def downstream(name: String): Set[(String, String)] =
    closure(models(name).uniqueId, childMap)

  private def closure(start: String, adj: Map[String, Set[String]]): Set[(String, String)] = {
    val seen = mutable.Set.empty[String]
    val out = mutable.Set.empty[(String, String)]
    def walk(id: String): Unit =
      adj.getOrElse(id, Set.empty).filter(_.startsWith("model.")).foreach { n =>
        if (seen.add(n)) {
          byUniqueId.get(n).foreach(m => out += ((n, m.materialized)))
          walk(n)
        }
      }
    walk(start)
    out.toSet
  }

  /** J7 — lowercased FQ relation name → ("ref", model) or
    * ("source", (sourceName, table)) (manifest.py:396-430). */
  lazy val tableReferenceLookup: Map[String, (String, Any)] = {
    val fromModels = models.values.filter(_.uniqueId.startsWith("model.")).map { n =>
      s"${n.database.toLowerCase}.${n.schema.toLowerCase}.${n.aliasOrName}" ->
        (("ref", n.name: Any))
    }
    val fromSources = sources.values.filter(_.uniqueId.startsWith("source.")).map { s =>
      s"${s.database.toLowerCase}.${s.schema.toLowerCase}.${s.identifierOrName.toLowerCase}" ->
        (("source", (s.sourceName, s.name): Any))
    }
    (fromModels ++ fromSources).toMap
  }

  /** Rewrite FQ table names in SQL text to ref()/source() calls
    * (model/validate.py:453-501 semantics). Returns (rewritten,
    * unresolved FQ names). */
  def rewriteRefs(sql: String): (String, Seq[String]) = {
    val fqPattern = """`?([A-Za-z0-9_-]+)`?\.`?([A-Za-z0-9_]+)`?\.`?([A-Za-z0-9_]+)`?""".r
    val unresolved = mutable.ListBuffer.empty[String]
    val rewritten = fqPattern.replaceAllIn(sql, m => {
      val key = s"${m.group(1)}.${m.group(2)}.${m.group(3)}".toLowerCase
      tableReferenceLookup.get(key) match {
        case Some(("ref", name)) => s"{{ ref('$name') }}"
        case Some(("source", (src, tbl))) => s"{{ source('$src', '$tbl') }}"
        case _ =>
          unresolved += key
          m.matched
      }
    })
    (rewritten, unresolved.distinct.toSeq)
  }

  /** P6 — pass `select` straight to execution when it names a model
    * exactly or contains selector syntax chars (manifest.py:201-210). */
  def canSelectDirectly(select: String): Boolean =
    models.contains(select) || "[:+*, ]".r.findFirstIn(select).isDefined

  /** W2 — stg_ < int_ < other ordering key (manifest.py:331-338). */
  def modelOrdering(name: String): String =
    if (name.startsWith("stg_")) s"0_$name"
    else if (name.startsWith("int_")) s"1_$name"
    else s"2_$name"

  /** Resolve a selector expression to model names, in model-ordering
    * order. Supported atoms (union over space/comma-separated atoms):
    * `name`, `+name` (include upstream), `name+` (include downstream),
    * `tag:t`, `materialized:m`, `*` (all). */
  def select(selector: String): Seq[String] = {
    val atoms = selector.split("[ ,]+").filter(_.nonEmpty)
    val out = mutable.LinkedHashSet.empty[String]
    atoms.foreach { atom =>
      if (atom == "*") out ++= models.keys
      else if (atom.startsWith("tag:"))
        out ++= models.collect { case (n, m) if m.tags(atom.drop(4)) => n }
      else if (atom.startsWith("materialized:"))
        out ++= models.collect { case (n, m) if m.materialized == atom.drop(13) => n }
      else {
        val up = atom.startsWith("+")
        val down = atom.endsWith("+")
        val name = atom.stripPrefix("+").stripSuffix("+")
        models.get(name).foreach { _ =>
          if (up) out ++= upstream(name).flatMap(p => byUniqueId.get(p._1)).map(_.name)
          out += name
          if (down) out ++= downstream(name).flatMap(c => byUniqueId.get(c._1)).map(_.name)
        }
      }
    }
    out.toSeq.sortBy(modelOrdering)
  }
}

object Manifest {
  /** Build from nodes with parents expressed by model NAME (convenience
    * constructor mirroring the manifest JSON's parent_map). */
  def apply(models: Seq[ModelNode], sources: Seq[SourceNode] = Seq.empty,
            parentsByName: Map[String, Seq[String]] = Map.empty): Manifest = {
    val byName = models.map(m => m.name -> m).toMap
    val parentMap = parentsByName.map { case (child, parents) =>
      byName(child).uniqueId -> parents.flatMap(p =>
        byName.get(p).map(_.uniqueId).orElse(
          sources.find(_.name == p).map(_.uniqueId))).toSet
    }
    new Manifest(byName, sources.map(s => s.name -> s).toMap, parentMap)
  }
}
