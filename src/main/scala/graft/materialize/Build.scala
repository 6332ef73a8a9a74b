package graft.materialize

import scala.collection.mutable
import org.apache.spark.sql.DataFrame
import graft.core.{TableMeta, Warehouse}
import graft.manifest.Manifest

/** The dbt-run analog (commands/build.py:46-126, dbt/run.py:8-45,
  * commands/test.py:20-24 date-var plumbing): resolve a selector against
  * the manifest, order the chosen models by their dependency DAG, and
  * materialize each with its declared strategy against the [[Warehouse]].
  *
  * Model bodies are Spark SQL carrying dbt's templating subset:
  *  - `{{ ref('m') }}` — another model. Ephemeral targets inline as a
  *    bracketed subquery (dbt's CTE inlining, recursively rendered);
  *    stored targets resolve to a registered temp view over the
  *    warehouse table (the current run's output when `m` was selected,
  *    the existing table otherwise — dbt's defer-ish default).
  *  - `{{ source('s', 't') }}` — a source relation, loaded through the
  *    caller's loader and registered once.
  *  - `{{ var('name') }}` — run variables (e.g. `data_interval_start`).
  *
  * Each selected model dispatches on `materialized`: view (stored SQL),
  * table (CTAS), incremental (insert_overwrite on the partition field
  * from model meta, default `partitiondate`), ephemeral (nothing stored).
  * Returns one status row per model in execution order. */
final class Build(wh: Warehouse, manifest: Manifest,
                  sqlBodies: Map[String, String],
                  sourceLoader: (String, String) => DataFrame) {

  private val spark = wh.spark
  private val RefPattern = """\{\{\s*ref\(\s*['"]([^'"]+)['"]\s*\)\s*\}\}""".r
  private val SourcePattern =
    """\{\{\s*source\(\s*['"]([^'"]+)['"]\s*,\s*['"]([^'"]+)['"]\s*\)\s*\}\}""".r
  private val VarPattern = """\{\{\s*var\(\s*['"]([^'"]+)['"]\s*\)\s*\}\}""".r

  private def refView(model: String) = s"graft_ref_$model"
  private def srcView(src: String, tbl: String) = s"graft_src_${src}_$tbl"

  /** Render a model body to executable Spark SQL: vars substituted,
    * sources registered+referenced, ephemeral refs inlined recursively,
    * stored refs pointed at their temp views. */
  def render(model: String, vars: Map[String, String],
             inlining: Set[String] = Set.empty): String = {
    val body = sqlBodies.getOrElse(model,
      throw new IllegalArgumentException(s"no SQL body for model '$model'"))
    val withVars = VarPattern.replaceAllIn(body, m =>
      scala.util.matching.Regex.quoteReplacement(
        vars.getOrElse(m.group(1),
          throw new IllegalArgumentException(s"undefined var '${m.group(1)}' in $model"))))
    val withSources = SourcePattern.replaceAllIn(withVars, m => {
      val (s, t) = (m.group(1), m.group(2))
      // ALWAYS re-register: a cached view would silently serve a previous
      // run's data when the same session builds against a different
      // source location (e.g. a warmup pass at a smaller SF)
      sourceLoader(s, t).createOrReplaceTempView(srcView(s, t))
      srcView(s, t)
    })
    RefPattern.replaceAllIn(withSources, m => {
      val target = m.group(1)
      val node = manifest.models.getOrElse(target,
        throw new IllegalArgumentException(s"$model refs unknown model '$target'"))
      val replacement =
        if (node.materialized == "ephemeral") {
          require(!inlining(target), s"ephemeral cycle through '$target'")
          s"( ${render(target, vars, inlining + target)} )"
        } else refView(target)
      // inlined SQL may contain '$' / '\' — never raw replacement text
      scala.util.matching.Regex.quoteReplacement(replacement)
    })
  }

  /** Selected models in dependency order (Kahn over the model parent
    * map restricted to the selection; deterministic tie-break by the
    * stg < int < other ordering, then name). */
  def topoOrder(selected: Seq[String]): Seq[String] = {
    val inSel = selected.toSet
    val byId = manifest.models.values.map(n => n.uniqueId -> n.name).toMap
    def parentsIn(name: String): Set[String] =
      manifest.parentMap.getOrElse(manifest.models(name).uniqueId, Set.empty)
        .flatMap(byId.get).filter(inSel)
    val done = mutable.LinkedHashSet.empty[String]
    val pending = mutable.Set.from(selected)
    while (pending.nonEmpty) {
      val ready = pending.toSeq
        .filter(m => parentsIn(m).forall(done.contains))
        .sortBy(m => (manifest.modelOrdering(m), m))
      require(ready.nonEmpty,
        s"dependency cycle among: ${pending.toSeq.sorted.mkString(", ")}")
      ready.foreach { m => done += m; pending -= m }
    }
    done.toSeq
  }

  final case class BuildResult(model: String, materialized: String, action: String)

  /** Run the selector: materialize each chosen model in DAG order.
    * Non-ephemeral dependencies OUTSIDE the selection are served from
    * their existing warehouse tables. */
  def run(select: String, vars: Map[String, String] = Map.empty): Seq[BuildResult] = {
    val selected = manifest.select(select)
    require(selected.nonEmpty, s"selector '$select' matched no models")
    val ordered = topoOrder(selected)
    // upstream stored models not in this run read their current tables
    val upstreamStored = selected.flatMap(manifest.upstream(_)).collect {
      case (uid, mat) if mat != "ephemeral" => uid
    }.distinct.flatMap(uid => manifest.models.values.find(_.uniqueId == uid))
      .filterNot(n => selected.contains(n.name))
    upstreamStored.foreach { n =>
      wh.read(n.schema, n.aliasOrName).createOrReplaceTempView(refView(n.name))
    }
    val mat = new Materialize(wh)
    ordered.map { name =>
      val node = manifest.models(name)
      val action = node.materialized match {
        case "ephemeral" => "inlined"
        case "view" =>
          val sql = render(name, vars)
          mat.view(node.schema, node.aliasOrName, sql)
          spark.sql(sql).createOrReplaceTempView(refView(name))
          "view"
        case "incremental" =>
          val field = node.meta.getOrElse("partition_field", "partitiondate")
          mat.incremental(node.schema, node.aliasOrName,
            spark.sql(render(name, vars)), partitionField = field)
          wh.read(node.schema, node.aliasOrName).createOrReplaceTempView(refView(name))
          "incremental"
        case _ => // table (the reference's default materialization)
          mat.table(node.schema, node.aliasOrName, spark.sql(render(name, vars)))
          wh.read(node.schema, node.aliasOrName).createOrReplaceTempView(refView(name))
          "table"
      }
      BuildResult(name, node.materialized, action)
    }
  }
}
