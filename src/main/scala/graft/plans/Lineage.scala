package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, ExprId, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Column-level lineage extraction from the ANALYZED logical plan — the
  * column-grain counterpart of the manifest's model-level DAG
  * (`graft.manifest.Manifest`; the reference tracks lineage at model
  * grain via dbt's manifest, dbtwiz/dbt/manifest.py): for every output
  * column of a query, which (source, column) leaves does it derive from?
  * This is the impact-analysis primitive a warehouse needs at scale —
  * "which marts break if raw.orders.o_totalprice changes type" is a
  * lineage query, and at 100 TB you answer it from plan metadata, never
  * by scanning anything.
  *
  * Mechanics: one driver-side walk of the analyzed plan (no job, no
  * data). Catalyst attributes carry globally unique `ExprId`s, so
  * lineage is an environment `ExprId → Set[(source, column)]` built
  * bottom-up: relation leaves seed their own columns, Project/Aggregate/
  * Window extend the environment with each NamedExpression's referenced
  * leaves, pass-through nodes (Filter/Sort/Join/...) just merge child
  * environments since their output attributes ARE child attributes.
  * Union re-keys by POSITION (its output adopts the first child's ids
  * but every branch feeds the column). Generate (explode) maps generator
  * outputs to the generator's references.
  *
  * Contract: REFERENCE lineage ("derives from"), not copy lineage — a
  * column produced by `sum(x) * y` traces to both x and y; filter/join
  * predicates do NOT taint columns (standard column-lineage semantics:
  * predicates gate rows, they don't flow into values). Unknown plan
  * shapes contribute what their children expose; an attribute the walk
  * cannot explain yields the empty set — honest "unknown", never a
  * guess. */
object Lineage {

  type Source = (String, String) // (table/path, column)

  /** Lineage of every output column of `df`. */
  def columnLineage(df: DataFrame): Map[String, Set[Source]] = {
    val plan = df.queryExecution.analyzed
    val env = walk(plan)
    plan.output.map(a => a.name -> env.getOrElse(a.exprId, Set.empty[Source])).toMap
  }

  /** The distinct source tables a query reads — the model-level DAG edge
    * set, derived from the same walk. */
  def sourceTables(df: DataFrame): Set[String] =
    columnLineage(df).values.flatten.map(_._1).toSet

  private def walk(plan: LogicalPlan): Map[ExprId, Set[Source]] = plan match {
    case r: LogicalRelation =>
      val src = relationName(r)
      r.output.map(a => a.exprId -> Set(src -> a.name)).toMap
    case l: LocalRelation =>
      l.output.map(a => a.exprId -> Set("<local>" -> a.name)).toMap
    case p: Project =>
      val env = mergeChildren(p)
      env ++ named(p.projectList, env)
    case a: Aggregate =>
      val env = mergeChildren(a)
      env ++ named(a.aggregateExpressions, env)
    case w: Window =>
      val env = mergeChildren(w)
      env ++ named(w.windowExpressions, env)
    case g: Generate =>
      val env = mergeChildren(g)
      val genRefs = refs(g.generator, env)
      env ++ g.generatorOutput.map(a => a.exprId -> genRefs)
    case u: Union =>
      val childEnvs = u.children.map(walk)
      val merged = childEnvs.reduce(_ ++ _)
      // output adopts the FIRST child's ids; every branch feeds the column
      merged ++ u.output.zipWithIndex.map { case (out, i) =>
        out.exprId -> u.children.zip(childEnvs).flatMap { case (c, env) =>
          env.getOrElse(c.output(i).exprId, Set.empty[Source])
        }.toSet
      }
    case e: Expand =>
      val env = mergeChildren(e)
      // grouping-set expansion: each output position unions the
      // projections feeding it across all expansion rows
      env ++ e.output.zipWithIndex.map { case (out, i) =>
        out.exprId -> e.projections.flatMap(row => refs(row(i), env)).toSet
      }
    case other => mergeChildren(other)
  }

  private def mergeChildren(plan: LogicalPlan): Map[ExprId, Set[Source]] =
    plan.children.map(walk).foldLeft(Map.empty[ExprId, Set[Source]])(_ ++ _)

  private def named(es: Seq[NamedExpression],
                    env: Map[ExprId, Set[Source]]): Map[ExprId, Set[Source]] =
    es.map {
      case a: AttributeReference => a.exprId -> env.getOrElse(a.exprId, Set.empty[Source])
      case al: Alias => al.exprId -> refs(al.child, env)
      case ne => ne.exprId -> refs(ne, env)
    }.toMap

  /** Leaves an expression derives from: every referenced attribute's
    * lineage, resolved through the environment. Subquery expressions
    * contribute their plans' full source sets (a scalar subquery's value
    * derives from everything it reads). */
  private def refs(e: Expression, env: Map[ExprId, Set[Source]]): Set[Source] = {
    val attrRefs = e.collect {
      case a: AttributeReference => env.getOrElse(a.exprId, Set.empty[Source])
    }.flatten.toSet
    val subquery = e.collect {
      case s: org.apache.spark.sql.catalyst.expressions.SubqueryExpression =>
        walk(s.plan).values.flatten.toSet
    }.flatten.toSet
    attrRefs ++ subquery
  }

  /** A stable human name for a file relation: the last two path segments
    * (dataset/table for warehouse layouts, dir/file.parquet for raw
    * fixtures). */
  private def relationName(r: LogicalRelation): String = r.relation match {
    case h: HadoopFsRelation =>
      h.location.rootPaths.headOption.map { p =>
        val parts = p.toUri.getPath.split('/').filter(_.nonEmpty)
        parts.takeRight(math.min(2, parts.length)).mkString("/")
      }.getOrElse("<relation>")
    case _ => "<relation>"
  }
}
