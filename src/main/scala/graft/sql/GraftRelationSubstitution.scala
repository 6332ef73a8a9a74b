package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Cast, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Resolution rule: replace every `DataSourceV2Relation` over a
  * [[GraftTable]] with the warehouse's OWN read plan (deletion vectors,
  * rename chains, column defaults, zone-map stats — none of which a bare
  * DSv2 parquet scan could serve). The Delta-lake substitution design:
  * the catalog resolves the NAME, the engine supplies the PLAN.
  *
  * Two invariants make the splice sound mid-analysis:
  *
  *  - output attributes keep the RELATION's exprIds (an exprId-preserving
  *    Project over the fresh plan): parent operators may already have
  *    resolved references against the relation's output in an earlier
  *    fixed-point iteration, and dangling exprIds would unresolve them;
  *  - relations in WRITE-TARGET position (`V2WriteCommand.table` is not a
  *    child, DML targets are) are left alone — the V1-fallback write and
  *    the parse-time DML interception own those. */
final class GraftRelationSubstitution(spark: SparkSession)
    extends Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {

  override val ruleName = "graft.RelationSubstitution"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // RUNTIME GROUP FILTERING pre-pass: a ReplaceData node (Spark's
    // group-based row-level rewrite) carries the DML condition as a
    // FIELD — map it to the live RowLevelOperation instance so the
    // tagged-read splice below can zone/Bloom-prune the fragment set
    // and record the group split on the op the WRITE side shares.
    val rowLevelConds = new java.util.IdentityHashMap[AnyRef,
      org.apache.spark.sql.catalyst.expressions.Expression]()
    plan.foreach {
      case rd: ReplaceData =>
        throughAliases(rd.table).foreach { r =>
          org.apache.spark.sql.GraftBridge.rowLevelOperationOf(r.table)
            .foreach(op => rowLevelConds.put(op, rd.condition))
        }
      case _ => ()
    }
    // DML target relations (by identity): DeleteFromTable/UpdateTable/
    // MergeIntoTable keep their target as a CHILD, so a blanket rewrite
    // would splice under them and break Spark's own "unsupported" error
    // (GraftSql intercepts these shapes at parse time; anything reaching
    // here is a shape the engine refuses).
    val dmlTargets = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[LogicalPlan, java.lang.Boolean]())
    plan.foreach {
      case d: DeleteFromTable => collectRelations(d.table, dmlTargets)
      case u: UpdateTable => collectRelations(u.table, dmlTargets)
      case m: MergeIntoTable => collectRelations(m.targetTable, dmlTargets)
      case i: InsertIntoStatement => collectRelations(i.table, dmlTargets)
      case _ => ()
    }
    // Relations sitting under a Filter get the zone/Bloom-PRUNED read
    // (a WHERE over a catalog name must not open every file of a 100 TB
    // snapshot — Warehouse.readPrunedResolved). While the condition is
    // still UNRESOLVED the relation is HELD for a later fixed-point
    // iteration: the plain splice would otherwise consume it first and
    // the pruning opportunity would be gone. A condition that never
    // resolves fails the query in checkAnalysis anyway, so the hold
    // cannot strand an unsubstituted relation in a valid query.
    val held = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[LogicalPlan, java.lang.Boolean]())
    plan.foreach {
      case Filter(cond, child) if !cond.resolved =>
        throughAliases(child).foreach(held.add)
      case _ => ()
    }
    // METADATA-COLUMN hold: a provenance SELECT resolves `_g_frag`
    // against the relation's metadataOutput BEFORE AddMetadataColumns
    // widens the relation's own output — splicing in that window
    // strands the resolved reference (the splice projects exactly
    // r.output). Hold the relation one fixed-point iteration; once
    // AddMetadataColumns has run, the output contains the column and
    // the tagged-read branch below serves it.
    val referenced = plan.collect { case p => p.references }
      .foldLeft(org.apache.spark.sql.catalyst.expressions.AttributeSet.empty)(_ ++ _)
    plan.foreach {
      case r: DataSourceV2Relation if graftOf(r.table).isDefined &&
          r.metadataOutput.exists(m => referenced.contains(m) &&
            !r.output.exists(_.exprId == m.exprId)) =>
        held.add(r); ()
      case _ => ()
    }
    val pruned = plan.resolveOperatorsDown {
      case f @ Filter(cond, child) if cond.resolved =>
        throughAliases(child) match {
          case Some(r) if graftOf(r.table).isDefined &&
              !dmlTargets.contains(r) =>
            val t = graftOf(r.table).get
            // a relation referencing `_g_frag` needs the per-fragment
            // TAGGED read (row-level rewrite / provenance query) — the
            // zone-pruned whole read can't serve the tag
            val plan = if (r.output.exists(_.name == GraftTable.FragColumn))
              taggedReadFor(r, t, rowLevelConds) else t.readPlanPruned(cond)
            Filter(cond, replaceRelation(child, r, spliceFor(r, plan, t)))
          case _ => f
        }
    }
    pruned.resolveOperatorsUp {
      // PERSISTED VIEWS on the non-SQL entry points (spark.read.table,
      // spark.table): the catalog's loadTable declines views, so the
      // relation is still unresolved when this rule runs — expand the
      // stored definition exactly as the parse-time path does (same
      // depth guard; the spliced text re-enters the analyzer)
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
          if u.multipartIdentifier.size == 3 =>
        GraftSql.lookup(spark, u.multipartIdentifier)
          .filter(tg => tg.wh.isView(tg.dataset, tg.table))
          .map(GraftSql.expandView(spark, _): LogicalPlan)
          .getOrElse(u)
      case r: DataSourceV2Relation if graftOf(r.table).isDefined &&
          !dmlTargets.contains(r) && !held.contains(r) =>
        val t = graftOf(r.table).get
        // `_g_frag` in the output = the relation references the
        // provenance metadata column (a provenance SELECT or the
        // row-level rewrite's required metadata attr) — serve the
        // per-fragment TAGGED read; plain relations keep the
        // whole-scan read
        val plan = if (r.output.exists(_.name == GraftTable.FragColumn))
          taggedReadFor(r, t, rowLevelConds) else t.readPlan()
        spliceFor(r, plan, t)
    }
  }

  /** The tagged read a `_g_frag`-referencing relation gets. Provenance
    * SELECTs read every fragment. A ROW-LEVEL REWRITE's relation (its
    * table wraps the live [[GraftRowLevelOperation]]) gets RUNTIME
    * GROUP FILTERING: the DML condition's deterministic target-only
    * conjuncts zone/Bloom-prune the fragment set, the splice reads
    * ONLY the candidates, and the group split is recorded on the op so
    * the commit supersedes exactly what was read and carries the rest
    * forward. Conjunct extraction is exprId-strict against THIS
    * relation's output — a MERGE source column sharing a target
    * column's NAME must never prune the target (and a MERGE with NOT
    * MATCHED BY SOURCE arrives as `TrueLiteral`: no conjuncts, no
    * pruning, every fragment a candidate). */
  private def taggedReadFor(r: DataSourceV2Relation, t: GraftTable,
      conds: java.util.IdentityHashMap[AnyRef,
        org.apache.spark.sql.catalyst.expressions.Expression])
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.GraftBridge.rowLevelOperationOf(r.table) match {
      case Some(op: GraftRowLevelOperation)
          if spark.conf.get("spark.graft.sql.dml.v2.groupFilter",
            "true").toBoolean =>
        val g = op.groups.getOrElse {
          val cond = Option(conds.get(op))
            .flatMap(targetOnlyCondition(_, r))
          val (c, cand, carried) =
            t.wh.planRowLevelGroups(t.dataset, t.table, cond)
          op.recordGroups(GraftRowLevelGroups(c, cand,
            cand.map(_.path).toSet, carried.size))
          op.groups.get
        }
        t.wh.readWithFragmentTag(t.dataset, t.table, GraftTable.FragColumn,
          g.commit, g.candidates)
      case _ => t.readPlanTagged()
    }

  /** Deterministic, subquery-free conjuncts of the DML condition whose
    * references live entirely in THIS relation's output (by exprId) —
    * the prunable fraction. None = no usable conjunct = no pruning. */
  private def targetOnlyCondition(
      cond: org.apache.spark.sql.catalyst.expressions.Expression,
      r: DataSourceV2Relation)
      : Option[org.apache.spark.sql.catalyst.expressions.Expression] = {
    import org.apache.spark.sql.catalyst.expressions.{And, CommonExpressionRef, PlanExpression, RuntimeReplaceable, With}
    // lower RuntimeReplaceable sugar (BETWEEN et al.) to the comparison
    // shapes the zone/Bloom pruners interpret — the optimizer would do
    // this later, but pruning runs at analysis time. BETWEEN's
    // replacement wraps in With/CommonExpressionRef (shared-subexpr
    // bookkeeping); inline the defs so the conjuncts split and the
    // pruner sees plain `k >= lo AND k <= hi`. Inlining duplicates the
    // def expression — fine here, these run zero times (pruning only
    // inspects shapes), and only deterministic conjuncts survive below.
    val lowered = cond.transformUp {
      case rr: RuntimeReplaceable => rr.replacement
    }.transformUp {
      case w: With =>
        val defs = w.defs.map(d => d.id -> d.child).toMap
        w.child.transformUp {
          case r: CommonExpressionRef => defs.getOrElse(r.id, r)
        }
    }
    val usable = splitConjunctivePredicates(lowered).filter { c =>
      c.deterministic && c.references.nonEmpty &&
        c.references.subsetOf(r.outputSet) &&
        !c.exists(_.isInstanceOf[PlanExpression[_]])
    }
    usable.reduceOption(And)
  }

  /** The [[GraftTable]] behind a relation's table — directly, or
    * wrapped in the analyzer's `RowLevelOperationTable` (the READ side
    * of a v2 UPDATE/MERGE/DELETE rewrite: `ReplaceData.query` scans the
    * target through that wrapper, and the warehouse read must splice
    * there exactly as for a SELECT — deletion vectors, rename chains
    * and defaults feed the rewrite). The WRITE side is untouched:
    * `ReplaceData.table` is a field, not a child, so the traversals
    * here never reach it. */
  private def graftOf(t: org.apache.spark.sql.connector.catalog.Table)
      : Option[GraftTable] =
    org.apache.spark.sql.GraftBridge.unwrapRowLevelTable(t) match {
      case g: GraftTable => Some(g)
      case _ => None
    }

  /** The exprId-preserving splice: parent operators may already have
    * resolved references against the relation's output in an earlier
    * fixed-point iteration, so the fresh plan is projected back onto the
    * relation's own attribute ids. */
  private def spliceFor(r: DataSourceV2Relation,
                        plan: org.apache.spark.sql.DataFrame,
                        t: GraftTable): LogicalPlan = {
    val fresh = plan.queryExecution.analyzed
    val byName = fresh.output.map(a => a.name -> a).toMap
    val projected: Seq[NamedExpression] = r.output.map { o =>
      val src = byName.getOrElse(o.name, throw new IllegalStateException(
        s"${t.name()}: column '${o.name}' in the resolved relation is " +
          "missing from the warehouse read — schema drift mid-analysis"))
      // exprId-preserving alias; cast covers a concurrent widen
      // between loadTable (schema snapshot) and this read
      val v = if (src.dataType == o.dataType) src else Cast(src, o.dataType)
      Alias(v, o.name)(exprId = o.exprId, qualifier = o.qualifier)
    }
    Project(projected, fresh)
  }

  /** The relation under a chain of SubqueryAlias wrappers (the shape a
    * catalog lookup leaves a FROM-clause relation in), if any. */
  private def throughAliases(p: LogicalPlan): Option[DataSourceV2Relation] =
    p match {
      case r: DataSourceV2Relation => Some(r)
      case a: SubqueryAlias => throughAliases(a.child)
      case _ => None
    }

  /** Rebuild the alias chain of `p` with `target` (by identity) replaced
    * by `replacement` — SubqueryAlias passes exprIds through, so the
    * wrapper chain above the splice keeps resolving. */
  private def replaceRelation(p: LogicalPlan, target: DataSourceV2Relation,
                              replacement: LogicalPlan): LogicalPlan = p match {
    case r: DataSourceV2Relation if r eq target => replacement
    case a: SubqueryAlias => a.copy(child = replaceRelation(a.child, target, replacement))
    case other => other
  }

  private def collectRelations(p: LogicalPlan,
                               into: java.util.Set[LogicalPlan]): Unit =
    p.foreach {
      case r: DataSourceV2Relation => into.add(r); ()
      case _ => ()
    }
}
