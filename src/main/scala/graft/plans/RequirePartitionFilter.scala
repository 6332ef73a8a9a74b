package graft.plans

import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._
import org.apache.spark.SparkException
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Analysis-time enforcement of `require_partition_filter`
  * (dbtwiz/model/create.py:465, dbtwiz/admin/clustering.py:34-45): a scan
  * of a flagged table must sit under a filter that references the
  * partition column, or the query is rejected — BigQuery enforcement
  * parity, the one Catalyst extension the engine needs (SURVEY §4).
  *
  * Tables are flagged by data-path prefix (the warehouse table dir).
  * The check walks the logical plan: Filter nodes contribute their
  * referenced column names to every scan beneath them (each join branch is
  * checked independently, like BigQuery's per-table enforcement).
  *
  * It is injected as an OPTIMIZER rule, not an analysis check rule, so it
  * fires when a query EXECUTES — BigQuery's submit-time semantics. An
  * analysis check would reject the bare `wh.read(table)` Dataset before a
  * caller could compose `.filter(partitionCol === ...)` on top of it.
  *
  * Install via `SparkSession.builder.withExtensions(new GraftExtensions)`
  * or `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
object RequirePartitionFilter {

  private val flagged = new ConcurrentHashMap[String, String]()

  /** Flag every scan under `pathPrefix` as requiring a filter on
    * `partitionCol`. */
  def flagPath(pathPrefix: String, partitionCol: String): Unit =
    flagged.put(pathPrefix, partitionCol.toLowerCase)

  def unflagPath(pathPrefix: String): Unit = flagged.remove(pathPrefix)

  def clear(): Unit = flagged.clear()

  def check(plan: LogicalPlan): Unit = verify(plan, Set.empty)

  private def verify(plan: LogicalPlan, filterCols: Set[String]): Unit = plan match {
    case Filter(condition, child) =>
      verify(child, filterCols ++ condition.references.map(_.name.toLowerCase))
    case lr: LogicalRelation =>
      lr.relation match {
        case fs: HadoopFsRelation =>
          val paths = fs.location.rootPaths.map(_.toString)
          flagged.asScala.foreach { case (prefix, partCol) =>
            if (paths.exists(_.startsWith(prefix)) && !filterCols(partCol))
              throw new SparkException(
                s"Cannot query table at $prefix without a filter on " +
                  s"partition column '$partCol' (require_partition_filter)")
          }
        case _ =>
      }
    case other =>
      other.children.foreach(verify(_, filterCols))
      other.subqueries.foreach(verify(_, filterCols))
  }
}

/** Session extension wiring: the partition-filter enforcement rule
  * (injectOptimizerRule), the warehouse SQL DML parser
  * ([[graft.sql.GraftSqlParser]] via injectParser), and the
  * catalog-relation substitution that serves [[graft.sql.GraftCatalog]]
  * reads through the warehouse read plan (injectResolutionRule). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => new org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
      override val ruleName = "graft.RequirePartitionFilter"
      override def apply(plan: LogicalPlan): LogicalPlan = {
        RequirePartitionFilter.check(plan)
        plan
      }
    })
    ext.injectParser((_, delegate) => new graft.sql.GraftSqlParser(delegate))
    ext.injectResolutionRule(session =>
      new graft.sql.GraftRelationSubstitution(session))
  }
}
