package graft.sql

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.{ParameterContext, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** Parser wrapper: Spark's own parser produces the plan, then
  * [[GraftSql.rewrite]] redirects DML/time-travel nodes whose target is
  * a registered warehouse table. Everything else delegates verbatim.
  * Injected by [[graft.plans.GraftExtensions]] via `injectParser`. */
final class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  /** Maintenance grammar the stock parser lacks: tried only AFTER the
    * delegate rejects the text, and only for registered warehouse
    * tables — anything else re-throws the delegate's own error. */
  //   OPTIMIZE <t>                      — small-file compaction
  //   OPTIMIZE <t> ZORDER BY (a, b)     — two-dimensional layout rewrite
  // The column list matches LOOSELY (anything inside the parens) and
  // arity validates in code: a 1- or 3-column list must fail with
  // "ZORDER BY takes exactly two columns", not the delegate parser's
  // generic syntax error for the whole OPTIMIZE statement.
  //   OPTIMIZE <t> WHERE <part> = '<v>' ZORDER BY (a, b) — scope the
  //   rewrite to one hive partition (Delta OPTIMIZE ... WHERE); the
  //   clause must name the partition column, validated in the command.
  private val OptimizeRe =
    """(?is)\s*OPTIMIZE\s+([A-Za-z_][A-Za-z0-9_.]*)\s*(?:WHERE\s+([A-Za-z_][A-Za-z0-9_]*)\s*=\s*'([^']*)')?\s*(?:ZORDER\s+BY\s*\(([^)]*)\))?\s*;?\s*""".r
  private val VacuumRe =
    """(?is)\s*VACUUM\s+([A-Za-z_][A-Za-z0-9_.]*)(?:\s+RETAIN\s+(\d+)\s+HOURS)?\s*;?\s*""".r
  // IAM grammar (grants.py:260-292 reconcile verbs — Spark's parser has
  // no GRANT/REVOKE at all, so these are pure fallback additions):
  //   GRANT <role> ON [TABLE] <t> TO <principal>
  //   REVOKE <role> ON [TABLE] <t> FROM <principal>
  //   SHOW GRANTS ON [TABLE] <t>
  private val GrantRe =
    """(?is)\s*GRANT\s+([A-Za-z_]+)\s+ON\s+(?:TABLE\s+)?([A-Za-z_][A-Za-z0-9_.]*)\s+TO\s+(\S+?)\s*;?\s*""".r
  private val RevokeRe =
    """(?is)\s*REVOKE\s+([A-Za-z_]+)\s+ON\s+(?:TABLE\s+)?([A-Za-z_][A-Za-z0-9_.]*)\s+FROM\s+(\S+?)\s*;?\s*""".r
  private val ShowGrantsRe =
    """(?is)\s*SHOW\s+GRANTS\s+ON\s+(?:TABLE\s+)?([A-Za-z_][A-Za-z0-9_.]*)\s*;?\s*""".r
  // Dataset-level bindings (the reference's access-policy inheritance,
  // grants.py:71-106): a SCHEMA grant applies to every table in the
  // dataset — see Warehouse.effectiveGrants. Matched BEFORE the table
  // forms (the table regex cannot match the two-token SCHEMA <name>).
  private val GrantSchemaRe =
    """(?is)\s*GRANT\s+([A-Za-z_]+)\s+ON\s+SCHEMA\s+([A-Za-z_][A-Za-z0-9_.]*)\s+TO\s+(\S+?)\s*;?\s*""".r
  private val RevokeSchemaRe =
    """(?is)\s*REVOKE\s+([A-Za-z_]+)\s+ON\s+SCHEMA\s+([A-Za-z_][A-Za-z0-9_.]*)\s+FROM\s+(\S+?)\s*;?\s*""".r
  private val ShowSchemaGrantsRe =
    """(?is)\s*SHOW\s+GRANTS\s+ON\s+SCHEMA\s+([A-Za-z_][A-Za-z0-9_.]*)\s*;?\s*""".r
  // Time-travel restore (Delta grammar; semantics = the reference's
  // admin/restore.py flow — in-place, windowed, restore-of-dropped):
  //   RESTORE [TABLE] <t> TO VERSION AS OF <n>
  //   RESTORE [TABLE] <t> TO TIMESTAMP AS OF '<ts>'
  private val RestoreVerRe =
    """(?is)\s*RESTORE\s+(?:TABLE\s+)?([A-Za-z_][A-Za-z0-9_.]*)\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*""".r
  private val RestoreTsRe =
    """(?is)\s*RESTORE\s+(?:TABLE\s+)?([A-Za-z_][A-Za-z0-9_.]*)\s+TO\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)'\s*;?\s*""".r
  private def maintenanceFallback(sqlText: String): Option[LogicalPlan] = {
    val spark = org.apache.spark.sql.SparkSession.getActiveSession.orNull
    if (spark == null) return None
    sqlText match {
      case OptimizeRe(name, wcol, wval, zcols) =>
        val z = Option(zcols).map { lst =>
          val cs = lst.split(',').map(_.trim).filter(_.nonEmpty).toSeq
          require(cs.size >= 2,
            s"OPTIMIZE ... ZORDER BY takes at least two columns, " +
              s"got ${cs.size}: (${cs.mkString(", ")})")
          cs.foreach(c => require(c.matches("[A-Za-z_][A-Za-z0-9_]*"),
            s"invalid ZORDER BY column name '$c'"))
          cs
        }
        GraftSql.lookup(spark, name.split('.').toSeq)
          .map(GraftOptimizeCommand(_, z,
            Option(wcol).map(c => (c, wval))))
      case VacuumRe(name, hours) =>
        GraftSql.lookup(spark, name.split('.').toSeq)
          .map(GraftVacuumCommand(_, Option(hours).map(_.toLong)))
      case GrantSchemaRe(role, name, principal) =>
        GraftSql.lookupSchema(spark, name)
          .map { case (wh, ds) =>
            GraftSchemaGrantCommand(wh, ds, role.toLowerCase, principal,
              revoke = false) }
      case RevokeSchemaRe(role, name, principal) =>
        GraftSql.lookupSchema(spark, name)
          .map { case (wh, ds) =>
            GraftSchemaGrantCommand(wh, ds, role.toLowerCase, principal,
              revoke = true) }
      case ShowSchemaGrantsRe(name) =>
        GraftSql.lookupSchema(spark, name)
          .map { case (wh, ds) => GraftShowSchemaGrantsCommand(wh, ds) }
      case GrantRe(role, name, principal) =>
        GraftSql.lookup(spark, name.split('.').toSeq)
          .map(GraftGrantCommand(_, role.toLowerCase, principal, revoke = false))
      case RevokeRe(role, name, principal) =>
        GraftSql.lookup(spark, name.split('.').toSeq)
          .map(GraftGrantCommand(_, role.toLowerCase, principal, revoke = true))
      case ShowGrantsRe(name) =>
        GraftSql.lookup(spark, name.split('.').toSeq)
          .map(GraftShowGrantsCommand(_))
      case RestoreVerRe(name, v) =>
        GraftSql.lookup(spark, name.split('.').toSeq)
          .map(GraftRestoreCommand(_, Some(v.toInt), None))
      case RestoreTsRe(name, ts) =>
        GraftSql.lookup(spark, name.split('.').toSeq)
          .map(GraftRestoreCommand(_, None,
            Some(graft.core.TimeParse.parseTimestamp(ts))))
      case _ => None
    }
  }

  override def parsePlan(sqlText: String): LogicalPlan =
    try GraftSql.rewrite(delegate.parsePlan(sqlText))
    catch {
      case e: org.apache.spark.sql.catalyst.parser.ParseException =>
        maintenanceFallback(sqlText).getOrElse(throw e)
    }
  override def parsePlanWithParameters(sqlText: String,
                                       ctx: ParameterContext): LogicalPlan =
    try GraftSql.rewrite(delegate.parsePlanWithParameters(sqlText, ctx))
    catch {
      case e: org.apache.spark.sql.catalyst.parser.ParseException =>
        maintenanceFallback(sqlText).getOrElse(throw e)
    }
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
