package graft.core

/** Fully-qualified 3-level table name `project.dataset.table`.
  *
  * The reference always addresses warehouse relations by a 3-part id split
  * on `.` with backticks tolerated (dbtwiz/admin/cleanup.py:54,
  * dbtwiz/model/validate.py:126-127). Spark analog: `catalog.database.table`.
  */
final case class TableId(project: String, dataset: String, table: String) {
  def fq: String = s"$project.$dataset.$table"
  /** 2-level name for engines with a single catalog (Spark in-memory). */
  def dbTable: String = s"$dataset.$table"
  override def toString: String = fq
}

object TableId {
  /** Parse `project.dataset.table`, stripping backticks
    * (validate.py:126-127 semantics). Returns None unless exactly 3 parts. */
  def parse(s: String): Option[TableId] =
    s.replace("`", "").split('.') match {
      case Array(p, d, t) if p.nonEmpty && d.nonEmpty && t.nonEmpty =>
        Some(TableId(p, d, t))
      case _ => None
    }
}
