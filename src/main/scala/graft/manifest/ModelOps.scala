package graft.manifest

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import scala.collection.immutable.ListMap
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.DataFrame
import graft.manifest.SourceYaml.{Mapp, Node, Scalar, Seqq}

/** Model validate + move flows (SURVEY §2 validate/move):
  *
  *  - yml column sync vs the live table (model/validate.py:166-224):
  *    schema-file columns reconciled against the warehouse schema — new
  *    columns added with their type, stale data_types refreshed, missing
  *    descriptions filled from the table, columns the table no longer has
  *    dropped (the SO2 `yml − table` difference).
  *  - model move (model/move.py:34-150): relocate <name>.sql/.yml to a
  *    new folder + name; in safe mode the old model becomes a view
  *    `select * from {{ ref("new") }}` flagged `is_tmp_old_copy` so
  *    downstream consumers migrate at leisure, otherwise old files are
  *    deleted. In-memory first, best-effort rollback of new files on
  *    failure.
  *  - reference rewrite (move.py:153-184, F11): every `ref('old')` call
  *    across the project's .sql files — flexible spacing, either quote
  *    style, case-insensitive — becomes `ref("new")`.
  *
  * The live-table side speaks Spark: [[liveColumns]] reads a DataFrame's
  * schema (flat name/type/comment), so the sync works against any table
  * the engine can load.
  */
object ModelOps {

  final case class LiveColumn(name: String, dataType: String,
                              description: Option[String])

  /** Live column view of a DataFrame schema: names, Spark SQL type
    * strings, and `comment` metadata as the description feed. */
  def liveColumns(df: DataFrame): Seq[LiveColumn] =
    df.schema.fields.toSeq.map { f =>
      val desc =
        if (f.metadata.contains("comment")) Some(f.metadata.getString("comment"))
        else None
      LiveColumn(f.name, f.dataType.sql.toLowerCase, desc)
    }

  // ------------------------------------------------------- yml column sync

  /** _update_yml_columns (validate.py:166-224) over the parsed schema
    * file: returns the updated document and whether anything changed.
    * Column order follows the TABLE (the reference iterates table_cols);
    * yml-only columns are dropped; existing descriptions are never
    * overwritten, only missing ones filled. */
  def syncYmlColumns(doc: Node, tableColumns: Seq[LiveColumn]): (Node, Boolean) = {
    var updated = false
    def syncModel(model: Node): Node = model match {
      case Mapp(m) =>
        val ymlCols: ListMap[String, Node] = m.get("columns") match {
          case Some(Seqq(items)) =>
            ListMap.from(items.collect {
              case c @ Mapp(cm) => nameOf(cm) -> (c: Node)
            })
          case _ => updated = true; ListMap.empty
        }
        val newCols = tableColumns.map { tc =>
          val existing = ymlCols.get(tc.name) match {
            case Some(Mapp(cm)) => cm
            case _ => ListMap[String, Node]("name" -> Scalar(tc.name))
          }
          val withType =
            if (str(existing, "data_type").contains(tc.dataType)) existing
            else { updated = true; existing.updated("data_type", Scalar(tc.dataType): Node) }
          val withDesc =
            if (withType.contains("description")) withType
            else { updated = true;
              withType.updated("description", Scalar(tc.description.getOrElse("")): Node) }
          Mapp(withDesc): Node
        }
        val removed = ymlCols.keySet -- tableColumns.map(_.name).toSet
        if (removed.nonEmpty) updated = true
        Mapp(m.updated("columns", Seqq(newCols): Node))
      case other => other
    }
    doc match {
      case Mapp(top) => top.get("models") match {
        case Some(Seqq(models)) =>
          (Mapp(top.updated("models", Seqq(models.map(syncModel)): Node)), updated)
        case _ => (doc, false)
      }
      case _ => (doc, false)
    }
  }

  /** Sync a schema file on disk against a live DataFrame; returns true
    * when the file was rewritten. */
  def syncYmlFile(ymlPath: Path, live: DataFrame): Boolean = {
    val doc = SourceYaml.parse(Files.readString(ymlPath))
    val (synced, updated) = syncYmlColumns(doc, liveColumns(live))
    if (updated)
      Files.write(ymlPath, SourceYaml.render(synced).getBytes(StandardCharsets.UTF_8))
    updated
  }

  // -------------------------------------------------------- ref rewriting

  /** update_model_references (move.py:163-184): rewrite every
    * `ref('old')` — flexible spacing, either quote style, case-insensitive
    * on the call — to `ref("new")` across the project's .sql files.
    * Returns the number of call sites changed. */
  def updateModelReferences(modelsDir: Path, oldName: String, newName: String): Int = {
    val pattern = ("""(?i)\bref\s*\(\s*['"]""" +
      java.util.regex.Pattern.quote(oldName) + """['"]\s*\)""").r
    var changes = 0
    sqlFiles(modelsDir).foreach { f =>
      val content = Files.readString(f)
      val ms = pattern.findAllMatchIn(content).size
      if (ms > 0) {
        changes += ms
        Files.writeString(f, pattern.replaceAllIn(content, s"""ref("$newName")"""))
      }
    }
    changes
  }

  // ------------------------------------------------------------ model move

  /** move_model (move.py:34-150). `safe = true` leaves the old model as a
    * view over the new one (config stripped to view-compatible keys,
    * `meta.is_tmp_old_copy: true`); `safe = false` deletes the old files.
    * New files are rolled back if any step fails. */
  def moveModel(oldFolder: Path, oldName: String, newFolder: Path,
                newName: String, safe: Boolean = true): Unit = {
    val oldSql = sqlFiles(oldFolder).find(_.getFileName.toString == s"$oldName.sql")
      .getOrElse(throw new IllegalArgumentException(
        s"Couldn't find file $oldName.sql in path $oldFolder"))
    val oldYml = oldSql.resolveSibling(s"$oldName.yml")
    val newSql = newFolder.resolve(s"$newName.sql")
    val newYml = newFolder.resolve(s"$newName.yml")
    Files.createDirectories(newFolder)
    try {
      val sqlContent = Files.readString(oldSql)
      val ymlDoc = SourceYaml.parse(Files.readString(oldYml))
      // new model: same SQL, yml renamed
      Files.writeString(newSql, sqlContent)
      Files.writeString(newYml, SourceYaml.render(withModelName(ymlDoc, newName)))
      if (safe) {
        Files.writeString(oldSql, s"""select * from {{ ref("$newName") }}\n""")
        Files.writeString(oldYml, SourceYaml.render(asViewShim(ymlDoc, oldName)))
      } else {
        Files.deleteIfExists(oldSql)
        Files.deleteIfExists(oldYml)
      }
    } catch {
      case e: Exception =>
        Files.deleteIfExists(newSql)
        Files.deleteIfExists(newYml)
        throw e
    }
  }

  /** Config keys meaningless on the view shim (move.py:88-99). */
  private val ShimStrippedKeys = Seq("full_refresh", "incremental_strategy",
    "on_schema_change", "partition_by", "partition_expiration_days",
    "require_partition_filter", "tags", "post-hook")

  private def withModelName(doc: Node, name: String): Node =
    mapFirstModel(doc)(m => m.updated("name", Scalar(name): Node))

  /** The safe-move shim yml: stripped config, materialized view when it
    * was table/incremental, `meta.is_tmp_old_copy: true`. */
  private def asViewShim(doc: Node, oldName: String): Node =
    mapFirstModel(doc) { m0 =>
      val m = m0.updated("name", Scalar(oldName): Node)
      val cfg0 = m.get("config") match {
        case Some(Mapp(c)) => c
        case _ => ListMap.empty[String, Node]
      }
      val stripped = cfg0.removedAll(ShimStrippedKeys)
      val mat = stripped.get("materialized") match {
        case Some(Scalar(v)) if v == "table" || v == "incremental" => Scalar("view"): Node
        case Some(other) => other
        case None => Scalar("view"): Node
      }
      val meta = stripped.get("meta") match {
        case Some(Mapp(mm)) => Mapp(mm.updated("is_tmp_old_copy", Scalar("true"): Node))
        case _ => Mapp(ListMap("is_tmp_old_copy" -> (Scalar("true"): Node)))
      }
      m.updated("config", Mapp(stripped
        .updated("materialized", mat)
        .updated("meta", meta: Node)): Node)
    }

  private def mapFirstModel(doc: Node)(f: ListMap[String, Node] => ListMap[String, Node]): Node =
    doc match {
      case Mapp(top) => top.get("models") match {
        case Some(Seqq(models)) if models.nonEmpty =>
          val updated = models.head match {
            case Mapp(m) => Mapp(f(m)): Node
            case other => other
          }
          Mapp(top.updated("models", Seqq(updated +: models.tail): Node))
        case _ => doc
      }
      case _ => doc
    }

  // ----------------------------------------------------------------- util

  private def sqlFiles(dir: Path): Seq[Path] =
    if (!Files.isDirectory(dir)) Seq.empty
    else Files.walk(dir).iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.getFileName.toString.endsWith(".sql"))
      .toSeq.sortBy(_.toString)

  private def nameOf(cm: ListMap[String, Node]): String =
    cm.get("name") match { case Some(Scalar(v)) => v; case _ => "" }

  private def str(cm: ListMap[String, Node], key: String): Option[String] =
    cm.get(key).collect { case Scalar(v) => v }
}
