package graft.config

import java.nio.file.{Files, Path}
import scala.collection.immutable.ListMap

/** Minimal TOML subset parser covering the reference's pyproject.toml
  * shapes (config/project.py:36-292): `[dotted.section]` headers,
  * `key = value` with string / integer / boolean / homogeneous array /
  * inline-table values, and `#` comments. Not a general TOML parser —
  * exactly the grammar the project config uses, kept dependency-free.
  */
object Toml {

  sealed trait Value
  final case class Str(v: String) extends Value
  final case class Num(v: Long) extends Value
  final case class Dbl(v: Double) extends Value
  final case class Bool(v: Boolean) extends Value
  final case class Arr(items: Seq[Value]) extends Value
  final case class Tbl(entries: ListMap[String, Value]) extends Value

  def parse(text: String): Tbl = {
    var root = Tbl(ListMap.empty)
    var section: Seq[String] = Nil
    joinMultiline(text.linesIterator.map(stripComment).map(_.trim).filter(_.nonEmpty))
      .foreach { line =>
        if (line.startsWith("[") && line.endsWith("]"))
          section = line.substring(1, line.length - 1).trim.split("\\.").toSeq.map(unquoteKey)
        else {
          val eq = line.indexOf('=')
          require(eq > 0, s"expected 'key = value' line, got: $line")
          val key = unquoteKey(line.take(eq).trim)
          root = insert(root, section :+ key, parseValue(line.drop(eq + 1).trim))
        }
      }
    root
  }

  /** Join lines whose brackets are unbalanced (outside quotes) — the
    * standard multi-line array/inline-table layout tools emit. */
  private def joinMultiline(lines: Iterator[String]): Iterator[String] = {
    def imbalance(s: String): Int = {
      var inS = false; var inD = false; var d = 0
      s.foreach { c =>
        if (c == '\'' && !inD) inS = !inS
        else if (c == '"' && !inS) inD = !inD
        else if (!inS && !inD) {
          if (c == '[' || c == '{') d += 1
          else if (c == ']' || c == '}') d -= 1
        }
      }
      d
    }
    new Iterator[String] {
      def hasNext: Boolean = lines.hasNext
      def next(): String = {
        var acc = lines.next()
        while (imbalance(acc) > 0 && lines.hasNext) acc = acc + " " + lines.next()
        acc
      }
    }
  }

  /** `table.get("tool").get("dbtwiz")`-style path lookup. */
  def at(t: Tbl, path: String*): Option[Value] =
    path.foldLeft(Option[Value](t)) {
      case (Some(Tbl(m)), k) => m.get(k)
      case _ => None
    }

  def str(v: Option[Value]): Option[String] = v.collect { case Str(s) => s }
  def num(v: Option[Value]): Option[Long] = v.collect { case Num(n) => n }
  def strings(v: Option[Value]): Seq[String] =
    v.collect { case Arr(items) => items.collect { case Str(s) => s } }.getOrElse(Nil)

  private def stripComment(line: String): String = {
    var inS = false; var inD = false
    val i = line.indexWhere { c =>
      if (c == '\'' && !inD) inS = !inS
      else if (c == '"' && !inS) inD = !inD
      c == '#' && !inS && !inD
    }
    if (i < 0) line else line.take(i)
  }

  private def unquoteKey(s: String): String =
    if (s.length >= 2 && ((s.head == '"' && s.last == '"') ||
        (s.head == '\'' && s.last == '\''))) s.substring(1, s.length - 1)
    else s

  private def insert(t: Tbl, path: Seq[String], v: Value): Tbl = path match {
    case Seq(last) => Tbl(t.entries.updated(last, v))
    case head +: rest =>
      val child = t.entries.get(head) match {
        case Some(c: Tbl) => c
        case _ => Tbl(ListMap.empty)
      }
      Tbl(t.entries.updated(head, insert(child, rest, v)))
    case _ => t
  }

  private[config] def parseValue(s: String): Value = s match {
    case "true" => Bool(true)
    case "false" => Bool(false)
    case _ if s.startsWith("\"") || s.startsWith("'") => Str(unquoteKey(s))
    case _ if s.startsWith("[") =>
      Arr(splitTop(s.substring(1, s.length - 1)).map(parseValue))
    case _ if s.startsWith("{") =>
      Tbl(ListMap.from(splitTop(s.substring(1, s.length - 1)).map { kv =>
        val eq = kv.indexOf('=')
        unquoteKey(kv.take(eq).trim) -> parseValue(kv.drop(eq + 1).trim)
      }))
    case _ =>
      try Num(s.toLong)
      catch {
        case _: NumberFormatException =>
          try Dbl(s.toDouble)
          catch {
            case _: NumberFormatException =>
              // an unquoted bare word — surface a parse diagnostic, not a
              // bare NumberFormatException with no context
              throw new IllegalArgumentException(
                s"unparseable TOML value (missing quotes?): $s")
          }
      }
  }

  /** Split on top-level commas (quotes and nesting respected). */
  private def splitTop(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0; var inS = false; var inD = false; var start = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\'' && !inD) inS = !inS
      else if (c == '"' && !inS) inD = !inD
      else if (!inS && !inD) {
        if (c == '[' || c == '{') depth += 1
        else if (c == ']' || c == '}') depth -= 1
        else if (c == ',' && depth == 0) { out += s.substring(start, i); start = i + 1 }
      }
      i += 1
    }
    if (s.substring(start).trim.nonEmpty) out += s.substring(start)
    out.result().map(_.trim)
  }
}

/** One declared model layer: `[tool.dbtwiz.project.layers]` entry
  * (config/project.py:120-133, 181-212). */
final case class Layer(name: String, folder: String, abbreviation: String,
                       description: Option[String]) {
  /** layer_choices() fallback (core/project.py:253-268). */
  def choiceDescription: String =
    description.getOrElse(s"${name.capitalize} layer")
}

/** `[tool.dbtwiz.project]` settings (config/project.py:36-138), validated
  * like the reference's pydantic model: batch size bounded 1-365,
  * materialization restricted to the known four. Unknown keys are kept in
  * `raw` (the reference exposes them via `__getattr__`). */
final case class ProjectSettings(
    backfillDefaultBatchSize: Int,
    defaultMaterialization: String,
    defaultPartitionExpirationDays: Option[Int],
    teams: Seq[String],
    accessPolicies: Seq[String],
    serviceConsumers: Seq[String],
    grantsSkipSchemas: Seq[String],
    grantsOpenAccessGroup: Option[String],
    grantsRole: String,
    layers: Seq[Layer],
    raw: ListMap[String, Toml.Value]) {

  /** layer_details(): name → (folder, abbreviation); fails like the
    * reference when the layers table is absent (config/project.py:185-205). */
  def layerDetails: ListMap[String, (String, String)] = {
    require(layers.nonEmpty,
      "Missing [tool.dbtwiz.project.layers] in pyproject.toml: declare each " +
        "layer with its folder and abbreviation")
    ListMap.from(layers.map(l => l.name -> (l.folder, l.abbreviation)))
  }

  /** Raw string setting by its TOML key (reference `__getattr__` analog). */
  def setting(key: String): Option[String] = Toml.str(raw.get(key))

  /** source_reader_service_accounts: SA email → purpose description
    * (config/project.py:113-117). */
  def sourceReaderServiceAccounts: ListMap[String, String] =
    raw.get("source_reader_service_accounts") match {
      case Some(Toml.Tbl(m)) =>
        m.collect { case (k, Toml.Str(v)) => k -> v }
      case _ => ListMap.empty
    }

  /** source_reader_unchecked_projects: projects where the SA read-access
    * check is skipped (config/project.py:118-122). */
  def sourceReaderUncheckedProjects: Seq[String] =
    Toml.strings(raw.get("source_reader_unchecked_projects"))
}

object ProjectConfig {

  val ValidMaterializations = Set("table", "view", "incremental", "ephemeral")

  /** Search upward from `start` for the directory holding pyproject.toml
    * (config/project.py:219-229). */
  def findRoot(start: Path): Path = {
    var p: Path = start.toAbsolutePath
    while (p != null && !Files.exists(p.resolve("pyproject.toml"))) p = p.getParent
    require(p != null, "No pyproject.toml file found in current or upstream directories.")
    p
  }

  /** Load + validate `[tool.dbtwiz.project]` (config/project.py:36-292). */
  def load(root: Path): ProjectSettings = {
    val doc = Toml.parse(Files.readString(root.resolve("pyproject.toml")))
    val proj = Toml.at(doc, "tool", "dbtwiz", "project") match {
      case Some(t: Toml.Tbl) => t
      case _ => Toml.Tbl(ListMap.empty)
    }
    def get(k: String) = proj.entries.get(k)
    val batch = Toml.num(get("backfill_default_batch_size")).map(_.toInt).getOrElse(30)
    require(batch >= 1 && batch <= 365, s"batch_size must be between 1 and 365: $batch")
    val mat = Toml.str(get("default_materialization")).getOrElse("table")
    require(ValidMaterializations(mat),
      s"materialization must be one of ${ValidMaterializations.toSeq.sorted.mkString(", ")}: $mat")
    val expDays = Toml.num(get("default_partition_expiration_days")).map(_.toInt)
    expDays.foreach(d => require(d >= 1, s"default_partition_expiration_days must be >= 1: $d"))
    val layers = Toml.at(doc, "tool", "dbtwiz", "project", "layers") match {
      case Some(Toml.Tbl(m)) =>
        m.toSeq.map {
          case (name, Toml.Tbl(entry)) =>
            val folder = Toml.str(entry.get("folder"))
            val abbr = Toml.str(entry.get("abbreviation"))
            require(folder.isDefined && abbr.isDefined,
              s"Layer '$name' in [tool.dbtwiz.project.layers] is missing required " +
                s"field(s): ${Seq("folder" -> folder, "abbreviation" -> abbr).collect { case (k, None) => k }.mkString(", ")}")
            Layer(name, folder.get, abbr.get, Toml.str(entry.get("description")))
          case (name, _) =>
            throw new IllegalArgumentException(s"Layer '$name' must be an inline table")
        }
      case _ => Nil
    }
    ProjectSettings(
      backfillDefaultBatchSize = batch,
      defaultMaterialization = mat,
      defaultPartitionExpirationDays = expDays.orElse(Some(365)),
      teams = Toml.strings(get("teams")),
      accessPolicies = Toml.strings(get("access_policies")),
      serviceConsumers = Toml.strings(get("service_consumers")),
      grantsSkipSchemas = Toml.strings(get("grants_skip_schemas")),
      grantsOpenAccessGroup = Toml.str(get("grants_open_access_group")),
      grantsRole = Toml.str(get("grants_role")).getOrElse("roles/bigquery.dataViewer"),
      layers = layers,
      raw = proj.entries)
  }
}
