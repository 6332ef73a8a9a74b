package graft.manifest

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import scala.collection.immutable.ListMap
import scala.jdk.CollectionConverters._

/** Source-definition YAML source/sink (S15, dbtwiz/core/project.py:320-361
  * `get_source_tables` + dbtwiz/source/create.py:326-404 `write_source_file`).
  *
  * dbt source files are a narrow YAML dialect — nested maps, lists of maps,
  * plain/quoted scalars, and `|` block descriptions — so the engine carries a
  * ~100-line subset parser instead of a YAML dependency (none in the dep
  * set). The writer emits the same shape the reference's ruamel config does
  * (mapping indent 2, sequence offset 2), so our own files round-trip.
  */
object SourceYaml {

  /** Parsed YAML subset: String | Seq[Node] | ListMap[String, Node]. */
  sealed trait Node
  final case class Scalar(v: String) extends Node
  final case class Seqq(items: Seq[Node]) extends Node
  final case class Mapp(entries: ListMap[String, Node]) extends Node

  final case class SourceDef(name: String, description: String,
                             project: String, dataset: String,
                             tables: Seq[String], file: String)

  // ------------------------------------------------------------------ parse

  private final case class Line(indent: Int, text: String)

  private def lines(s: String): Vector[Line] =
    s.linesIterator.zipWithIndex.collect {
      case (raw, _) if raw.trim.nonEmpty && !raw.trim.startsWith("#") =>
        Line(raw.indexWhere(_ != ' '), raw.trim)
    }.toVector

  def parse(text: String): Node = {
    val ls = lines(text)
    if (ls.isEmpty) Mapp(ListMap.empty) else parseNode(ls, 0)._1
  }

  /** Parse one node starting at ls.head; returns (node, remaining). */
  private def parseNode(ls: Vector[Line], minIndent: Int): (Node, Vector[Line]) =
    if (ls.isEmpty || ls.head.indent < minIndent) (Scalar(""), ls)
    else if (ls.head.text.startsWith("- ") || ls.head.text == "-") parseSeq(ls, ls.head.indent)
    else parseMap(ls, ls.head.indent)

  private def parseSeq(ls0: Vector[Line], indent: Int): (Node, Vector[Line]) = {
    var ls = ls0
    val items = Vector.newBuilder[Node]
    while (ls.nonEmpty && ls.head.indent == indent &&
           (ls.head.text.startsWith("- ") || ls.head.text == "-")) {
      val inline = ls.head.text.drop(1).trim
      // Treat "- key: v" as a map whose first line sits at indent+2.
      val rest = ls.tail
      if (inline.isEmpty) {
        val (n, r) = parseNode(rest, indent + 1)
        items += n; ls = r
      } else if (colonOutsideQuotes(inline) < 0) {
        // plain scalar item (a quoted item may contain colons: "a:b")
        items += Scalar(unquote(inline)); ls = rest
      } else {
        val synthetic = Line(indent + 2, inline) +: rest.takeWhile(_.indent > indent)
        val after = rest.dropWhile(_.indent > indent)
        val (n, _) = parseNode(synthetic, indent + 1)
        items += n; ls = after
      }
    }
    (Seqq(items.result()), ls)
  }

  private def parseMap(ls0: Vector[Line], indent: Int): (Node, Vector[Line]) = {
    var ls = ls0
    var m = ListMap.empty[String, Node]
    while (ls.nonEmpty && ls.head.indent == indent && !ls.head.text.startsWith("- ")) {
      val t = ls.head.text
      val ci = t.indexOf(':')
      require(ci > 0, s"expected 'key: value' line, got: $t")
      val key = unquote(t.take(ci).trim)
      val v = t.drop(ci + 1).trim
      ls = ls.tail
      if (v == "|" || v == "|-") {
        val block = ls.takeWhile(_.indent > indent)
        ls = ls.dropWhile(_.indent > indent)
        m += key -> Scalar(block.map(_.text).mkString("\n"))
      } else if (v.isEmpty) {
        if (ls.nonEmpty && (ls.head.indent > indent ||
            (ls.head.indent >= indent && ls.head.text.startsWith("- ")))) {
          val (n, r) = parseNode(ls, indent)
          m += key -> n; ls = r
        } else m += key -> Scalar("")
      } else if (v == "[]") m += key -> Seqq(Vector.empty)
      else m += key -> Scalar(unquote(v))
    }
    (Mapp(m), ls)
  }

  /** Index of the first ':' not inside a quoted span, or -1. */
  private def colonOutsideQuotes(s: String): Int = {
    var inS = false; var inD = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\'' && !inD) inS = !inS
      else if (c == '"' && !inS) inD = !inD
      else if (c == ':' && !inS && !inD) return i
      i += 1
    }
    -1
  }

  private def unquote(s: String): String =
    if (s.length >= 2 && ((s.head == '"' && s.last == '"') ||
        (s.head == '\'' && s.last == '\''))) s.substring(1, s.length - 1)
    else s

  // ------------------------------------------------------------ read (S15)

  private def str(n: Node, key: String, default: String = ""): String =
    n match {
      case Mapp(m) => m.get(key) match {
        case Some(Scalar(v)) => v
        case _ => default
      }
      case _ => default
    }

  private def seqOf(n: Node, key: String): Seq[Node] = n match {
    case Mapp(m) => m.get(key) match {
      case Some(Seqq(items)) => items
      case _ => Nil
    }
    case _ => Nil
  }

  /** get_source_tables (project.py:320-361): walk `sourcesDir` recursively,
    * returning (sorted "source.table" → description, name-sorted sources). */
  def readSourceTables(sourcesDir: Path): (ListMap[String, String], Seq[SourceDef]) = {
    val files =
      if (!Files.isDirectory(sourcesDir)) Vector.empty
      else Files.walk(sourcesDir).iterator().asScala
        .filter(p => { val n = p.getFileName.toString
          n.endsWith(".yml") || n.endsWith(".yaml") })
        .toVector.sortBy(_.toString)
    val tableDesc = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val sources = Vector.newBuilder[SourceDef]
    for (f <- files) {
      val doc = parse(new String(Files.readAllBytes(f), StandardCharsets.UTF_8))
      for (src <- seqOf(doc, "sources")) {
        val name = str(src, "name")
        val tables = seqOf(src, "tables")
        tables.foreach(t => tableDesc(s"$name.${str(t, "name")}") = str(t, "description"))
        sources += SourceDef(name, str(src, "description"),
          str(src, "database"), str(src, "schema"),
          tables.map(str(_, "name")), f.toString)
      }
    }
    (ListMap.from(tableDesc.toSeq.sortBy(_._1)), sources.result().sortBy(_.name))
  }

  // ----------------------------------------------------------- write (S15)

  final case class NewTable(name: String, description: String,
                            columns: Seq[(String, String)])

  /** write_source_file (source/create.py:326-404): create the file if
    * missing, find-or-create the named source entry, and append one table
    * entry per `tables` element (with columns when provided). Existing
    * entries are preserved (parse → merge → re-render). */
  def writeSourceFile(file: Path, sourceName: String, sourceDescription: String,
                      project: String, dataset: String,
                      tables: Seq[NewTable]): Unit = {
    val doc = if (Files.exists(file))
      parse(new String(Files.readAllBytes(file), StandardCharsets.UTF_8))
    else Mapp(ListMap("version" -> Scalar("2"), "sources" -> Seqq(Vector.empty)))
    val existing = doc match {
      case Mapp(m) => m.get("sources") match {
        case Some(Seqq(items)) => items
        case _ => Vector.empty[Node]
      }
      case _ => Vector.empty[Node]
    }
    val tableNodes = tables.map { t =>
      val base = ListMap("name" -> (Scalar(t.name): Node),
        "description" -> (Scalar(t.description): Node))
      Mapp(if (t.columns.isEmpty) base else base + ("columns" ->
        Seqq(t.columns.map { case (c, d) =>
          Mapp(ListMap("name" -> (Scalar(c): Node),
            "description" -> (Scalar(d): Node))) })))
    }
    val merged: Seq[Node] =
      if (existing.exists(str(_, "name") == sourceName))
        existing.map {
          case s if str(s, "name") == sourceName =>
            val Mapp(m) = s: @unchecked
            val prior = seqOf(s, "tables")
            Mapp(m + ("tables" -> Seqq(prior ++ tableNodes)))
          case s => s
        }
      else existing :+ Mapp(ListMap(
        "name" -> (Scalar(sourceName): Node),
        "database" -> (Scalar(project): Node),
        "schema" -> (Scalar(dataset): Node),
        "description" -> (Scalar(sourceDescription): Node),
        "tables" -> (Seqq(tableNodes): Node)))
    val out = Mapp(ListMap("version" -> Scalar("2"), "sources" -> Seqq(merged)))
    Files.createDirectories(file.getParent)
    Files.write(file, render(out).getBytes(StandardCharsets.UTF_8))
  }

  // ---------------------------------------------------------------- render

  /** Render with the reference's ruamel config: mapping indent 2, sequence
    * indent 4 / offset 2; multiline descriptions as `|` blocks. */
  def render(node: Node): String = {
    val sb = new StringBuilder
    def scalarOut(v: String, indent: Int): String =
      if (v.contains("\n"))
        "|\n" + v.linesIterator.map(" " * (indent + 2) + _).mkString("\n")
      else if (v.isEmpty) "''"
      else if (v.exists(c => ":#{}[]".contains(c)) || v != v.trim) s"'${v.replace("'", "''")}'"
      else v
    def walk(n: Node, indent: Int): Unit = n match {
      case Mapp(m) => m.foreach { case (k, v) =>
        v match {
          case Scalar(s) =>
            sb.append(" " * indent).append(k).append(": ")
              .append(scalarOut(s, indent)).append("\n")
          case Seqq(items) if items.isEmpty =>
            sb.append(" " * indent).append(k).append(": []\n")
          case _ =>
            sb.append(" " * indent).append(k).append(":\n")
            walk(v, indent + 2)
        }
      }
      case Seqq(items) => items.foreach { item =>
        item match {
          case Mapp(m) if m.nonEmpty =>
            val (k0, v0) = m.head
            v0 match {
              case Scalar(s) =>
                sb.append(" " * indent).append("- ").append(k0).append(": ")
                  .append(scalarOut(s, indent + 2)).append("\n")
              case _ =>
                sb.append(" " * indent).append("- ").append(k0).append(":\n")
                walk(v0, indent + 4)
            }
            walk(Mapp(m.tail), indent + 2)
          case other =>
            sb.append(" " * indent).append("- ")
            other match {
              case Scalar(s) => sb.append(scalarOut(s, indent)).append("\n")
              case _ => sb.append("\n"); walk(other, indent + 2)
            }
        }
      }
      case Scalar(s) => sb.append(" " * indent).append(scalarOut(s, indent)).append("\n")
    }
    walk(node, 0)
    sb.toString
  }
}
