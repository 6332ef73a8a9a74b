package graft.admin

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** Model format flow (dbtwiz/model/format.py:9-37): select the SQL files
  * to format — staged files under the dbt folders, unioned with
  * `models/**/<name>.sql` glob matches for explicitly named models — and
  * normalize them in place.
  *
  * The reference shells out to sqlfmt + sqlfluff; those are external
  * tools, not relational semantics, so the SELECTION logic is ported
  * exactly (folder filter, suffix filter, set-union, "no files" no-op)
  * while the rewrite step is [[normalizeSql]] — a deterministic
  * whitespace canonicalizer standing in for the external formatter (the
  * same honest-stub contract as `Multimodal.MediaCodec`'s opaque
  * fallback: the flow,
  * selection, and idempotence are real and tested; the full sqlfmt style
  * engine is out of scope per README).
  */
object ModelFormat {

  /** format.py:19-21's folder/suffix universe. */
  val SqlFolders: Set[String] = Set("models", "macros", "tests", "seeds", "analyses")
  val SqlSuffix = ".sql"

  /** File selection (format.py:15-27): staged SQL files (already
    * folder/suffix-filtered via [[GitOps.stagedFiles]]) unioned with
    * recursive `models/**/<name>.sql` matches per named model —
    * duplicates collapse, order is stable (sorted) for deterministic
    * processing. */
  def filesToFormat(root: Path, staged: Seq[Path],
                    modelNames: Seq[String]): Seq[Path] = {
    val byName = modelNames.flatMap { name =>
      val modelsDir = root.resolve("models")
      if (!Files.isDirectory(modelsDir)) Nil
      else {
        val stream = Files.walk(modelsDir)
        try stream.iterator().asScala
          .filter(p => Files.isRegularFile(p) &&
            p.getFileName.toString == s"$name$SqlSuffix")
          .map(root.relativize)
          .toSeq
        finally stream.close()
      }
    }
    (staged ++ byName).distinct.sortBy(_.toString)
  }

  /** Deterministic SQL whitespace canonicalization: CRLF→LF, trailing
    * whitespace stripped, consecutive blank lines collapsed to one, tabs
    * in indentation expanded to 4 spaces, exactly one trailing newline.
    * Idempotent: normalize(normalize(s)) == normalize(s). */
  def normalizeSql(text: String): String = {
    val lines = text.replace("\r\n", "\n").split("\n", -1).toSeq
      .map { l =>
        val noTrail = l.replaceAll("\\s+$", "")
        val indent = noTrail.takeWhile(c => c == ' ' || c == '\t')
          .flatMap { case '\t' => "    "; case c => c.toString }
        indent + noTrail.dropWhile(c => c == ' ' || c == '\t')
      }
    val collapsed = lines.foldLeft(Vector.empty[String]) { (acc, l) =>
      if (l.isEmpty && acc.takeRight(1).exists(_.isEmpty)) acc else acc :+ l
    }
    collapsed.mkString("\n").stripLineEnd + "\n"
  }

  /** Run the flow: select, normalize in place, report what changed.
    * Returns (selected, rewritten) — empty selection is a no-op, as in
    * the reference's early return (format.py:25-27). */
  def formatFiles(root: Path, staged: Seq[Path],
                  modelNames: Seq[String]): (Seq[Path], Seq[Path]) = {
    val files = filesToFormat(root, staged, modelNames)
    val rewritten = files.filter { rel =>
      val p = root.resolve(rel.toString)
      val before = new String(Files.readAllBytes(p),
        java.nio.charset.StandardCharsets.UTF_8)
      val after = normalizeSql(before)
      if (after != before) {
        Files.write(p, after.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        true
      } else false
    }
    (files, rewritten)
  }
}
