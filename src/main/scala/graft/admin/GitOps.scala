package graft.admin

import java.nio.file.{Files, Path, Paths}
import scala.sys.process._

/** Git seam for the orchestrator (P8, dbtwiz/utils/git.py:8-50,
  * dbt/support.py:6-26) and the orphan-cleanup enrichment parser
  * (dbtwiz/admin/cleanup.py:104-206).
  *
  * Subprocess calls are isolated here; the log parser is pure so the
  * pipeline from `git log` text to [[Admin.matchDeletedFiles]] input is
  * unit-testable without a repository.
  */
object GitOps {

  final case class GitDeletion(file: String, commit: String, timestamp: String,
                               author: String, message: String,
                               changeType: String, renamedTo: Option[String])

  private def run(repo: Path, cmd: String*): Option[String] = {
    val out = new StringBuilder
    val code = Process(cmd, repo.toFile) ! ProcessLogger(l => out.append(l).append('\n'), _ => ())
    if (code == 0) Some(out.toString) else None
  }

  /** get_staged_files (git.py:8-50): staged A/M files under the given
    * top-level folders with the given suffixes. */
  def stagedFiles(repo: Path, folders: Set[String], fileTypes: Set[String]): Seq[Path] =
    run(repo, "git", "status", "--short", "--untracked-files=no",
        "--no-ahead-behind", "--no-renames")
      .map(parseStatus(_, folders, fileTypes)).getOrElse(Nil)

  /** Pure parser for `git status --short` output. */
  def parseStatus(statusText: String, folders: Set[String],
                  fileTypes: Set[String]): Seq[Path] =
    statusText.linesIterator.flatMap { line =>
      val parts = line.split(" ")
      val staged = parts.headOption.getOrElse("")
      val filename = parts.lastOption.getOrElse("")
      val p = Paths.get(filename)
      val suffix = {
        val n = p.getFileName.toString
        val i = n.lastIndexOf('.')
        if (i >= 0) n.substring(i) else ""
      }
      if ((staged == "A" || staged == "M") && p.getNameCount > 0 &&
          folders.contains(p.getName(0).toString) && fileTypes.contains(suffix))
        Some(p)
      else None
    }.toSeq

  /** models_with_local_changes (support.py:6-26): staged/modified model
    * .sql paths mapped to model names via the manifest path index. */
  def modelsWithLocalChanges(repo: Path, nameByPath: Map[String, String]): Seq[String] =
    run(repo, "git", "status", "--porcelain").map {
      _.linesIterator.flatMap { line =>
        val parts = line.split(" ")
        val stage = parts.headOption.getOrElse("")
        val path = parts.lastOption.getOrElse("")
        if ((stage == "A" || stage == "M") && path.startsWith("models") &&
            path.endsWith(".sql")) nameByPath.get(path)
        else None
      }.toSeq
    }.getOrElse(Nil)

  /** Deleted/renamed model files with commit/author/date attribution
    * (cleanup.py:104-206). Runs `git log --diff-filter=DR --summary` over
    * `modelsPath` and parses the summary lines. */
  def deletedModelFiles(repo: Path, modelsPath: String): Seq[GitDeletion] =
    run(repo, "git", "log", "--diff-filter=DR", "--summary",
        "--pretty=format:commit %H%nAuthor: %an <%ae>%nDate: %ad%n%n%s%n",
        modelsPath)
      .map(parseGitLog).getOrElse(Nil)

  /** GitHub commit URL for the repo's `origin` remote
    * (cleanup.py:233-261): the link a user pastes into a ticket next to
    * an orphaned table's deleting commit. None when there is no origin
    * or it isn't github.com. */
  def commitUrl(repo: Path, commitId: String): Option[String] =
    run(repo, "git", "config", "--get", "remote.origin.url")
      .map(_.trim).flatMap(commitUrlFor(_, commitId))

  /** Pure half of [[commitUrl]]: render the URL from a remote in either
    * the ssh (`git@github.com:owner/repo.git`) or https
    * (`https://github.com/owner/repo[.git]`) form. The `.git` suffix is
    * stripped as a SUFFIX only (the reference's `replace(".git", "")`
    * would also mangle a repo named `my.github.tools`). */
  def commitUrlFor(remoteUrl: String, commitId: String): Option[String] = {
    val path =
      if (remoteUrl.startsWith("git@github.com:"))
        Some(remoteUrl.stripPrefix("git@github.com:"))
      else if (remoteUrl.startsWith("https://github.com/"))
        Some(remoteUrl.stripPrefix("https://github.com/"))
      else None
    // split WITHOUT a limit: a remote with extra path segments
    // (…/owner/repo/tree) must be rejected, not rendered into a malformed
    // …/repo/tree/commit/… URL. Exactly two non-empty segments or
    // nothing; a bare trailing slash normalizes (split drops trailing
    // empty segments) instead of producing …/repo//commit/….
    path.map(_.stripSuffix(".git")).flatMap { p =>
      p.split("/") match {
        case Array(owner, repo) if owner.nonEmpty && repo.nonEmpty =>
          Some(s"https://github.com/$owner/$repo/commit/$commitId")
        case _ => None
      }
    }
  }

  /** Pure parser for the log format above: `delete mode` entries become
    * `deleted`; both rename formats (`rename path/{old => new}` and
    * `rename from`/`rename to` pairs) become `renamed`. */
  def parseGitLog(logText: String): Seq[GitDeletion] = {
    var commit = ""; var author = ""; var date = ""; var message: String = null
    var renameFrom: Option[String] = None
    val out = Vector.newBuilder[GitDeletion]
    for (line <- logText.linesIterator) {
      val t = line.trim
      if (line.startsWith("commit ")) {
        commit = line.split(" ")(1); author = ""; date = ""; message = null
        renameFrom = None
      } else if (line.startsWith("Author:")) {
        author = line.stripPrefix("Author:").trim.split(" <").head
      } else if (line.startsWith("Date:")) {
        date = line.stripPrefix("Date:").trim
      } else if (message == null && t.nonEmpty) {
        message = t
      } else if (t.contains("delete mode")) {
        out += GitDeletion(t.split(" ").last, commit, date, author,
          Option(message).getOrElse(""), "deleted", None)
      } else if (t.startsWith("rename from ")) {
        renameFrom = Some(t.stripPrefix("rename from ").trim)
      } else if (t.startsWith("rename to ") && renameFrom.isDefined) {
        out += GitDeletion(renameFrom.get, commit, date, author,
          Option(message).getOrElse(""), "renamed",
          Some(t.stripPrefix("rename to ").trim))
        renameFrom = None
      } else if (t.startsWith("rename ") && t.contains("=>")) {
        // `rename models/{a.sql => b.sql} (90%)` or `rename a.sql => b.sql (90%)`
        val Array(oldPart, newPart0) = t.split("=>", 2).map(_.trim)
        val newPart = newPart0.replaceAll("\\s*\\(\\d+%\\)$", "")
        val (oldFile, newFile) =
          if (oldPart.contains("{")) {
            val prefix = oldPart.split("\\{").head.stripPrefix("rename").trim
            val oldName = oldPart.split("\\{")(1).trim
            (prefix + oldName, prefix + newPart.takeWhile(_ != '}').trim)
          } else (oldPart.stripPrefix("rename").trim, newPart)
        out += GitDeletion(oldFile, commit, date, author,
          Option(message).getOrElse(""), "renamed", Some(newFile))
      }
    }
    out.result()
  }
}
