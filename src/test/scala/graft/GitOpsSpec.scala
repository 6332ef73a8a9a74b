package graft

import java.nio.file.{Files, Path}
import org.scalatest.funsuite.AnyFunSuite
import scala.sys.process._
import graft.admin.GitOps

/** P8 — git seams (utils/git.py:8-50, dbt/support.py:6-26) and the
  * deleted/renamed model-file log parser (admin/cleanup.py:104-206). */
class GitOpsSpec extends AnyFunSuite {

  private def sh(repo: Path, cmd: String*): Unit =
    assert(Process(cmd, repo.toFile).!(ProcessLogger(_ => ())) === 0, cmd.mkString(" "))

  private def freshRepo(): Path = {
    val dir = Files.createTempDirectory("graft_git")
    sh(dir, "git", "init", "-q")
    sh(dir, "git", "config", "user.email", "test@example.com")
    sh(dir, "git", "config", "user.name", "Test Person")
    dir
  }

  private def write(repo: Path, rel: String, text: String): Unit = {
    val p = repo.resolve(rel)
    Files.createDirectories(p.getParent)
    Files.write(p, text.getBytes("UTF-8"))
  }

  test("stagedFiles keeps staged A/M under folders with matching suffix") {
    val repo = freshRepo()
    write(repo, "models/core/orders.sql", "select 1")
    write(repo, "models/core/orders.yml", "version: 2")
    write(repo, "macros/util.sql", "select 2")
    write(repo, "docs/readme.md", "x")
    sh(repo, "git", "add", "models", "macros", "docs")
    val got = GitOps.stagedFiles(repo, Set("models"), Set(".sql", ".yml"))
    assert(got.map(_.toString).sorted ===
      Seq("models/core/orders.sql", "models/core/orders.yml"))
    // unstaged modifications are not included
    sh(repo, "git", "commit", "-qm", "init")
    write(repo, "models/core/orders.sql", "select 99")
    assert(GitOps.stagedFiles(repo, Set("models"), Set(".sql")) === Nil)
  }

  test("modelsWithLocalChanges maps staged model paths to names") {
    val repo = freshRepo()
    write(repo, "models/core/orders.sql", "select 1")
    write(repo, "models/core/ignored.txt", "x")
    sh(repo, "git", "add", ".")
    val names = GitOps.modelsWithLocalChanges(repo,
      Map("models/core/orders.sql" -> "mrt_core__orders"))
    assert(names === Seq("mrt_core__orders"))
  }

  test("deletedModelFiles attributes deletions and renames from real git log") {
    val repo = freshRepo()
    write(repo, "models/core/doomed.sql", "select 1")
    write(repo, "models/core/moving.sql", "select 2")
    sh(repo, "git", "add", ".")
    sh(repo, "git", "commit", "-qm", "add models")
    sh(repo, "git", "rm", "-q", "models/core/doomed.sql")
    sh(repo, "git", "commit", "-qm", "drop doomed")
    sh(repo, "git", "mv", "models/core/moving.sql", "models/core/moved.sql")
    sh(repo, "git", "commit", "-qm", "rename moving")
    val dels = GitOps.deletedModelFiles(repo, "models")
    val deleted = dels.filter(_.changeType == "deleted")
    assert(deleted.map(_.file) === Seq("models/core/doomed.sql"))
    assert(deleted.head.author === "Test Person")
    assert(deleted.head.message === "drop doomed")
    val renamed = dels.filter(_.changeType == "renamed")
    assert(renamed.map(d => (d.file, d.renamedTo)) ===
      Seq(("models/core/moving.sql", Some("models/core/moved.sql"))))
  }

  test("commitUrl renders github links from ssh and https remotes (cleanup.py:233-261)") {
    val id = "abc123def"
    // pure half: both remote forms, with and without .git
    assert(GitOps.commitUrlFor("git@github.com:acme/warehouse.git", id) ===
      Some(s"https://github.com/acme/warehouse/commit/$id"))
    assert(GitOps.commitUrlFor("https://github.com/acme/warehouse", id) ===
      Some(s"https://github.com/acme/warehouse/commit/$id"))
    assert(GitOps.commitUrlFor("https://github.com/acme/warehouse.git", id) ===
      Some(s"https://github.com/acme/warehouse/commit/$id"))
    // .git stripped as suffix only, not mid-name
    assert(GitOps.commitUrlFor("git@github.com:acme/my.github.tools.git", id) ===
      Some(s"https://github.com/acme/my.github.tools/commit/$id"))
    // non-github or malformed remotes yield None, not a bogus URL
    assert(GitOps.commitUrlFor("git@gitlab.com:acme/warehouse.git", id) === None)
    assert(GitOps.commitUrlFor("https://github.com/just-owner", id) === None)
    // extra path segments are malformed — None, never …/repo/tree/commit/…
    assert(GitOps.commitUrlFor("https://github.com/acme/warehouse/tree", id) === None)
    assert(GitOps.commitUrlFor("git@github.com:acme/warehouse/extra.git", id) === None)
    // a bare trailing slash normalizes instead of rendering …/repo//commit/…
    assert(GitOps.commitUrlFor("https://github.com/acme/warehouse/", id) ===
      Some(s"https://github.com/acme/warehouse/commit/$id"))
    // subprocess half against real repos: ssh-form remote, then no remote
    val repo = freshRepo()
    sh(repo, "git", "remote", "add", "origin", "git@github.com:acme/warehouse.git")
    assert(GitOps.commitUrl(repo, id) ===
      Some(s"https://github.com/acme/warehouse/commit/$id"))
    val bare = freshRepo()
    assert(GitOps.commitUrl(bare, id) === None)
  }

  test("parseGitLog handles both rename formats and attribution (pure)") {
    val text =
      """commit abc123
        |Author: Jo Dev <jo@example.com>
        |Date: Mon Jul 7 10:00:00 2025
        |
        |tidy models
        |
        | rename models/core/{old.sql => new.sql} (90%)
        | delete mode 100644 models/core/gone.sql
        |commit def456
        |Author: Sam Dev <sam@example.com>
        |Date: Tue Jul 8 11:00:00 2025
        |
        |move across dirs
        |
        | rename from models/a/x.sql
        | rename to models/b/x.sql
        |""".stripMargin
    val got = GitOps.parseGitLog(text)
    assert(got(0).file === "models/core/old.sql")
    assert(got(0).renamedTo === Some("models/core/new.sql"))
    assert(got(0).author === "Jo Dev" && got(0).message === "tidy models")
    assert(got(1).file === "models/core/gone.sql" && got(1).changeType === "deleted")
    assert(got(1).commit === "abc123")
    assert(got(2).file === "models/a/x.sql")
    assert(got(2).renamedTo === Some("models/b/x.sql"))
    assert(got(2).author === "Sam Dev")
  }

  test("deletions feed matchDeletedFiles (cleanup enrichment end to end)") {
    val orphans = Seq(("mart", "orders"), ("mart", "untracked"))
    // file stem of each GitDeletion.file is the model name (cleanup.py:209-219)
    val deletionNames = Seq("models/mart/mrt_sales__orders.sql", "models/x/other.sql")
      .map(p => p.split("/").last.stripSuffix(".sql"))
    val matched = graft.admin.Admin.matchDeletedFiles(orphans, deletionNames)
    assert(matched(("mart", "orders")) === Seq("mrt_sales__orders"))
    assert(matched(("mart", "untracked")) === Nil)
  }
}
