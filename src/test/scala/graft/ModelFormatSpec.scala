package graft

import java.nio.file.{Files, Path, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.admin.ModelFormat

/** Model format flow (model/format.py:9-37): file selection semantics
  * (staged ∪ named-model globs, set-union, no-op on empty) and the
  * normalizer's contract (idempotent whitespace canonicalization). */
class ModelFormatSpec extends AnyFunSuite {

  private def tree(): Path = {
    val root = Files.createTempDirectory("graft_fmt")
    def w(rel: String, text: String): Unit = {
      val p = root.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.write(p, text.getBytes("UTF-8"))
    }
    w("models/core/orders.sql", "select 1\n")
    w("models/core/orders.yml", "version: 2\n")
    w("models/marts/orders.sql", "select 2\n") // same name, different dir
    w("models/marts/daily.sql", "select 3\n")
    w("macros/util.sql", "select 4\n")
    root
  }

  test("selection unions staged files with named-model globs, deduplicated") {
    val root = tree()
    val staged = Seq(Paths.get("macros/util.sql"), Paths.get("models/marts/daily.sql"))
    // 'orders' matches BOTH models/core and models/marts; 'daily' is also
    // staged — the union must not double it (format.py:24 set union)
    val got = ModelFormat.filesToFormat(root, staged, Seq("orders", "daily"))
    assert(got.map(_.toString) === Seq(
      "macros/util.sql", "models/core/orders.sql",
      "models/marts/daily.sql", "models/marts/orders.sql"))
    // yml files never selected; unknown names contribute nothing
    assert(ModelFormat.filesToFormat(root, Nil, Seq("nope")) === Nil)
  }

  test("normalizeSql canonicalizes whitespace and is idempotent") {
    val messy = "SELECT *   \r\nFROM t\t \n\n\n\n  \tindented\n"
    val once = ModelFormat.normalizeSql(messy)
    assert(once === "SELECT *\nFROM t\n\n      indented\n")
    assert(ModelFormat.normalizeSql(once) === once)
    // missing trailing newline is added; lone newline content preserved
    assert(ModelFormat.normalizeSql("select 1") === "select 1\n")
  }

  test("formatFiles rewrites only files that change; empty selection no-op") {
    val root = tree()
    Files.write(root.resolve("models/marts/daily.sql"),
      "select 3   \n\n\n\nfrom x".getBytes("UTF-8"))
    val (sel, rewritten) = ModelFormat.formatFiles(root, Nil, Seq("daily", "orders"))
    assert(sel.size === 3 && rewritten.map(_.toString) === Seq("models/marts/daily.sql"))
    val after = new String(Files.readAllBytes(root.resolve("models/marts/daily.sql")), "UTF-8")
    assert(after === "select 3\n\nfrom x\n")
    // second run: nothing left to rewrite (idempotence end to end)
    assert(ModelFormat.formatFiles(root, Nil, Seq("daily", "orders"))._2 === Nil)
    assert(ModelFormat.formatFiles(root, Nil, Nil) === ((Nil, Nil)))
  }
}
