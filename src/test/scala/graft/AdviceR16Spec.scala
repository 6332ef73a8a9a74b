package graft

import java.nio.file.{Files, Path}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.{TableMeta, Warehouse}
import graft.sql.GraftCatalog

/** Round-15 advisory fixes, each spec-gated so it can't silently regress:
  *
  *  1. `INSERT OVERWRITE t PARTITION (p='v')` with an EMPTY source query
  *     truncates the named partition (SQL static-overwrite semantics) —
  *     the dynamic route made it a silent no-op;
  *  2. a function-call column DEFAULT (`upper('x')`, `current_date()`)
  *     folds to a literal at declaration, so catalog loadTable (hence
  *     every SQL read of the table) keeps working — and the write
  *     default pins the DECLARATION-time value (initial-default
  *     semantics), not a per-read re-evaluation;
  *  3. time travel over a VIEW refuses loudly on both the VERSION and
  *     TIMESTAMP overloads instead of serving an empty frame from the
  *     view's entry-less commits;
  *  4. SHOW VIEWS patterns are LIKE patterns ('*' wildcard, '|'
  *     alternation, everything else literal) — regex metacharacters in
  *     the pattern no longer throw.
  */
class AdviceR16Spec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private def freshRoot(): Path = Files.createTempDirectory("advice_r16")

  private def mountCatalog(name: String, root: String): Warehouse = {
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    new Warehouse(spark, root)
  }

  test("static-partition OVERWRITE with an empty source truncates the partition") {
    val wh = mountCatalog("a15a", freshRoot().toString)
    wh.overwrite("d", "t",
      Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "p"),
      TableMeta(partitionField = Some("p"), partitionType = "string"))
    // empty source: partition 'a' must be TRUNCATED, not kept
    spark.sql("INSERT OVERWRITE a15a.d.t PARTITION (p='a') " +
      "SELECT id FROM a15a.d.t WHERE false")
    assert(wh.read("d", "t").select("id").as[Long].collect().toSeq == Seq(3L),
      "the named partition kept its rows — static overwrite was a no-op")
    // non-empty source: replaces the named partition only
    spark.sql("INSERT OVERWRITE a15a.d.t PARTITION (p='b') VALUES (9)")
    assert(wh.read("d", "t").orderBy("id").select("id").as[Long]
      .collect().toSeq == Seq(9L))
  }

  test("function-call DEFAULT folds at declaration; catalog reads keep working") {
    val wh = mountCatalog("a15b", freshRoot().toString)
    wh.overwrite("d", "t", Seq((1L, "x")).toDF("id", "v"))
    wh.addColumn("d", "t", "tag", "STRING", Some("upper('x')"))
    wh.addColumn("d", "t", "asof", "DATE", Some("current_date()"))
    // stored text is a pure literal — unresolved eval can't throw
    val stored = wh.meta("d", "t").columnDefaults.toMap
    assert(stored("tag") == "'X'", s"got ${stored("tag")}")
    assert(stored("asof").startsWith("DATE '"), s"got ${stored("asof")}")
    // the r15 failure mode: ANY catalog read of the table threw
    assert(spark.sql("SELECT tag FROM a15b.d.t").head.getString(0) == "X")
    // an INSERT omitting the defaulted column serves the default
    spark.sql("INSERT INTO a15b.d.t (id, v) VALUES (2, 'y')")
    assert(spark.sql("SELECT tag FROM a15b.d.t WHERE id = 2")
      .head.getString(0) == "X")
  }

  test("a default injected through raw setMeta still folds (loadTable fallback)") {
    val wh = mountCatalog("a15c", freshRoot().toString)
    wh.overwrite("d", "t", Seq((1L, "x")).toDF("id", "v"))
    wh.addColumn("d", "t", "tag", "STRING")
    val m = wh.meta("d", "t")
    wh.setMeta("d", "t",
      m.copy(columnDefaults = m.columnDefaults :+ ("tag" -> "upper('q')")))
    // loadTable must not throw; the v2 default folds through analysis
    assert(spark.sql("SELECT count(*) AS n FROM a15c.d.t").head.getLong(0) == 1L)
  }

  test("time travel over a view refuses on both VERSION and TIMESTAMP forms") {
    val wh = mountCatalog("a15d", freshRoot().toString)
    wh.overwrite("d", "ev", Seq((1L, 10.0)).toDF("k", "amt"))
    spark.sql("CREATE VIEW a15d.d.v AS SELECT k FROM a15d.d.ev")
    val e1 = intercept[Exception] {
      spark.sql("SELECT * FROM a15d.d.v VERSION AS OF 0").collect()
    }
    assert(e1.getMessage.contains("cannot time travel a view"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("SELECT * FROM a15d.d.v TIMESTAMP AS OF '2099-01-01'").collect()
    }
    assert(e2.getMessage.contains("cannot time travel a view"), e2.getMessage)
  }

  test("SHOW VIEWS pattern: LIKE semantics — alternation, wildcard, literal metachars") {
    val wh = mountCatalog("a15e", freshRoot().toString)
    wh.overwrite("d", "ev", Seq((1L, 10.0)).toDF("k", "amt"))
    spark.sql("CREATE VIEW a15e.d.alpha AS SELECT k FROM a15e.d.ev")
    spark.sql("CREATE VIEW a15e.d.beta AS SELECT k FROM a15e.d.ev")
    def names(pat: String): Seq[String] =
      spark.sql(s"SHOW VIEWS IN a15e.d LIKE '$pat'")
        .collect().map(_.getString(1)).toSeq.sorted
    assert(names("al*") == Seq("alpha"))
    assert(names("alpha|beta") == Seq("alpha", "beta"))
    assert(names("be*|nosuch") == Seq("beta"))
    // regex metacharacters are LITERAL, not a PatternSyntaxException
    assert(names("al(pha") == Seq.empty)
    assert(names("a+") == Seq.empty)
    assert(names("*") == Seq("alpha", "beta"))
  }
}
