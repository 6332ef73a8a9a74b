package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean
import org.apache.spark.sql.functions._
import graft.core.Warehouse
import graft.sql.GraftSql

/** SQL-path ≡ API-path equivalence as a PROPERTY: over random tables
  * (hostile values included: NULLs, negatives, empty and quoted
  * strings) × random predicates × random assignments, a DML statement
  * through `spark.sql` must leave the table in EXACTLY the state the
  * Scala API leaves a twin table in. The SQL layer only translates —
  * any drift (qualifier stripping, expression wrapping, simultaneous
  * assignment, MoR routing) shows up here as a row diff. */
class GraftSqlPropSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private def check(p: Prop, n: Int): Unit = {
    val r = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(n).withWorkers(1), p)
    assert(r.passed, r.status.toString)
  }

  private val strPool = Seq("", "a", "it's", "x\"y", "sp ace", "Ünïcode", "0")
  private val genRow: Gen[(Long, Option[String], Option[Double])] = for {
    k <- Gen.chooseNum(-50L, 50L)
    s <- Gen.frequency(5 -> Gen.oneOf(strPool).map(Some(_)), 1 -> Gen.const(None))
    v <- Gen.frequency(5 -> Gen.chooseNum(-100.0, 100.0).map(x =>
      Some(math.rint(x * 4) / 4)), 1 -> Gen.const(None))
  } yield (k, s, v)
  private val genRows = Gen.nonEmptyListOf(genRow).map(_.take(40))

  // predicates rendered BOTH as SQL text and as a Column — same tree
  private val genPred: Gen[(String, org.apache.spark.sql.Column)] = Gen.oneOf(
    Gen.chooseNum(-40L, 40L).map(x => (s"k >= $x", col("k") >= x)),
    Gen.chooseNum(-40L, 40L).map(x => (s"k % 7 = ${x % 7}", col("k") % 7 === x % 7)),
    Gen.oneOf(strPool.filter(s => !s.contains("'"))).map(s =>
      (s"s = '$s'", col("s") === s)),
    Gen.chooseNum(-50.0, 50.0).map(x =>
      (s"v < $x", col("v") < x)),
    Gen.const(("s IS NULL", col("s").isNull)))

  private var n = 0
  private def pair(rows: Seq[(Long, Option[String], Option[Double])])
      : (Warehouse, String, Warehouse) = {
    n += 1
    val name = s"prop_sql_$n"
    val df = rows.toDF("k", "s", "v")
    val whA = new Warehouse(spark, Files.createTempDirectory("sqlprop_a").toString)
    val whB = new Warehouse(spark, Files.createTempDirectory("sqlprop_b").toString)
    whA.overwrite("d", "t", df)
    whB.overwrite("d", "t", df)
    GraftSql.register(spark, name, whA, "d", "t")
    (whA, name, whB)
  }

  private def sameState(a: Warehouse, b: Warehouse): Boolean = {
    val l = a.read("d", "t").collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    val r = b.read("d", "t").collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    l == r
  }

  test("SQL DELETE ≡ API deleteWhere (CoW and MoR) over random predicates") {
    check(Prop.forAll(genRows, genPred, Gen.oneOf(true, false)) {
      case (rows, (predSql, predCol), mor) =>
        val (whA, name, whB) = pair(rows)
        if (mor) spark.conf.set("spark.graft.sql.dml", "mor")
        try {
          val sqlN = spark.sql(s"DELETE FROM $name WHERE $predSql").head().getLong(0)
          val apiN =
            if (mor) whB.deleteWhereMor("d", "t", predCol).deletedRows
            else whB.deleteWhere("d", "t", predCol).deletedRows
          (sqlN == apiN) :| s"counts: sql=$sqlN api=$apiN" &&
            sameState(whA, whB) :| "post-delete state diverged"
        } finally spark.conf.unset("spark.graft.sql.dml")
    }, 30)
  }

  test("SQL UPDATE ≡ API updateWhere over random assignments") {
    val genAssign: Gen[(String, Seq[(String, org.apache.spark.sql.Column)])] =
      Gen.oneOf(
        Gen.const(("SET v = v * 2", Seq("v" -> (col("v") * 2)))),
        Gen.const(("SET s = concat(s, '!')", Seq("s" -> concat(col("s"), lit("!"))))),
        // simultaneous read of a column another assignment writes
        Gen.const(("SET v = k + v, s = s", Seq("v" -> (col("k") + col("v")), "s" -> col("s")))))
    check(Prop.forAll(genRows, genPred, genAssign) {
      case (rows, (predSql, predCol), (setSql, sets)) =>
        val (whA, name, whB) = pair(rows)
        val sqlN = spark.sql(s"UPDATE $name $setSql WHERE $predSql").head().getLong(0)
        val apiN = whB.updateWhere("d", "t", sets, predCol).updatedRows
        (sqlN == apiN) :| s"counts: sql=$sqlN api=$apiN" &&
          sameState(whA, whB) :| "post-update state diverged"
    }, 30)
  }

  test("SQL MERGE ≡ API mergeInto over random sources") {
    check(Prop.forAll(genRows, genRows) { (rows, srcRows) =>
      // merge keys must be unique within the source: dedup by k
      val src = srcRows.groupBy(_._1).map(_._2.head).toSeq
      val (whA, name, whB) = pair(rows)
      src.toDF("k", "s", "v").createOrReplaceTempView(s"${name}_src")
      val m = spark.sql(
        s"""MERGE INTO $name t USING ${name}_src s ON t.k = s.k
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin).head()
      val r = whB.mergeInto("d", "t", src.toDF("k", "s", "v"), Seq("k"))
      (m.getLong(0) == r.matchedRows) :| "matched counts" &&
        sameState(whA, whB) :| "post-merge state diverged"
    }, 20)
  }

  test("SQL general MERGE shapes ≡ API mergeApply over random clause sets") {
    import graft.core.MergeClause
    // each generator yields the SAME clause as SQL text and as the API
    // value; qualified refs only (t/s are also column names in the pool)
    val genMCond: Gen[(String, Option[org.apache.spark.sql.Column])] = Gen.oneOf(
      ("", None),
      (" AND s.v > 0", Some(col("s.v") > 0)),
      (" AND t.v < 10", Some(col("t.v") < 10)))
    val genMatched: Gen[(String, MergeClause)] = for {
      (cs, cc) <- genMCond
      (as, ac) <- Gen.oneOf[(String, MergeClause.Action)](
        ("UPDATE SET v = t.v + 1",
          MergeClause.Update(Seq("v" -> (col("t.v") + 1)))),
        ("UPDATE SET s = 'u', v = s.v",
          MergeClause.Update(Seq("s" -> lit("u"), "v" -> col("s.v")))),
        ("DELETE", MergeClause.Delete))
    } yield (s"WHEN MATCHED$cs THEN $as", MergeClause(cc, ac))
    val genNotMatched: Gen[(String, MergeClause)] = for {
      (cs, cc) <- Gen.oneOf(("", None),
        (" AND s.v > 0", Some(col("s.v") > 0): Option[org.apache.spark.sql.Column]))
      (as, ac) <- Gen.oneOf[(String, MergeClause.Action)](
        ("INSERT *", MergeClause.Star),
        ("INSERT (k, s) VALUES (s.k, 'ins')",
          MergeClause.Insert(Seq("k" -> col("s.k"), "s" -> lit("ins")))))
    } yield (s"WHEN NOT MATCHED$cs THEN $as", MergeClause(cc, ac))
    val genBySource: Gen[(String, MergeClause)] = for {
      (cs, cc) <- Gen.oneOf(("", None),
        (" AND t.v < 0", Some(col("t.v") < 0): Option[org.apache.spark.sql.Column]))
      (as, ac) <- Gen.oneOf[(String, MergeClause.Action)](
        ("UPDATE SET s = 'stale'", MergeClause.Update(Seq("s" -> lit("stale")))),
        ("DELETE", MergeClause.Delete))
    } yield (s"WHEN NOT MATCHED BY SOURCE$cs THEN $as", MergeClause(cc, ac))
    // SQL constraint: only the LAST clause of a family may omit its
    // condition (Spark enforces this at parse time) — so every
    // non-final generated clause is forced conditional
    def forceCond(c: (String, MergeClause)): Gen[(String, MergeClause)] =
      if (c._2.condition.isDefined) Gen.const(c)
      else genMatched.retryUntil(_._2.condition.isDefined, 50)
    val genShape: Gen[(Seq[(String, MergeClause)], Seq[(String, MergeClause)],
        Seq[(String, MergeClause)])] = for {
      m0 <- Gen.listOfN(2, genMatched).map(_.distinctBy(_._1))
      m <- m0 match {
        case Seq(a, b) => forceCond(a).map(a2 =>
          if (a2._1 == b._1) Seq(b) else Seq(a2, b))
        case other => Gen.const(other)
      }
      nm <- Gen.option(genNotMatched).map(_.toSeq)
      bs <- Gen.option(genBySource).map(_.toSeq)
    } yield (m, nm, bs)
    check(Prop.forAllNoShrink(genRows, genRows, genShape) {
      case (rows, srcRows, (mcl, ncl, bcl)) =>
        val src = srcRows.groupBy(_._1).map(_._2.head).toSeq
        val (whA, name, whB) = pair(rows)
        src.toDF("k", "s", "v").createOrReplaceTempView(s"${name}_gsrc")
        val clauses = (mcl ++ ncl ++ bcl).map(_._1).mkString("\n")
        val sqlRow = spark.sql(
          s"""MERGE INTO $name t USING ${name}_gsrc s ON t.k = s.k
             |$clauses""".stripMargin).head()
        val r = whB.mergeApply("d", "t", src.toDF("k", "s", "v"), Seq("k"),
          mcl.map(_._2), ncl.map(_._2), bcl.map(_._2))
        ((sqlRow.getLong(0), sqlRow.getLong(1), sqlRow.getLong(2)) ==
          ((r.updatedRows, r.deletedRows, r.insertedRows))) :|
          s"counts: sql=$sqlRow api=$r" &&
          sameState(whA, whB) :| "post-merge state diverged"
    }, 25)
  }

  // translatable-to-source-filters predicate subset: the v2 metadata
  // DELETE path refuses (loudly, spec-gated elsewhere) anything Spark
  // cannot translate, so the equivalence property quantifies over the
  // supported surface
  private val genPredV2: Gen[(String, org.apache.spark.sql.Column)] = Gen.oneOf(
    Gen.chooseNum(-40L, 40L).map(x => (s"k >= $x", col("k") >= x)),
    Gen.oneOf(strPool.filter(s => !s.contains("'"))).map(s =>
      (s"s = '$s'", col("s") === s)),
    Gen.chooseNum(-50.0, 50.0).map(x => (s"v < $x", col("v") < x)),
    Gen.const(("s IS NULL", col("s").isNull)),
    Gen.chooseNum(-40L, 40L).map(x =>
      (s"k >= $x AND s IS NOT NULL", col("k") >= x && col("s").isNotNull)))

  test("v2 DELETE (spark.graft.sql.dml.v2) ≡ interception DELETE over random predicates") {
    val root = Files.createTempDirectory("sqlprop_v2").toString
    spark.conf.set("spark.sql.catalog.pv2",
      classOf[graft.sql.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.pv2.root", root)
    val wh = new Warehouse(spark, root)
    var i = 0
    check(Prop.forAllNoShrink(genRows, genPredV2) {
      case (rows, (predSql, _)) =>
        i += 1
        val df = rows.toDF("k", "s", "v")
        wh.overwrite(s"v$i", "a", df)
        wh.overwrite(s"v$i", "b", df)
        spark.conf.set("spark.graft.sql.dml.v2", "true")
        val v2Out =
          try spark.sql(s"DELETE FROM pv2.v$i.a WHERE $predSql")
          finally spark.conf.unset("spark.graft.sql.dml.v2")
        spark.sql(s"DELETE FROM pv2.v$i.b WHERE $predSql")
        val l = wh.read(s"v$i", "a").collect().map(_.toSeq)
          .groupBy(identity).view.mapValues(_.length).toMap
        val r = wh.read(s"v$i", "b").collect().map(_.toSeq)
          .groupBy(identity).view.mapValues(_.length).toMap
        v2Out.schema.isEmpty :| "v2 exec must have planned the flagged path" &&
          (l == r) :| "v2 vs interception state diverged"
    }, 25)
  }

  test("RESTORE TO VERSION AS OF returns exactly the captured snapshot state") {
    check(Prop.forAllNoShrink(genRows, genPred, genPred, Gen.chooseNum(0, 2)) {
      case (rows, (p1, _), (p2, _), pick) =>
        val (whA, name, _) = pair(rows)
        def state(): Map[Seq[Any], Int] =
          whA.read("d", "t").collect().map(_.toSeq)
            .groupBy(identity).view.mapValues(_.length).toMap
        def version(): Int = whA.log("d", "t").latest.get.version
        val snaps = scala.collection.mutable.ArrayBuffer[(Int, Map[Seq[Any], Int])]()
        snaps += version() -> state()
        spark.sql(s"DELETE FROM $name WHERE $p1")
        snaps += version() -> state()
        spark.sql(s"UPDATE $name SET v = v + 1 WHERE $p2")
        snaps += version() -> state()
        val (tv, want) = snaps(pick)
        spark.sql(s"RESTORE TABLE $name TO VERSION AS OF $tv")
        (state() == want) :| s"restore to v$tv diverged from the captured state"
    }, 20)
  }
}
