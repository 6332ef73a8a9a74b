package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.core.ZoneMaps
import graft.core.ZoneMaps.{ColStat, FragStats}

/** Property-based SOUNDNESS proof for zone-map pruning: over random
  * fragments (with nulls, empty fragments, all-null columns) and random
  * predicate trees, `mayMatch == false` must imply NO row in the
  * fragment satisfies the predicate (ground truth = Spark evaluating the
  * same predicate on the same rows). Completeness is not required —
  * pruning may always say "scan" — but an unsound prune silently drops
  * rows, the one failure mode data skipping must never have. */
class ZoneMapsPropSpec extends AnyFunSuite {
  import TestSession._

  private def check(p: Prop, n: Int = 60): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(r.passed, r.status.toString)
  }

  private val schema = StructType.fromDDL("n INT, s STRING")

  // ---- row + fragment generators (small domains force collisions)
  private val genN: Gen[Option[Int]] =
    Gen.frequency(4 -> Gen.choose(-5, 5).map(Some(_)), 1 -> Gen.const(None))
  private val genS: Gen[Option[String]] =
    Gen.frequency(4 -> Gen.oneOf("a", "ab", "b", "ba", "", "zz").map(Some(_)),
      1 -> Gen.const(None))
  private val genRow: Gen[(Option[Int], Option[String])] = Gen.zip(genN, genS)
  private val genFrag: Gen[List[(Option[Int], Option[String])]] =
    Gen.choose(0, 8).flatMap(k => Gen.listOfN(k, genRow))

  // ---- predicate generator: the supported grammar plus unsupported
  // shapes (which must never prune)
  private val genIntLit: Gen[Int] = Gen.choose(-6, 6)
  private val genStrLit: Gen[String] = Gen.oneOf("a", "ab", "b", "", "z", "c")
  private val genAtom: Gen[Column] = Gen.oneOf(
    genIntLit.map(k => col("n") === k),
    genIntLit.map(k => col("n") < k),
    genIntLit.map(k => col("n") > k),
    genIntLit.map(k => col("n") <= k),
    genIntLit.map(k => col("n") >= k),
    genIntLit.map(k => lit(k) < col("n")),
    Gen.listOfN(3, genIntLit).map(ks => col("n").isin(ks: _*)),
    genStrLit.map(v => col("s") === v),
    genStrLit.map(v => col("s").startsWith(v)),
    Gen.const(col("n").isNull),
    Gen.const(col("n").isNotNull),
    Gen.const(col("s").isNull),
    // unsupported shapes: pruning must degrade to "scan", never drop
    genIntLit.map(k => !(col("n") === k)),
    genIntLit.map(k => (col("n") + 1) === k),
    genStrLit.map(v => length(col("s")) === v.length))
  private val genPred: Gen[Column] = Gen.oneOf(
    genAtom,
    Gen.zip(genAtom, genAtom).map { case (a, b) => a && b },
    Gen.zip(genAtom, genAtom).map { case (a, b) => a || b },
    Gen.zip(genAtom, genAtom, genAtom).map { case (a, b, c) => (a && b) || c })

  /** Stats exactly as the footer path would record them (ASCII strings
    * under the cap, typed integer renders, exact null counts). */
  private def statsOf(rows: List[(Option[Int], Option[String])]): FragStats = {
    val ns = rows.flatMap(_._1)
    val ss = rows.flatMap(_._2)
    FragStats(rows.size,
      Map(
        "n" -> ColStat(ns.minOption.map(_.toString), ns.maxOption.map(_.toString),
          rows.count(_._1.isEmpty).toLong, "integer"),
        "s" -> ColStat(ss.minOption, ss.maxOption,
          rows.count(_._2.isEmpty).toLong, "string")))
  }

  test("pruning is SOUND: a fragment mayMatch rejects holds no matching row") {
    import spark.implicits._
    check(Prop.forAll(genFrag, genPred) { (rows, pred) =>
      val resolved = ZoneMaps.resolvePredicate(spark, schema, pred)
      resolved.isDefined && {
        val may = ZoneMaps.mayMatch(resolved.get, statsOf(rows))
        if (may) true // "scan" is always sound
        else {
          val df = rows.map { case (n, s) => (n.map(Integer.valueOf).orNull, s.orNull) }
            .toDF("n", "s")
          df.filter(pred).isEmpty // pruned ⇒ provably no match
        }
      }
    }, n = 60)
  }

  test("partition-zone pruning is SOUND end to end: hostile partition values × random predicates") {
    import spark.implicits._
    import java.nio.file.Files
    // ONE table, hostile partition values: numeric-looking strings (the
    // r11 string-vs-numeric-ordering hazard), hive-escaped characters,
    // a date-looking value, negative-looking, spaces, NULL, and empty
    // string (which Spark's hive layout writes as the null sentinel) —
    // then 60 random predicates must satisfy readWhere ≡ read.filter.
    val wh = new graft.core.Warehouse(spark,
      Files.createTempDirectory("zm_prop_part").toString)
    val parts = Seq("9", "12", "0042", "a:b", "x/y", "2024-01-01", "-3",
      "A B", "%41").map(Some(_)) ++ Seq(None, Some(""))
    val rows = parts.zipWithIndex.map { case (p, i) => (i, p.orNull) }
    wh.overwrite("raw", "hp", rows.toDF("id", "p"),
      graft.core.TableMeta(partitionField = Some("p"), partitionType = "string"))
    val truth = wh.read("raw", "hp")
    val lits = parts.flatten ++ Seq("9", "1", "z", "a", "0")
    val genLit = Gen.oneOf(lits)
    val genPartPred: Gen[Column] = Gen.oneOf(
      genLit.map(v => col("p") === v),
      genLit.map(v => col("p") < v),
      genLit.map(v => col("p") > v),
      genLit.map(v => col("p") <= v),
      genLit.map(v => col("p") >= v),
      genLit.map(v => col("p").startsWith(v.take(1))),
      Gen.listOfN(3, genLit).map(vs => col("p").isin(vs: _*)),
      Gen.const(col("p").isNull),
      Gen.const(col("p").isNotNull),
      Gen.zip(genLit, genLit).map { case (a, b) => col("p") === a || col("p") === b },
      genLit.map(v => col("p") === v && col("id") < 100))
    check(Prop.forAll(genPartPred) { pred =>
      val got = wh.readWhere("raw", "hp", pred)
        .select("id").collect().map(_.getInt(0)).toSet
      val want = truth.filter(pred)
        .select("id").collect().map(_.getInt(0)).toSet
      got == want
    }, n = 60)
  }

  test("empty fragments always prune; full-range fragments never prune equality they contain") {
    import spark.implicits._
    val st0 = statsOf(Nil)
    val r = ZoneMaps.resolvePredicate(spark, schema, col("n") === 3).get
    assert(!ZoneMaps.mayMatch(r, st0))
    val st = statsOf(List((Some(3), Some("a"))))
    assert(ZoneMaps.mayMatch(r, st))
  }
}
