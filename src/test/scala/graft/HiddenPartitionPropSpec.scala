package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean
import org.apache.spark.sql.functions._
import graft.core.{TableMeta, Warehouse}

/** End-to-end property soundness for hidden partitioning: over HOSTILE
  * source values (empty strings, hive-escaped characters, unicode,
  * zero-padded digit strings, negative longs, NULLs) × random
  * transforms × random equality/IN/range probes,
  * `readWhere(pred) ≡ read().filter(pred)` must hold exactly — the
  * transform-side bucket prune, the null/empty-string sentinel
  * folding, and the zone maps all sit under this one equivalence.
  * (The r12 subset-dependent partition-inference bug and the r13
  * empty-string-derives-to-null-dir prune bug are both shapes only
  * this hostile-value property style catches.) */
class HiddenPartitionPropSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private def check(p: Prop, n: Int): Unit = {
    val r = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(n).withWorkers(1), p)
    assert(r.passed, r.status.toString)
  }

  // hostile-but-ASCII: the container JVM's default filename encoding
  // (sun.jnu.encoding) cannot map non-ASCII dir names, so unicode
  // partition VALUES are a platform limitation, not engine logic —
  // hive-escaped separators, control chars, %-literals, dots, the null
  // sentinel itself, and zero-padded digits cover the escaping and
  // type-inference hazards
  private val strPool = Seq("", "a", "a=b", "a/b", "sp ace", "a\tb", "%41",
    ".", "0042", "42", ":", "__HIVE_DEFAULT_PARTITION__")
  private val genStr: Gen[Option[String]] =
    Gen.frequency(6 -> Gen.oneOf(strPool).map(Some(_)), 1 -> Gen.const(None))
  private val genLong: Gen[Option[Long]] =
    Gen.frequency(6 -> Gen.choose(-6L, 6L).map(Some(_)), 1 -> Gen.const(None))

  private def freshWh(): Warehouse =
    new Warehouse(spark, Files.createTempDirectory("hpp").toString)

  test("string source × bucket/truncate × equality/IN probes: readWhere ≡ filter") {
    val genCase = for {
      rows <- Gen.choose(1, 10).flatMap(k => Gen.listOfN(k, genStr))
      transform <- Gen.oneOf("bucket[2]", "bucket[5]", "truncate[1]", "truncate[3]")
      probe <- Gen.oneOf(strPool)
      inList <- Gen.listOfN(2, Gen.oneOf(strPool))
    } yield (rows, transform, probe, inList)
    check(Prop.forAll(genCase) { case (rows, transform, probe, inList) =>
      val wh = freshWh()
      val df = rows.zipWithIndex.map { case (s, i) => (i.toLong, s.orNull) }
        .toDF("id", "k")
      wh.overwrite("d", "t", df, TableMeta(
        partitionField = Some("p"), partitionType = "string",
        partitionTransform = Some(transform), partitionSource = Some("k")))
      val base = wh.read("d", "t")
      val eqPred = col("k") === probe
      val inPred = col("k").isin(inList: _*)
      val full = base.collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
      val want = rows.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toSet
      val eqOk = wh.readWhere("d", "t", eqPred).count() == base.filter(eqPred).count()
      val inOk = wh.readWhere("d", "t", inPred).count() == base.filter(inPred).count()
      val (scanned, total) = wh.scanFootprint("d", "t", eqPred)
      (full == want) :| s"roundtrip $full vs $want" &&
        eqOk :| s"equality probe '$probe' on $transform" &&
        inOk :| s"IN probe $inList on $transform" &&
        (scanned <= total) :| "footprint sanity"
    }, n = 18)
  }

  test("long source × bucket/truncate × equality/range probes: readWhere ≡ filter") {
    val genCase = for {
      rows <- Gen.choose(1, 10).flatMap(k => Gen.listOfN(k, genLong))
      transform <- Gen.oneOf("bucket[3]", "truncate[2]", "truncate[4]")
      probe <- Gen.choose(-7L, 7L)
      lo <- Gen.choose(-7L, 3L)
      hi <- Gen.choose(-2L, 7L)
    } yield (rows, transform, probe, lo, hi)
    check(Prop.forAll(genCase) { case (rows, transform, probe, lo, hi) =>
      val wh = freshWh()
      val df = rows.zipWithIndex
        .map { case (v, i) => (i.toLong, v.map(java.lang.Long.valueOf).orNull) }
        .toDF("id", "k")
      wh.overwrite("d", "t", df, TableMeta(
        partitionField = Some("p"), partitionType = "int64",
        partitionTransform = Some(transform), partitionSource = Some("k")))
      val base = wh.read("d", "t")
      val eqPred = col("k") === probe
      val rgPred = col("k") >= lo && col("k") <= hi
      val eqOk = wh.readWhere("d", "t", eqPred).count() == base.filter(eqPred).count()
      val rgOk = wh.readWhere("d", "t", rgPred).count() == base.filter(rgPred).count()
      eqOk :| s"equality $probe on $transform" &&
        rgOk :| s"range [$lo,$hi] on $transform"
    }, n = 15)
  }

  test("timestamp source × days/months × day-boundary probes: readWhere ≡ filter") {
    val tsPool = Seq("2024-01-05 00:00:00", "2024-01-05 23:59:59",
      "2024-01-06 00:00:00", "2024-01-31 23:59:59", "2024-02-01 00:00:00",
      "2023-12-31 23:59:59")
    val genCase = for {
      rows <- Gen.choose(1, 8).flatMap(k => Gen.listOfN(k,
        Gen.frequency(6 -> Gen.oneOf(tsPool).map(Some(_)), 1 -> Gen.const(None))))
      transform <- Gen.oneOf("days", "months")
      probe <- Gen.oneOf(tsPool)
      day <- Gen.oneOf("2024-01-05", "2024-01-06", "2024-02-01", "2023-12-31")
    } yield (rows, transform, probe, day)
    check(Prop.forAll(genCase) { case (rows, transform, probe, day) =>
      val wh = freshWh()
      val df = rows.zipWithIndex.map { case (s, i) => (i.toLong, s.orNull) }
        .toDF("id", "tss")
        .select(col("id"), to_timestamp(col("tss")).as("ts"))
      wh.overwrite("d", "t", df, TableMeta(
        partitionField = Some("p"), partitionType = "date",
        partitionTransform = Some(transform), partitionSource = Some("ts")))
      val base = wh.read("d", "t")
      val eqPred = col("ts") === lit(probe).cast("timestamp")
      val dayPred = col("ts") >= lit(day).cast("timestamp") &&
        col("ts") < lit(java.sql.Date.valueOf(
          java.time.LocalDate.parse(day).plusDays(1))).cast("timestamp")
      val eqOk = wh.readWhere("d", "t", eqPred).count() == base.filter(eqPred).count()
      val dayOk = wh.readWhere("d", "t", dayPred).count() == base.filter(dayPred).count()
      eqOk :| s"ts equality $probe on $transform" &&
        dayOk :| s"day window $day on $transform"
    }, n = 12)
  }
}
