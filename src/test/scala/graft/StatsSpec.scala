package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Stats
import graft.llmops.Normalize

/** Grouped correlation, MAD outliers, and min-max scaling on hand-built
  * frames with known closed-form answers. */
class StatsSpec extends AnyFunSuite {
  import TestSession._

  test("corrGrouped: perfect linear ±1, independent ~0, degenerate dropped") {
    import spark.implicits._
    val df = Seq(
      // group "up": y = 2x exactly -> r = 1
      ("up", 1.0, 0.02), ("up", 2.0, 0.04), ("up", 3.0, 0.06),
      // group "down": y = -x -> r = -1
      ("down", 1.0, -0.01), ("down", 2.0, -0.02), ("down", 3.0, -0.03),
      // group "flat": zero variance in y -> dropped
      ("flat", 1.0, 0.05), ("flat", 2.0, 0.05),
      // group "solo": n = 1 -> dropped
      ("solo", 9.0, 0.09))
      .toDF("g", "x", "y")
    val got = Stats.corrGrouped(df, "g", col("x"), round(col("y") * 100))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got.keySet === Set("up", "down"))
    assert(got("up") === 1.0)
    assert(got("down") === -1.0)
  }

  test("corrGrouped: anticorrelated four-point square hits closed form") {
    import spark.implicits._
    // (0,0),(0,1),(1,0),(1,1) -> r = 0 exactly; variance terms positive
    val indep = Seq(("i", 0.0, 0.00), ("i", 0.0, 0.01),
      ("i", 1.0, 0.00), ("i", 1.0, 0.01)).toDF("g", "x", "y")
    val r0 = Stats.corrGrouped(indep, "g", col("x"), round(col("y") * 100))
      .collect().head.getDouble(2)
    assert(r0 === 0.0)
  }

  test("spearmanGrouped: monotone-but-curved scores rho=1 where Pearson < 1; reversal hits -1") {
    import spark.implicits._
    // y = x^3 in cents: perfectly monotone, curved — Spearman must say 1,
    // Pearson must not (the whole reason the rank screen exists)
    val curved = (1 to 6).map(i => ("cube", i.toDouble, i * i * i / 100.0))
    // strictly decreasing -> rho = -1 exactly
    val rev = (1 to 5).map(i => ("rev", i.toDouble, (10 - i) / 100.0))
    val df = (curved ++ rev).toDF("g", "x", "y")
      .withColumn("id", monotonically_increasing_id())
    val rho = Stats.spearmanGrouped(df, "g", col("x"),
        round(col("y") * 100), col("id"))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(rho("cube") === 1.0)
    assert(rho("rev") === -1.0)
    val pearson = Stats.corrGrouped(df, "g", col("x"), round(col("y") * 100))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(pearson("cube") < 1.0, s"pearson should be < 1 on x^3: $pearson")
  }

  test("madOutliers: flags exactly the >1.9-MAD rows, drops MAD-0 groups") {
    import spark.implicits._
    // group a: values 1..7 plus a far outlier 100.
    //   cents 100..700,10000; median(8 vals, ceil-rank) = 400
    //   devs: 300,200,100,0,100,200,300,9600 -> sorted 0,100,100,200,200,300,300,9600
    //   MAD (ceil-rank idx=(8+1)//2=4) = 200 -> threshold 380: flags devs
    //   9600 only... wait 300*10=3000 > 200*19=3800? no. So only 9600.
    val a = (1 to 7).map(v => ("a", v.toDouble)) :+ (("a", 100.0))
    // group const: every value identical -> MAD 0 -> dropped entirely
    val c = Seq.fill(5)(("const", 3.0))
    val df = (a ++ c).zipWithIndex
      .map { case ((g, v), i) => (i.toLong, g, v) }
      .toDF("id", "g", "v")
    val got = Stats.madOutliers(df, "g", "v", "id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(3)))
    assert(got.length === 1)
    val (id, g, score) = got.head
    assert(g === "a" && id === 7L) // the 100.0 row
    assert(score === 48.0) // dev 9600 / MAD 200
  }

  test("madOutliers threshold is exclusive and integer-exact at the boundary") {
    import spark.implicits._
    // MAD = 100 cents; dev = 190 is exactly 1.9*MAD -> NOT flagged (strict >)
    // values: 1,2,3,4,5 (cents 100..500, med 300, devs 200,100,0,100,200
    // sorted 0,100,100,200,200 -> MAD idx=(5+1)//2=3 -> 100)
    val base = Seq(1.0, 2.0, 3.0, 4.0, 5.0)
    val df = (base :+ 4.9 :+ 4.91).zipWithIndex
      .map { case (v, i) => (i.toLong, "g", v) }.toDF("id", "g", "v")
    // recompute: with 7 values cents 100,200,300,400,500,490,491
    //   med idx=(7+1)//2=4 -> sorted 100,200,300,400,490,491,500 -> 400
    //   devs 300,200,100,0,100,90,91 sorted 0,90,91,100,100,200,300
    //   MAD idx=4 -> 100; threshold 190 exclusive:
    //   dev 300 and 200 flagged; dev 190 would not be
    val got = Stats.madOutliers(df, "g", "v", "id")
      .collect().map(_.getLong(0)).sorted
    assert(got === Seq(0L, 1L)) // cents 100 (dev 300) and 200 (dev 200)
  }

  test("chi2: zero on an independent table, n on a perfectly dependent 2x2") {
    import spark.implicits._
    // perfectly dependent: x fully determines y -> chi2 = n = 20, dof = 1
    val dep = (Seq.fill(10)(("x1", "y1")) ++ Seq.fill(10)(("x2", "y2")))
      .toDF("a", "b")
    val d = Stats.chi2(dep, col("a"), col("b")).head()
    assert(d.getLong(0) === 2L)   // only the two diagonal cells exist
    assert(d.getLong(1) === 1L)   // dof = (2-1)(2-1)
    assert(d.getDouble(2) === 20.0)
    // perfectly independent uniform 2x2 -> chi2 = 0
    val ind = (for { a <- Seq("x1", "x2"); b <- Seq("y1", "y2");
                     _ <- 1 to 5 } yield (a, b)).toDF("a", "b")
    val i = Stats.chi2(ind, col("a"), col("b")).head()
    assert(i.getLong(0) === 4L && i.getLong(1) === 1L)
    assert(i.getDouble(2) === 0.0)
  }

  test("winsorize clamps tails to the exact p05/p95 histogram elements") {
    import spark.implicits._
    // 1..100 cents 100..10000: ceil-rank p05 = 500, p95 = 9500
    val df = (1 to 100).map(v => (v.toLong, "g", v.toDouble)).toDF("id", "g", "v")
    val got = graft.operators.Stats.winsorize(df, "g", "v", "id")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(1L) === 5.0 && got(4L) === 5.0)     // left tail -> p05
    assert(got(5L) === 5.0 && got(50L) === 50.0)   // interior untouched
    assert(got(95L) === 95.0 && got(96L) === 95.0) // right tail -> p95
    assert(got(100L) === 95.0)
    assert(got.size === 100) // winsorize keeps every row
  }

  test("aucGrouped: perfect separation = 10000 bp, all-tied = 5000 bp, inverted = 0") {
    import spark.implicits._
    val df = Seq(
      // g=sep: positives strictly above negatives → AUC 1
      ("sep", true, 3L), ("sep", true, 4L), ("sep", false, 1L), ("sep", false, 2L),
      // g=tie: identical score multiset per class → AUC 1/2 via avg ranks
      ("tie", true, 1L), ("tie", true, 2L), ("tie", false, 1L), ("tie", false, 2L),
      // g=inv: positives strictly below → AUC 0
      ("inv", true, 1L), ("inv", false, 2L),
      // g=one: single class → dropped
      ("one", true, 1L), ("one", true, 2L))
      .toDF("g", "y", "v")
    val got = Stats.aucGrouped(df, col("g"), col("y"), col("v"))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got === Map("sep" -> 10000L, "tie" -> 5000L, "inv" -> 0L))
  }

  test("giniGrouped: even split -> 0; extreme concentration -> near 10000; ties exact") {
    import spark.implicits._
    val df = Seq.fill(4)(("even", 10L)) ++                 // all equal → G = 0
      (Seq(("conc", 0L), ("conc", 0L), ("conc", 0L), ("conc", 100L))) ++ // one row holds all
      Seq(("tie", 1L), ("tie", 1L), ("tie", 3L))            // hand case below
    val got = Stats.giniGrouped(df.toDF("g", "v"), "g", col("v"))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got("even") === 0L)
    // conc: sorted (0,0,0,100): 2Σi·x = 2·4·100 = 800; (n+1)Σx = 500;
    // n·Σx = 400 → (800−500)·1e4/400 = 7500 (max for n=4 is (n−1)/n)
    assert(got("conc") === 7500L)
    // tie: values (1,1,3): ranks avg (1.5,1.5,3) → 2Σi·x = 2(1.5+1.5+9)=24;
    // (n+1)Σx = 20; nΣx = 15 → 4·1e4/15 = 2666
    assert(got("tie") === 2666L)
  }

  test("ksDrift: exact D against a hand-computed two-group fixture") {
    import spark.implicits._
    // g=a: {1,1,2,3}  g=b: {2,3,3,4}; pool: {1,1,2,2,3,3,3,4} (n_all=8)
    // F_a·n_a·n_all at x: 1→16, 2→24, 3→32, 4→32 ; cum_all·n_a: 8,16,28,32
    // → d_num(a) = max|16-8, 24-16, 32-28, 0| = 8; symmetric for b.
    val df = Seq(("a", 1), ("a", 1), ("a", 2), ("a", 3),
      ("b", 2), ("b", 3), ("b", 3), ("b", 4)).toDF("g", "v")
    val rows = Stats.ksDrift(df, "g", col("v")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(rows("a") === ((4L, 8L, 8L, 2500L)))
    assert(rows("b") === ((4L, 8L, 8L, 2500L)))
  }

  test("ksDrift: a group distributed like the pool has near-zero drift") {
    import spark.implicits._
    // two identically distributed groups → each group's ECDF equals the
    // pooled ECDF at every point → D = 0 exactly
    val df = (1 to 50).flatMap(v => Seq(("a", v), ("b", v))).toDF("g", "v")
    val rows = Stats.ksDrift(df, "g", col("v")).collect()
    assert(rows.length === 2)
    rows.foreach(r => assert(r.getLong(3) === 0L && r.getLong(4) === 0L))
  }

  test("minMax: 0 at group min, 1 at group max, degenerate group dropped") {
    import spark.implicits._
    val df = Seq(
      (1L, "a", 10.0), (2L, "a", 15.0), (3L, "a", 20.0),
      (4L, "b", 7.0), (5L, "b", 7.0)) // min = max: dropped
      .toDF("id", "g", "v")
    val got = Normalize.minMax(df, "g", "v", "id")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got === Map(1L -> 0.0, 2L -> 0.5, 3L -> 1.0))
  }
}
