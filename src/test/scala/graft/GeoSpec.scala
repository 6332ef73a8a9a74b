package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.Geo

/** Planar GEOGRAPHY surface ([[graft.functions.Geo]]): WKT codec
  * round-trips, distance algebra, and the ray-casting containment the
  * q98_geo oracle can't cover (concave rings, malformed input, NULL
  * propagation — DuckDB-side sign tests only express convex shapes). */
class GeoSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  test("WKT POINT round-trips through stPoint/stX/stY") {
    val df = Seq((1.5, -2.25), (0.0, 97.0)).toDF("x", "y")
      .withColumn("wkt", Geo.stPoint(col("x"), col("y")))
    val back = df.select(Geo.stX(col("wkt")), Geo.stY(col("wkt")))
      .as[(Double, Double)].collect().toSeq
    assert(back === Seq((1.5, -2.25), (0.0, 97.0)))
  }

  test("stX/stY/stContains return NULL on malformed WKT") {
    val df = Seq("POINT (1 2)", "LINESTRING (0 0, 1 1)", "garbage")
      .toDF("wkt")
    val xs = df.select(Geo.stX(col("wkt"))).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(xs.toSeq === Seq(Some(1.0), None, None))
    val tri = lit("POLYGON ((0 0, 4 0, 2 4, 0 0))")
    val c = df.select(Geo.stContains(tri, col("wkt"))).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getBoolean(0)))
    assert(c.toSeq === Seq(Some(true), None, None))
    // malformed polygon (unclosed ring) also nulls, never guesses
    val bad = Seq("POINT (1 1)").toDF("wkt")
      .select(Geo.stContains(lit("POLYGON ((0 0, 4 0, 2 4))"), col("wkt")))
    assert(bad.collect().head.isNullAt(0))
  }

  test("planar distance and dwithin") {
    val d = Seq(("POINT (0 0)", "POINT (3 4)")).toDF("a", "b")
      .select(Geo.stDistance(col("a"), col("b")),
        Geo.stDWithin(col("a"), col("b"), lit(5.0)),
        Geo.stDWithin(col("a"), col("b"), lit(4.9)))
      .as[(Double, Boolean, Boolean)].head()
    assert(d === ((5.0, true, false)))
  }

  test("ray casting handles CONCAVE rings (the shape the oracle's sign test cannot express)") {
    // arrowhead: concave at (2, 2)
    val poly = lit("POLYGON ((0 0, 4 0, 4 4, 2 2, 0 4, 0 0))")
    val pts = Seq(
      ("POINT (2 1)", true),   // in the solid body
      ("POINT (2 3)", false),  // in the notch — inside the convex hull!
      ("POINT (3.5 3)", true), // right lobe
      ("POINT (0.5 3)", true), // left lobe
      ("POINT (5 1)", false)   // outside entirely
    ).toDF("wkt", "expect")
    val got = pts.select(col("expect"),
      Geo.stContains(poly, col("wkt")).as("got"))
      .as[(Boolean, Boolean)].collect()
    got.foreach { case (expect, g) => assert(g === expect) }
  }

  test("containment agrees with the convex sign test on the q98 triangle lattice") {
    // the oracle's contract, re-proven here at spec level: on the q98
    // triangle no integer lattice point sits on an edge, so ray casting
    // must equal the strict three-edge sign test everywhere
    val tri = "POLYGON ((10.5 9.5, 90.5 10.5, 50.5 90.5, 10.5 9.5))"
    val ring = Geo.parsePolygon(tri).get
    var checked = 0
    for (x <- 0 to 96; y <- 0 to 96) {
      val c1 = 80.0 * (y - 9.5) - 1.0 * (x - 10.5)
      val c2 = -40.0 * (y - 10.5) - 80.0 * (x - 90.5)
      val c3 = -40.0 * (y - 90.5) + 81.0 * (x - 50.5)
      val sign = c1 > 0 && c2 > 0 && c3 > 0
      val ray = Geo.rayCast(ring, x.toDouble, y.toDouble)
      assert(ray === sign, s"($x,$y): ray=$ray sign=$sign")
      checked += 1
    }
    assert(checked === 97 * 97)
  }
}
