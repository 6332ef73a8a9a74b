package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

/** As-of join semantics on hand-built frames: inclusive boundary,
  * no-match nulls, latest-wins, deterministic tie-break, and tolerance
  * as match semantics (left rows always survive). */
class AsOfJoinSpec extends AnyFunSuite {
  import TestSession._

  test("backward as-of matches the latest right row at or before each left ts") {
    import spark.implicits._
    val left = Seq((1L, 10L, "p1"), (1L, 20L, "p2"), (2L, 5L, "p3"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, 10L, "r_at_10"), (1L, 15L, "r_at_15"), (3L, 1L, "other_key"))
      .toDF("k", "rts", "v")
    val out = AsOfJoin.backward(left, right, keys = Seq("k"),
      leftTs = "ts", rightTs = "rts", payload = Seq("v"))
      .collect().map(r => (r.getAs[String]("tag"), r.getAs[String]("v"),
        Option(r.getAs[Any]("matched_ts")))).toSet
    assert(out === Set(
      ("p1", "r_at_10", Some(10L)),  // equal ts matches (inclusive)
      ("p2", "r_at_15", Some(15L)),  // latest prior wins over earlier
      ("p3", null, None)))           // no right row for key 2 → nulls, row kept
  }

  test("ties on the right resolve to the latest in the tiebreak order") {
    import spark.implicits._
    val left = Seq((1L, 10L)).toDF("k", "ts")
    val right = Seq((1L, 10L, "a"), (1L, 10L, "b")).toDF("k", "rts", "v")
    val out = AsOfJoin.backward(left, right, Seq("k"), "ts", "rts", Seq("v"))
    assert(out.head().getAs[String]("v") === "b") // max of the tiebreak col
  }

  test("tolerance nulls stale matches without dropping left rows") {
    import spark.implicits._
    val left = Seq((1L, 100L, "fresh"), (1L, 500L, "stale")).toDF("k", "ts", "tag")
    val right = Seq((1L, 90L, "r")).toDF("k", "rts", "v")
    val out = AsOfJoin.backward(left, right, Seq("k"), "ts", "rts", Seq("v"),
      tolerance = Some(lit(50L)))
      .collect().map(r => r.getAs[String]("tag") -> Option(r.getAs[String]("v"))).toMap
    assert(out === Map("fresh" -> Some("r"), "stale" -> None))
  }

  test("a matched row's NULL payload value is not backfilled from older rows") {
    import spark.implicits._
    val left = Seq((1L, 10L)).toDF("k", "ts")
    // the matched (latest) right row legitimately carries a NULL value —
    // the whole row must surface, not a mix with the older row's 1.5
    val right = Seq((1L, 5L, 7L, Some(1.5)), (1L, 9L, 8L, None))
      .toDF("k", "rts", "rid", "rv")
    val row = AsOfJoin.backward(left, right, Seq("k"), "ts", "rts",
      payload = Seq("rid", "rv"), rightOrder = Some("rid")).head()
    assert(row.getAs[Long]("rid") === 8L)
    assert(row.isNullAt(row.fieldIndex("rv")))
    assert(row.getAs[Long]("matched_ts") === 9L)
  }

  test("salted variant equals the unsalted one on a deliberately skewed key") {
    import spark.implicits._
    // one hot key (90% of rows) + a sprinkle of normal keys; buckets of
    // width 100 force every phase: in-bucket matches, cross-bucket
    // carry-in over empty buckets, and no-match-anywhere lefts
    val left = ((1L to 900L).map(i => (1L, i * 7L % 1000, s"hot$i")) ++
      (1L to 100L).map(i => (2L + i % 3, i * 11L % 1000, s"cold$i")))
      .toDF("k", "ts", "tag")
    val right = ((1L to 50L).map(i => (1L, i * 19L % 1000, i)) ++
      (1L to 10L).map(i => (3L, i * 31L % 1000, 100 + i)))
      .toDF("k", "rts", "rid")
    def key(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getAs[String]("tag"),
        Option(r.getAs[Any]("rid")), Option(r.getAs[Any]("matched_ts")))).toSet
    val plain = key(AsOfJoin.backward(left, right, Seq("k"), "ts", "rts", Seq("rid")))
    val salted = key(AsOfJoin.backwardSalted(left, right, Seq("k"), "ts", "rts",
      Seq("rid"), bucketOf = ts => floor(ts / 100L)))
    assert(salted === plain)
    // tolerance composes identically through the salted path
    val plainTol = key(AsOfJoin.backward(left, right, Seq("k"), "ts", "rts",
      Seq("rid"), tolerance = Some(lit(120L))))
    val saltedTol = key(AsOfJoin.backwardSalted(left, right, Seq("k"), "ts", "rts",
      Seq("rid"), bucketOf = ts => floor(ts / 100L), tolerance = Some(lit(120L))))
    assert(saltedTol === plainTol)
  }

  test("reserved internal/output names are rejected up front") {
    import spark.implicits._
    val left = Seq((1L, 1L, "x")).toDF("k", "ts", "matched_ts")
    val right = Seq((1L, 1L, "v")).toDF("k", "rts", "v")
    val ex = intercept[IllegalArgumentException] {
      AsOfJoin.backward(left, right, Seq("k"), "ts", "rts", Seq("v"))
    }
    assert(ex.getMessage.contains("matched_ts"))
  }

  test("payload collision with left columns is rejected up front") {
    import spark.implicits._
    val df = Seq((1L, 1L, "x")).toDF("k", "ts", "v")
    val ex = intercept[IllegalArgumentException] {
      AsOfJoin.backward(df, df.withColumnRenamed("ts", "rts"),
        Seq("k"), "ts", "rts", payload = Seq("v"))
    }
    assert(ex.getMessage.contains("collide"))
  }
}
