package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The NTZ fallback contract in [[graft.core.Tables]]: a session built
  * WITHOUT [[graft.core.GraftSession.requiredConfs]] (NTZ inference on,
  * machine timezone) must still read fixture timestamps as the same UTC
  * instants the oracle's naive read sees — including NTZ fields nested
  * inside structs and arrays, which a top-level-only rewrite misses. */
class TablesSpec extends AnyFunSuite {
  import TestSession._

  test("ad-hoc session: NTZ columns (top-level and nested) read as UTC instants") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ntz_spec").toString
    // write a fixture-shaped table whose timestamps are NTZ, nested and flat
    val src = Seq((1L, "2024-03-01 12:30:00"), (2L, "2024-07-04 00:15:30"))
      .toDF("doc_id", "s")
      .select(col("doc_id"),
        col("s").cast("timestamp_ntz").as("created"),
        struct(col("s").cast("timestamp_ntz").as("at"), lit(1L).as("k")).as("meta"),
        array(col("s").cast("timestamp_ntz")).as("times"))
    src.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // ad-hoc session: NTZ inference ON, session TZ deliberately NOT UTC —
    // the combination that shifted instants before the fallback forced UTC
    val adhoc = spark.newSession()
    adhoc.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    adhoc.conf.set("spark.sql.session.timeZone", "America/New_York")
    val got = graft.core.Tables.load(adhoc, dir, "documents")
    // no NTZ survives anywhere in the schema
    def hasNtz(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case org.apache.spark.sql.types.TimestampNTZType => true
      case s: org.apache.spark.sql.types.StructType => s.fields.exists(f => hasNtz(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hasNtz(a.elementType)
      case m: org.apache.spark.sql.types.MapType => hasNtz(m.keyType) || hasNtz(m.valueType)
      case _ => false
    }
    assert(!got.schema.fields.exists(f => hasNtz(f.dataType)),
      s"NTZ left in schema: ${got.schema.treeString}")
    // the wall-clock strings were naive UTC; the read instants must be
    // exactly those micros (a machine/session-zone read would shift them)
    val rows = got.select(col("doc_id"),
        unix_micros(col("created")).as("c"),
        unix_micros(col("meta.at")).as("m"),
        unix_micros(col("times").getItem(0)).as("t"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val utc = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss")
    def micros(s: String): Long =
      java.time.LocalDateTime.parse(s, utc)
        .toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000L
    assert(rows(1L) === ((micros("2024-03-01 12:30:00"),
      micros("2024-03-01 12:30:00"), micros("2024-03-01 12:30:00"))))
    assert(rows(2L) === ((micros("2024-07-04 00:15:30"),
      micros("2024-07-04 00:15:30"), micros("2024-07-04 00:15:30"))))
    // and the NTZ fallback must NOT have hijacked the session timezone:
    // every later timestamp expression in this ad-hoc session still runs
    // in the zone its owner deliberately set
    assert(adhoc.conf.get("spark.sql.session.timeZone") === "America/New_York",
      "normalizeNtz mutated global session state")
  }
}
