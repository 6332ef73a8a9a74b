package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types.StructType
import graft.core.Tables
import graft.sources.Jsonl

/** JSONL source/sink: schema-enforced round trip + corrupt-line gate. */
class JsonlSpec extends AnyFunSuite {
  import TestSession._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_jsonl").toString

  test("documents round-trip through compressed JSONL byte-identically") {
    val docs = Tables.load(spark, sf, "documents")
    val dir = tmp()
    Jsonl.write(docs, s"$dir/docs")
    val back = Jsonl.read(spark, s"$dir/docs", docs.schema)
      .drop(Jsonl.CorruptCol)
    assert(back.schema.fieldNames.toSeq === docs.schema.fieldNames.toSeq)
    // exceptAll both ways: same multiset of rows
    assert(back.exceptAll(docs).count() === 0)
    assert(docs.exceptAll(back).count() === 0)
  }

  test("customer round-trips through compressed CSV (flat columns)") {
    import graft.sources.Csv
    val cust = Tables.load(spark, sf, "customer")
    val dir = tmp()
    Csv.write(cust, s"$dir/cust")
    val back = Csv.read(spark, s"$dir/cust", cust.schema)
      .drop(Csv.CorruptCol)
    assert(back.exceptAll(cust).count() === 0)
    assert(cust.exceptAll(back).count() === 0)
  }

  test("ORC round-trips typed columns, nested arrays, and pushes filters to the scan") {
    import spark.implicits._
    import graft.sources.Orc
    import org.apache.spark.sql.functions.col
    val dir = tmp()
    // nested + temporal types exercise the column-format type mapping
    val df = Seq(
      (1L, "a", 3.5, Seq(1, 2, 3), java.sql.Timestamp.valueOf("2024-01-02 03:04:05")),
      (2L, "b", -0.25, Seq.empty[Int], java.sql.Timestamp.valueOf("2024-06-07 08:09:10")))
      .toDF("id", "s", "d", "xs", "ts")
    Orc.write(df, s"$dir/t")
    val back = Orc.read(spark, s"$dir/t", df.schema)
    // a file read is nullable by contract; names and types must hold exactly
    assert(back.schema.fields.map(f => (f.name, f.dataType.sql)).toSeq ===
      df.schema.fields.map(f => (f.name, f.dataType.sql)).toSeq)
    assert(back.exceptAll(df).count() === 0 && df.exceptAll(back).count() === 0)
    // the format keeps its scan-skipping value: the predicate reaches the scan
    val plan = back.filter(col("id") === 2L).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(id,2"), plan.take(1200))
  }

  test("CSV round-trips edge whitespace, embedded newlines, and quotes") {
    import spark.implicits._
    import graft.sources.Csv
    val dir = tmp()
    val df = Seq((1L, " padded "), (2L, "a\nb"), (3L, "quote\"inside"))
      .toDF("id", "text")
    Csv.write(df, s"$dir/edge", compression = "none")
    val back = Csv.read(spark, s"$dir/edge", df.schema).drop(Csv.CorruptCol)
    assert(back.exceptAll(df).count() === 0)
    assert(df.exceptAll(back).count() === 0)
  }

  test("CSV readCounted counts type-mismatched lines as corrupt") {
    import spark.implicits._
    import graft.sources.Csv
    val dir = tmp()
    val good = Seq((1L, "alpha"), (2L, "beta")).toDF("id", "text")
    Csv.write(good, s"$dir/m", compression = "none")
    val part = java.nio.file.Files.list(java.nio.file.Paths.get(s"$dir/m"))
      .filter(p => p.toString.endsWith(".csv")).findFirst().get()
    val spliced = new String(java.nio.file.Files.readAllBytes(part)) +
      "not-a-long,gamma\n"
    java.nio.file.Files.write(part, spliced.getBytes)
    java.nio.file.Files.deleteIfExists(
      part.resolveSibling("." + part.getFileName + ".crc"))
    val (clean, bad) = Csv.readCounted(spark, s"$dir/m",
      StructType(good.schema.fields))
    assert(bad === 1L)
    assert(clean.collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
  }

  test("readCounted surfaces corrupt lines without dropping clean ones") {
    import spark.implicits._
    val dir = tmp()
    val good = Seq((1L, "alpha"), (2L, "beta")).toDF("id", "text")
    Jsonl.write(good, s"$dir/mixed", compression = "none")
    // splice two broken lines into a shard by hand
    val part = java.nio.file.Files.list(java.nio.file.Paths.get(s"$dir/mixed"))
      .filter(p => p.toString.endsWith(".json")).findFirst().get()
    val spliced = new String(java.nio.file.Files.readAllBytes(part)) +
      "{\"id\": \"not-a-long\", \"text\": 7}\nutter garbage\n"
    java.nio.file.Files.write(part, spliced.getBytes)
    // hand-editing invalidates the local-FS checksum sidecar — drop it
    java.nio.file.Files.deleteIfExists(
      part.resolveSibling("." + part.getFileName + ".crc"))
    val schema = StructType(good.schema.fields)
    val (clean, bad) = Jsonl.readCounted(spark, s"$dir/mixed", schema)
    assert(bad === 2L)
    assert(clean.collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
    // the data schema may not smuggle in the corrupt column
    intercept[IllegalArgumentException] {
      Jsonl.read(spark, s"$dir/mixed", schema.add(Jsonl.CorruptCol, "string"))
    }
  }
}
