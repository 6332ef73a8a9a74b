package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.{TableMeta, Warehouse}

/** Type-widening evolution edges beyond the q85 oracle: narrow appends
  * after a widen, widen-on-append evolving the pinned schema, loud
  * refusal of non-widening changes, constraint enforcement across the
  * widen, and zone-pruned point reads on a mixed narrow/wide layout. */
class SchemaWideningSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private def fresh(): Warehouse =
    new Warehouse(spark, Files.createTempDirectory("widen_spec").toString)

  test("explicit widen, then a NARROW append still lands and serves wide") {
    val wh = fresh()
    wh.overwrite("d", "t", Seq((1, 1.5f), (2, 2.5f)).toDF("k", "v"))
    wh.widenColumn("d", "t", "k", "BIGINT")
    wh.widenColumn("d", "t", "v", "DOUBLE")
    // an old writer still producing int/float keeps working: the pinned
    // schema stays wide, the narrow fragment serves widened
    wh.append("d", "t", Seq((3, 3.5f)).toDF("k", "v"))
    val got = wh.read("d", "t")
    assert(got.schema("k").dataType === LongType)
    assert(got.schema("v").dataType === DoubleType)
    assert(got.orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      === Seq((1L, 1.5), (2L, 2.5), (3L, 3.5)))
  }

  test("widen-on-append: a wider incoming frame evolves the pinned schema") {
    val wh = fresh()
    wh.overwrite("d", "t", Seq((1, 10)).toDF("k", "n"))
    assert(wh.read("d", "t").schema("n").dataType === IntegerType)
    wh.append("d", "t", Seq((2L, 20L)).toDF("k", "n"))
    val got = wh.read("d", "t")
    assert(got.schema("k").dataType === LongType)
    assert(got.schema("n").dataType === LongType)
    assert(got.orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      === Seq((1L, 10L), (2L, 20L)))
    // time travel to v1 serves the original int schema
    assert(wh.readVersion("d", "t", 1).schema("n").dataType === IntegerType)
  }

  test("non-widening changes refuse loudly") {
    val wh = fresh()
    wh.overwrite("d", "t", Seq((1L, "a")).toDF("k", "s"))
    val e = intercept[IllegalArgumentException] {
      wh.widenColumn("d", "t", "k", "INT") // narrowing
    }
    assert(e.getMessage.contains("cannot widen"))
    intercept[IllegalArgumentException] {
      wh.widenColumn("d", "t", "s", "BIGINT") // unrelated
    }
    intercept[IllegalArgumentException] {
      wh.widenColumn("d", "t", "missing", "BIGINT")
    }
  }

  test("CHECK constraints keep enforcing across the widen") {
    val wh = fresh()
    wh.overwrite("d", "t", Seq((1, 5)).toDF("k", "v"),
      TableMeta(checkConstraints = Seq("v_pos" -> "v > 0")))
    wh.widenColumn("d", "t", "v", "BIGINT")
    val e = intercept[IllegalArgumentException] {
      wh.append("d", "t", Seq((2L, -7L)).toDF("k", "v"))
    }
    assert(e.getMessage.contains("v_pos"), e.getMessage)
    assert(wh.read("d", "t").count() === 1L)
  }

  test("zone-pruned point reads stay correct on a mixed narrow/wide layout") {
    val wh = fresh()
    wh.overwrite("d", "t", spark.range(1000)
      .select(col("id").cast("int").as("k"), col("id").as("payload")))
    wh.widenColumn("d", "t", "k", "BIGINT")
    wh.append("d", "t", spark.range(5000, 6000)
      .select(col("id").as("k"), col("id").as("payload")))
    // point probe on the widened column across both fragments
    assert(wh.readWhere("d", "t", col("k") === 500L).count() === 1L)
    assert(wh.readWhere("d", "t", col("k") === 5500L).count() === 1L)
    // range probe prunes the fragment whose zone cannot match
    val (scanned, total) = wh.scanFootprint("d", "t", col("k") > 5900L)
    assert(scanned < total, s"zone maps must still prune: $scanned/$total")
  }
}
