package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.manifest.{Manifest, ModelNode, SourceNode}
import graft.core.{TableId, WarehouseTypes}
import org.apache.spark.sql.types._

/** Manifest DAG, selector language, ref rewriting, and the warehouse type
  * map + nested-schema walks. */
class ManifestSpec extends AnyFunSuite {

  private def model(name: String, mat: String = "view",
                    tags: Set[String] = Set.empty) =
    ModelNode(s"model.proj.$name", "proj", "core", name,
      materialized = mat, tags = tags)

  private val m = Manifest(
    models = Seq(
      model("stg_orders", "view"),
      model("stg_customers", "view"),
      model("int_enriched", "table"),
      model("mart_daily", "incremental", tags = Set("daily")),
      model("mart_weekly", "incremental", tags = Set("weekly"))),
    sources = Seq(SourceNode("source.proj.raw_orders", "proj", "landing",
      "raw_orders", "raw", identifier = "orders_landed")),
    parentsByName = Map(
      "stg_orders" -> Seq("raw_orders"),
      "int_enriched" -> Seq("stg_orders", "stg_customers"),
      "mart_daily" -> Seq("int_enriched"),
      "mart_weekly" -> Seq("int_enriched")))

  test("upstream/downstream closures are transitive and model-only") {
    assert(m.upstream("mart_daily").map(_._1) ===
      Set("model.proj.int_enriched", "model.proj.stg_orders", "model.proj.stg_customers"))
    assert(m.downstream("stg_orders").map(_._1) ===
      Set("model.proj.int_enriched", "model.proj.mart_daily", "model.proj.mart_weekly"))
    assert(m.upstream("stg_orders") === Set.empty) // source parent filtered out
  }

  test("selector language: names, +up, down+, tag:, materialized:, unions") {
    assert(m.select("mart_daily") === Seq("mart_daily"))
    assert(m.select("+mart_daily") ===
      Seq("stg_customers", "stg_orders", "int_enriched", "mart_daily"))
    assert(m.select("stg_orders+") ===
      Seq("stg_orders", "int_enriched", "mart_daily", "mart_weekly"))
    assert(m.select("tag:daily") === Seq("mart_daily"))
    assert(m.select("materialized:view") === Seq("stg_customers", "stg_orders"))
    assert(m.select("mart_daily, mart_weekly") === Seq("mart_daily", "mart_weekly"))
    assert(m.select("*").size === 5)
  }

  test("model ordering: stg < int < other (manifest.py:331-338)") {
    assert(Seq("mart_daily", "stg_orders", "int_enriched").sortBy(m.modelOrdering) ===
      Seq("stg_orders", "int_enriched", "mart_daily"))
  }

  test("canSelectDirectly: exact model name or selector syntax (P6)") {
    assert(m.canSelectDirectly("mart_daily"))
    assert(m.canSelectDirectly("+anything"))
    assert(m.canSelectDirectly("tag:daily"))
    assert(m.canSelectDirectly("a b"))
    assert(!m.canSelectDirectly("unknown_model"))
  }

  test("ref rewriting maps FQ names to ref()/source() and reports unresolved (J7)") {
    val sql = "select * from proj.core.int_enriched join " +
      "proj.landing.orders_landed using (id) join proj.core.mystery using (id)"
    val (out, unresolved) = m.rewriteRefs(sql)
    assert(out.contains("{{ ref('int_enriched') }}"))
    assert(out.contains("{{ source('raw', 'raw_orders') }}"))
    assert(unresolved === Seq("proj.core.mystery"))
  }

  test("TableId parses 3-part names, stripping backticks (F12)") {
    assert(TableId.parse("`p`.`d`.`t`") === Some(TableId("p", "d", "t")))
    assert(TableId.parse("p.d") === None)
    assert(TableId("p", "d", "t").fq === "p.d.t")
  }

  test("warehouse type map: aliases canonicalize; Spark round-trip (SURVEY §1.2)") {
    assert(WarehouseTypes.canonicalTypeName("integer") === "INT64")
    assert(WarehouseTypes.canonicalTypeName("DECIMAL") === "NUMERIC")
    assert(WarehouseTypes.toSpark("BIGINT") === LongType)
    assert(WarehouseTypes.toSpark("NUMERIC") === DecimalType(38, 9))
    assert(WarehouseTypes.toSpark("DATETIME") === TimestampNTZType)
    assert(WarehouseTypes.fromSpark(LongType) === "int64")
    assert(WarehouseTypes.fromSpark(ArrayType(StringType)) === "array<string>")
  }

  test("nested schema flattens to dotted paths with array rendering (S4)") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("user", StructType(Seq(
        StructField("name", StringType,
          metadata = new MetadataBuilder().putString("comment", "the name").build()),
        StructField("scores", ArrayType(DoubleType))))),
      StructField("tags", ArrayType(StringType))))
    val flat = WarehouseTypes.flattenSchema(schema)
    assert(flat.map(c => c.name -> c.dataType) === Seq(
      "id" -> "int64",
      "user.name" -> "string",
      "user.scores" -> "array<float64>",
      "tags" -> "array<string>"))
    assert(flat.find(_.name == "user.name").get.description === "the name")
  }

  test("descriptions rebuild preserves structure and applies dotted paths") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("user", StructType(Seq(StructField("name", StringType))))))
    val updated = WarehouseTypes.withDescriptions(schema,
      Map("id" -> "pk", "user.name" -> "who"))
    assert(WarehouseTypes.descriptionMap(updated) ===
      Map("id" -> "pk", "user.name" -> "who"))
    // unknown paths ignored, structure unchanged
    assert(WarehouseTypes.withDescriptions(schema, Map("nope" -> "x")).treeString
      === schema.treeString)
  }
}
