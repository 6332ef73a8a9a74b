package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Warehouse
import graft.manifest.{Manifest, ModelNode}
import graft.materialize.Build

/** Build orchestration edge cases beyond the oracle-gated q21 pipeline:
  * dependency ordering, ephemeral cycle detection, var errors, and
  * serving unselected upstream models from their existing tables. */
class BuildSpec extends AnyFunSuite {
  import TestSession._

  private def node(name: String, mat: String, schema: String = "mart") =
    ModelNode(uniqueId = s"model.g.$name", database = "proj", schema = schema,
      name = name, materialized = mat)

  private def freshWh() = new Warehouse(spark,
    Files.createTempDirectory("graft_build_spec").toString)

  test("topoOrder respects dependencies with deterministic tie-break") {
    val m = Manifest(
      models = Seq(node("mrt_b", "table"), node("mrt_a", "table"),
        node("int_x", "ephemeral"), node("stg_s", "view")),
      parentsByName = Map(
        "mrt_a" -> Seq("int_x"), "mrt_b" -> Seq("int_x"),
        "int_x" -> Seq("stg_s")))
    val b = new Build(freshWh(), m, Map.empty, (_, _) => fail("no sources"))
    assert(b.topoOrder(Seq("mrt_b", "mrt_a", "int_x", "stg_s")) ===
      Seq("stg_s", "int_x", "mrt_a", "mrt_b"))
  }

  test("ephemeral reference cycles are rejected, not looped") {
    import spark.implicits._
    val m = Manifest(
      models = Seq(node("int_a", "ephemeral"), node("int_b", "ephemeral"),
        node("mrt_c", "table")),
      parentsByName = Map("mrt_c" -> Seq("int_a")))
    val bodies = Map(
      "int_a" -> "SELECT * FROM {{ ref('int_b') }}",
      "int_b" -> "SELECT * FROM {{ ref('int_a') }}",
      "mrt_c" -> "SELECT * FROM {{ ref('int_a') }}")
    val b = new Build(freshWh(), m, bodies, (_, _) => Seq(1).toDF("x"))
    val ex = intercept[IllegalArgumentException] { b.render("mrt_c", Map.empty) }
    assert(ex.getMessage.contains("ephemeral cycle"))
  }

  test("undefined vars and unknown refs fail with the model named") {
    val m = Manifest(models = Seq(node("mrt_v", "table")))
    val b = new Build(freshWh(), m, Map(
      "mrt_v" -> "SELECT '{{ var('nope') }}' AS v"), (_, _) => fail("no sources"))
    val ex = intercept[IllegalArgumentException] { b.render("mrt_v", Map.empty) }
    assert(ex.getMessage.contains("nope") && ex.getMessage.contains("mrt_v"))
  }

  test("source views re-register per render: a second run never reuses stale data") {
    import spark.implicits._
    val m = Manifest(models = Seq(node("mrt_s", "table")))
    val body = Map("mrt_s" -> "SELECT count(*) AS n FROM {{ source('src', 't') }}")
    val run1 = new Build(freshWh(), m, body, (_, _) => Seq(1).toDF("x"))
    run1.run("mrt_s")
    // same session, different loader (the bench warmup→timed shape)
    val wh2 = freshWh()
    val run2 = new Build(wh2, m, body, (_, _) => Seq(1, 2, 3).toDF("x"))
    run2.run("mrt_s")
    assert(wh2.read("mart", "mrt_s").head().getLong(0) === 3L)
  }

  test("dollar signs in inlined ephemeral SQL survive the ref rewrite") {
    import spark.implicits._
    val m = Manifest(
      models = Seq(node("int_money", "ephemeral"), node("mrt_money", "table")),
      parentsByName = Map("mrt_money" -> Seq("int_money")))
    val bodies = Map(
      "int_money" -> "SELECT concat('US$', '5') AS amount FROM {{ source('s', 't') }}",
      "mrt_money" -> "SELECT amount FROM {{ ref('int_money') }}")
    val wh = freshWh()
    val b = new Build(wh, m, bodies, (_, _) => Seq(1).toDF("x"))
    b.run("mrt_money")
    assert(wh.read("mart", "mrt_money").head().getString(0) === "US$5")
  }

  test("unselected upstream models are served from their existing tables") {
    import spark.implicits._
    val wh = freshWh()
    // stg_base already materialized by a previous run
    wh.overwrite("staging", "stg_base", Seq((1, "a"), (2, "b")).toDF("id", "v"))
    val m = Manifest(
      models = Seq(node("stg_base", "table", schema = "staging"),
        node("mrt_top", "table")),
      parentsByName = Map("mrt_top" -> Seq("stg_base")))
    val b = new Build(wh, m, Map(
      "mrt_top" -> "SELECT count(*) AS n FROM {{ ref('stg_base') }}"),
      (_, _) => fail("no sources"))
    val results = b.run("mrt_top") // stg_base NOT selected
    assert(results.map(r => (r.model, r.action)) === Seq(("mrt_top", "table")))
    assert(wh.read("mart", "mrt_top").head().getLong(0) === 2L)
  }
}
