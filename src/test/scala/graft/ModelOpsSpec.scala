package graft

import java.nio.file.{Files, Path}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types.MetadataBuilder
import graft.manifest.{ModelOps, SourceYaml}
import graft.manifest.SourceYaml.{Mapp, Scalar, Seqq}

/** Validate/move flows: yml column sync against a live table, ref-call
  * rewriting on rename, and the safe/unsafe model move. */
class ModelOpsSpec extends AnyFunSuite {
  import TestSession._

  private val ymlText =
    """version: 2
      |
      |models:
      |  - name: mrt_orders
      |    description: Orders mart
      |    config:
      |      materialized: incremental
      |      incremental_strategy: insert_overwrite
      |      partition_by: '{field: day, data_type: date}'
      |      require_partition_filter: true
      |      tags: [hourly]
      |    columns:
      |      - name: order_id
      |        data_type: bigint
      |        description: Primary key
      |      - name: stale_col
      |        data_type: string
      |      - name: amount
      |        data_type: int
      |""".stripMargin

  test("yml column sync adds, retypes, describes, and drops vs the live table") {
    import ModelOps.LiveColumn
    val doc = SourceYaml.parse(ymlText)
    val live = Seq(
      LiveColumn("order_id", "bigint", Some("ignored — yml wins")),
      LiveColumn("amount", "double", None),               // retyped int → double
      LiveColumn("day", "date", Some("Partition day")))   // new column
    val (synced, updated) = ModelOps.syncYmlColumns(doc, live)
    assert(updated)
    val cols = synced match {
      case Mapp(top) => top("models") match {
        case Seqq(Seq(Mapp(m))) => m("columns") match {
          case Seqq(items) => items.collect { case Mapp(c) => c }
          case _ => fail("no columns")
        }
        case _ => fail("no model")
      }
      case _ => fail("no doc")
    }
    // table order, stale_col dropped
    assert(cols.map(_("name")) === Seq(Scalar("order_id"), Scalar("amount"), Scalar("day")))
    // existing description kept, missing filled
    assert(cols(0)("description") === Scalar("Primary key"))
    assert(cols(1)("data_type") === Scalar("double"))
    assert(cols(2)("description") === Scalar("Partition day"))
    // no-op second pass: already in sync
    val (_, again) = ModelOps.syncYmlColumns(synced,
      Seq(LiveColumn("order_id", "bigint", None), LiveColumn("amount", "double", None),
        LiveColumn("day", "date", None)))
    assert(!again)
  }

  test("syncYmlFile reads the live schema from a DataFrame (comment metadata)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_modelops")
    val yml = dir.resolve("mrt_orders.yml")
    Files.writeString(yml, ymlText)
    val df = Seq((1L, 2.5)).toDF("order_id", "amount")
      .withColumn("day", org.apache.spark.sql.functions.current_date())
      .withMetadata("day", new MetadataBuilder().putString("comment", "Partition day").build())
    assert(ModelOps.syncYmlFile(yml, df))
    val rendered = Files.readString(yml)
    assert(rendered.contains("day") && rendered.contains("Partition day"))
    assert(!rendered.contains("stale_col"))
  }

  private def projectTree(): Path = {
    val root = Files.createTempDirectory("graft_move")
    val staging = root.resolve("models/1_staging/shop")
    val marts = root.resolve("models/3_marts/shop")
    Files.createDirectories(staging); Files.createDirectories(marts)
    Files.writeString(staging.resolve("stg_shop__orders.sql"),
      "select * from {{ source('shop', 'orders') }}\n")
    Files.writeString(staging.resolve("stg_shop__orders.yml"),
      """version: 2
        |models:
        |  - name: stg_shop__orders
        |    config:
        |      materialized: incremental
        |      incremental_strategy: insert_overwrite
        |      partition_expiration_days: 30
        |""".stripMargin)
    Files.writeString(marts.resolve("mrt_shop__daily.sql"),
      """select day, count(*) n
        |from {{ ref('stg_shop__orders') }}
        |join {{ REF( "stg_shop__orders" ) }} using (day)
        |group by day
        |""".stripMargin)
    Files.writeString(marts.resolve("mrt_other.sql"),
      "select * from {{ ref('stg_other__thing') }}\n")
    root
  }

  test("updateModelReferences rewrites flexible-spacing ref calls project-wide") {
    val root = projectTree()
    val n = ModelOps.updateModelReferences(root.resolve("models"),
      "stg_shop__orders", "stg_commerce__orders")
    assert(n === 2) // both call shapes in mrt_shop__daily.sql
    val rewritten = Files.readString(
      root.resolve("models/3_marts/shop/mrt_shop__daily.sql"))
    assert(rewritten.contains("""ref("stg_commerce__orders")"""))
    assert(!rewritten.toLowerCase.contains("stg_shop__orders"))
    // unrelated refs untouched
    assert(Files.readString(root.resolve("models/3_marts/shop/mrt_other.sql"))
      .contains("stg_other__thing"))
  }

  test("safe move leaves a view shim pointing at the new model") {
    val root = projectTree()
    ModelOps.moveModel(root.resolve("models/1_staging"), "stg_shop__orders",
      root.resolve("models/2_intermediate/shop"), "int_shop__orders", safe = true)
    val newSql = root.resolve("models/2_intermediate/shop/int_shop__orders.sql")
    val newYml = root.resolve("models/2_intermediate/shop/int_shop__orders.yml")
    assert(Files.readString(newSql).contains("source('shop', 'orders')"))
    assert(Files.readString(newYml).contains("name: int_shop__orders"))
    val shimSql = Files.readString(root.resolve("models/1_staging/shop/stg_shop__orders.sql"))
    assert(shimSql === "select * from {{ ref(\"int_shop__orders\") }}\n")
    val shimYml = Files.readString(root.resolve("models/1_staging/shop/stg_shop__orders.yml"))
    assert(shimYml.contains("name: stg_shop__orders"))
    assert(shimYml.contains("materialized: view"))
    assert(shimYml.contains("is_tmp_old_copy"))
    assert(!shimYml.contains("incremental_strategy") &&
      !shimYml.contains("partition_expiration_days"))
  }

  test("unsafe move deletes the old files; failure rolls back new ones") {
    val root = projectTree()
    ModelOps.moveModel(root.resolve("models/1_staging"), "stg_shop__orders",
      root.resolve("models/2_intermediate/shop"), "int_shop__orders", safe = false)
    assert(!Files.exists(root.resolve("models/1_staging/shop/stg_shop__orders.sql")))
    assert(!Files.exists(root.resolve("models/1_staging/shop/stg_shop__orders.yml")))
    assert(Files.exists(root.resolve("models/2_intermediate/shop/int_shop__orders.sql")))
    // rollback: a model with no yml fails AFTER writing the new sql — the
    // new file must not survive
    val root2 = projectTree()
    Files.delete(root2.resolve("models/1_staging/shop/stg_shop__orders.yml"))
    intercept[Exception] {
      ModelOps.moveModel(root2.resolve("models/1_staging"), "stg_shop__orders",
        root2.resolve("models/2_intermediate/shop"), "int_shop__orders")
    }
    assert(!Files.exists(root2.resolve("models/2_intermediate/shop/int_shop__orders.sql")))
  }
}
