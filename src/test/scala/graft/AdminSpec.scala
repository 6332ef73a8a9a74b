package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.admin.{Admin, Migrate}
import graft.admin.Admin.Grant
import graft.core.{TableMeta, Warehouse}
import graft.manifest.{Manifest, ManifestIO, ModelFiles, ModelNode}

/** Admin dataflows: orphans, grants diff, descriptions diff, partition
  * reconcile, migrate-with-rollback, manifest IO, model-file sink. */
class AdminSpec extends AnyFunSuite {
  import TestSession._

  private def freshWh(): Warehouse =
    new Warehouse(spark, Files.createTempDirectory("admin_spec").toString)

  private def model(name: String, schema: String, mat: String = "table") =
    ModelNode(s"model.proj.$name", "proj", schema, name, materialized = mat)

  test("orphanedTables: warehouse minus manifest, with temp-table and guard rules") {
    import spark.implicits._
    val wh = freshWh()
    wh.overwrite("core", "known", Seq((1, "a")).toDF("id", "v"))
    wh.overwrite("core", "orphan", Seq((2, "b")).toDF("id", "v"))
    wh.overwrite("core", "x__dbt_tmp_1", Seq((3, "c")).toDF("id", "v"))
    val m = Manifest(Seq(model("known", "core"),
      model("eph", "core", "ephemeral")))
    assert(Admin.orphanedTables(wh, m) === Seq(("core", "orphan")))
    // empty manifest side → report nothing (cleanup.py:89-101 guard)
    val empty = Manifest(Seq(model("eph", "core", "ephemeral")))
    assert(Admin.orphanedTables(wh, empty) === Seq.empty)
  }

  test("matchDeletedFiles: exact or __-suffix match (J6)") {
    val got = Admin.matchDeletedFiles(Seq(("core", "orders")),
      Seq("orders", "mart_sales__orders", "other"))
    assert(got(("core", "orders")) === Seq("mart_sales__orders", "orders"))
  }

  test("grantsDiff: full-outer set difference per direction (J3)") {
    val desired = Seq(Grant("t1", "reader", "a"), Grant("t1", "reader", "b"))
    val current = Seq(Grant("t1", "reader", "b"), Grant("t1", "reader", "c"))
    val (grant, revoke) = Admin.grantsDiff(desired, current)
    assert(grant === Seq(Grant("t1", "reader", "a")))
    assert(revoke === Seq(Grant("t1", "reader", "c")))
  }

  test("resolveGrantees: five-source union, dedup, sorted (A6)") {
    assert(Admin.resolveGrantees(Seq("u1"), Seq("team"), Seq("u1"), Seq("svc"),
      openAccess = true) === Seq("allAuthenticatedUsers", "svc", "team", "u1"))
  }

  test("descriptionDiff joins on lowercased dotted path (J4)") {
    val diff = Admin.descriptionDiff(
      declared = Map("User.Name" -> "who", "id" -> "pk", "skip" -> ""),
      live = Map("user.name" -> "", "id" -> "pk"))
    assert(diff === Seq(("user.name", "who", "")))
  }

  test("expirationMismatches compares declared vs live (J5)") {
    assert(Admin.expirationMismatches(
      declared = Map("a" -> Some(30), "b" -> None, "c" -> Some(7)),
      live = Map("a" -> Some(30), "b" -> Some(90))) ===
      Seq(("b", None, Some(90))))
  }

  test("estimatedBytes grows with data (S7 dry-run analog)") {
    import spark.implicits._
    val small = Admin.estimatedBytes(Seq(1).toDF("v"))
    val large = Admin.estimatedBytes((1 to 10000).toDF("v"))
    assert(small > 0 && large > small)
  }

  test("migrate: backup + deprecated redirect + grant merge") {
    import spark.implicits._
    val wh = freshWh()
    wh.overwrite("olds", "t", Seq((1, "old")).toDF("id", "v"))
    wh.overwrite("news", "t2", Seq((2, "new")).toDF("id", "v"))
    val grants = Seq(Grant("olds.t", "reader", "u1"), Grant("news.t2", "reader", "u2"))
    val r = Migrate.migrateTable(wh, "olds", "t", "news", "t2", grants)
    assert(r.migrated, r.reason)
    // backup holds the old data; old name serves the new data, tagged
    assert(Migrate.state(wh, "olds", "t__bck") === Migrate.Backup)
    assert(wh.read("olds", "t__bck").head().getString(1) === "old")
    assert(Migrate.state(wh, "olds", "t") === Migrate.Deprecated)
    assert(wh.read("olds", "t").head().getString(1) === "new")
    assert(r.grantsMerged.toSet ===
      Set(Grant("news.t2", "reader", "u1"), Grant("news.t2", "reader", "u2")))
  }

  test("migrate skips when states aren't as expected") {
    import spark.implicits._
    val wh = freshWh()
    wh.overwrite("olds", "t", Seq((1, "old")).toDF("id", "v"))
    // new table missing → skip, untouched
    val r = Migrate.migrateTable(wh, "olds", "t", "news", "missing")
    assert(!r.migrated && r.reason.contains("state wasn't as expected"))
    assert(Migrate.state(wh, "olds", "t") === Migrate.Exists)
    // pre-existing backup → skip
    wh.overwrite("news", "t2", Seq((2, "new")).toDF("id", "v"))
    wh.overwrite("olds", "t__bck", Seq((0, "x")).toDF("id", "v"))
    val r2 = Migrate.migrateTable(wh, "olds", "t", "news", "t2")
    assert(!r2.migrated)
  }

  test("manifest JSON round-trips through ManifestIO (S13)") {
    val json =
      """{
        |  "nodes": {
        |    "model.proj.stg_a": {"resource_type": "model", "database": "proj",
        |      "schema": "core", "name": "stg_a", "tags": ["daily"],
        |      "config": {"materialized": "view"}},
        |    "model.proj.mart_b": {"resource_type": "model", "database": "proj",
        |      "schema": "mart", "name": "mart_b",
        |      "config": {"materialized": "incremental"}},
        |    "test.proj.not_a_model": {"resource_type": "test", "name": "nope"}
        |  },
        |  "sources": {
        |    "source.proj.raw.ev": {"database": "proj", "schema": "landing",
        |      "name": "ev", "source_name": "raw", "identifier": "events"}
        |  },
        |  "parent_map": {"model.proj.mart_b": ["model.proj.stg_a"]}
        |}""".stripMargin
    val m = ManifestIO.parse(json)
    assert(m.models.keySet === Set("stg_a", "mart_b"))
    assert(m.models("mart_b").materialized === "incremental")
    assert(m.sources("ev").relationName === "proj.landing.events")
    assert(m.upstream("mart_b").map(_._1) === Set("model.proj.stg_a"))
    val cache = Files.createTempDirectory("mcache").resolve("models-cache.json")
    ManifestIO.writeModelsCache(m, cache)
    assert(Files.exists(cache))
  }

  test("staleness rules: 2h prod TTL and mtime-based cache freshness (S12/S14)") {
    val dir = Files.createTempDirectory("stale")
    val f = dir.resolve("manifest.json")
    assert(ManifestIO.prodManifestStale(f)) // missing
    Files.write(f, "{}".getBytes)
    val now = Files.getLastModifiedTime(f).toMillis
    assert(!ManifestIO.prodManifestStale(f, nowMillis = now + 1000))
    assert(ManifestIO.prodManifestStale(f,
      nowMillis = now + ManifestIO.ProdManifestTtlMillis + 1))
    val cache = dir.resolve("cache.json")
    assert(!ManifestIO.cacheFresh(f, cache)) // cache missing
    Files.write(cache, "{}".getBytes)
    assert(ManifestIO.cacheFresh(f, cache))
  }

  test("model-file sink: staging SQL, incremental config, naming, capitalization (S16/F13)") {
    val sql = ModelFiles.sqlBody("staging", "view", Some("raw.events"))
    assert(sql.contains("""{{ source("raw", "events") }}"""))
    val cfg = ModelFiles.config("incremental", expirationVar = Some("std-exp"))
    assert(cfg.contains("incremental_strategy" -> "insert_overwrite"))
    assert(cfg.contains("require_partition_filter" -> "true"))
    assert(cfg.contains("partition_expiration_days" -> "{{ var('std-exp') }}"))
    assert(ModelFiles.config("scd2").contains("incremental_strategy" -> "merge"))
    assert(ModelFiles.modelFileName("mrt", "sales", "orders") === "mrt_sales__orders")
    assert(ModelFiles.capitalized("hello") === "Hello")
    val yml = ModelFiles.ymlText("mrt_sales__orders", "orders mart",
      ModelFiles.config("table"))
    assert(yml.contains("materialized: table") && yml.contains("Orders mart"))
  }

  test("setColumnDescriptions persists comments through the schema DDL (J4 write path)") {
    import spark.implicits._
    val wh = freshWh()
    wh.overwrite("core", "desc", Seq((1, "a")).toDF("id", "v"))
    wh.setColumnDescriptions("core", "desc", Map("id" -> "primary key"))
    val live = graft.core.WarehouseTypes.descriptionMap(wh.schema("core", "desc"))
    assert(live === Map("id" -> "primary key"))
    assert(Admin.descriptionDiff(Map("id" -> "primary key", "v" -> "value"), live)
      === Seq(("v", "value", "")))
  }
}
