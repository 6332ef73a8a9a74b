package graft

import java.nio.file.{Files, Path}
import org.scalatest.funsuite.AnyFunSuite
import graft.admin.{Admin, Validators}
import graft.config.{DbtProject, Profiles, ProjectConfig, Toml}
import graft.core.TimeParse
import graft.manifest.ModelFiles

/** Config-tree layer (SURVEY §2 "Config trees"): pyproject
  * [tool.dbtwiz.project], dbt_project.yml vars, profiles.yml env_var
  * resolution — plus the small F-ports they feed (timestamp parse, Jinja
  * var extraction, validators, augmented-docs strip). Fixture mirrors the
  * reference's tests/data/sample_dbt_project, extended with the var
  * dictionaries the grants/TTL flows consume. */
class ConfigSpec extends AnyFunSuite {

  private def fixtureTree(): Path = {
    val root = Files.createTempDirectory("graft_cfg")
    Files.writeString(root.resolve("pyproject.toml"),
      """[build-system]
        |requires = ["setuptools>=61.0", "wheel"]
        |
        |[project]
        |name = "sample-dbt-project"
        |
        |[tool.dbtwiz.project]
        |backfill_default_batch_size = 15   # days per backfill job
        |default_materialization = "table"
        |default_partition_expiration_days = 365
        |teams = ["team1", "team2"]
        |access_policies = ["policy1", "policy2"]
        |service_consumers = ["consumer1", "consumer2"]
        |grants_skip_schemas = ["elementary"]
        |grants_open_access_group = "group:all-users@example.com"
        |user_project = "test-user-project"
        |
        |[tool.dbtwiz.project.layers]
        |staging = { folder = "1_staging", abbreviation = "stg" }
        |marts = { folder = "3_marts", abbreviation = "mrt", description = "Curated marts" }
        |""".stripMargin)
    Files.writeString(root.resolve("dbt_project.yml"),
      """name: sample_dbt_project
        |profile: default
        |config-version: 2
        |
        |vars:
        |  marts-data-expiration: 400
        |  temp-data-expiration: 30
        |  teams:
        |    team1:
        |      description: First team
        |      principal: "group:team1@example.com"
        |    team2:
        |      description: Second team
        |  access-policies:
        |    policy1:
        |      description: Open policy
        |      principal:
        |        - "group:consumers@example.com"
        |        - "serviceAccount:svc@example.iam.gserviceaccount.com"
        |  service-consumers:
        |    consumer1:
        |      description: Downstream app
        |      principal: "serviceAccount:app@example.iam.gserviceaccount.com"
        |
        |models:
        |  sample_dbt_project:
        |    +group: analytics
        |    1_staging:
        |      +materialized: view
        |    3_marts:
        |      +access: protected
        |      subscription:
        |        +group: subs_team
        |""".stripMargin)
    val profDir = root.resolve(".profiles")
    Files.createDirectories(profDir)
    Files.writeString(profDir.resolve("profiles.yml"),
      """default:
        |  outputs:
        |    dev:
        |      type: bigquery
        |      project: "{{ env_var('GRAFT_DEV_PROJECT') }}"
        |      dataset: "{{ env_var('GRAFT_DATASET', 'dev_fallback') }}"
        |      threads: 8
        |    prod:
        |      type: bigquery
        |      project: fixed-prod
        |""".stripMargin)
    root
  }

  test("pyproject [tool.dbtwiz.project] parses with defaults and lists") {
    val s = ProjectConfig.load(fixtureTree())
    assert(s.backfillDefaultBatchSize === 15)
    assert(s.defaultMaterialization === "table")
    assert(s.defaultPartitionExpirationDays === Some(365))
    assert(s.teams === Seq("team1", "team2"))
    assert(s.accessPolicies === Seq("policy1", "policy2"))
    assert(s.serviceConsumers === Seq("consumer1", "consumer2"))
    assert(s.grantsSkipSchemas === Seq("elementary"))
    assert(s.grantsOpenAccessGroup === Some("group:all-users@example.com"))
    assert(s.grantsRole === "roles/bigquery.dataViewer") // default
    assert(s.setting("user_project") === Some("test-user-project"))
  }

  test("layer entries resolve with folder/abbreviation and description fallback") {
    val s = ProjectConfig.load(fixtureTree())
    assert(s.layerDetails === scala.collection.immutable.ListMap(
      "staging" -> (("1_staging", "stg")), "marts" -> (("3_marts", "mrt"))))
    assert(s.layers.map(_.choiceDescription) === Seq("Staging layer", "Curated marts"))
  }

  test("config validation rejects out-of-range batch size and bad materialization") {
    val root = Files.createTempDirectory("graft_cfg_bad")
    Files.writeString(root.resolve("pyproject.toml"),
      "[tool.dbtwiz.project]\nbackfill_default_batch_size = 900\n")
    intercept[IllegalArgumentException] { ProjectConfig.load(root) }
    Files.writeString(root.resolve("pyproject.toml"),
      "[tool.dbtwiz.project]\ndefault_materialization = \"matview\"\n")
    intercept[IllegalArgumentException] { ProjectConfig.load(root) }
  }

  test("findRoot walks upward to the pyproject directory") {
    val root = fixtureTree()
    val nested = root.resolve("models").resolve("3_marts")
    Files.createDirectories(nested)
    assert(ProjectConfig.findRoot(nested) === root.toAbsolutePath)
  }

  test("dbt_project vars: identity, choice dictionaries, expirations") {
    val p = DbtProject.load(fixtureTree())
    assert(p.name === "sample_dbt_project")
    assert(p.profile === "default")
    assert(p.teams === Seq("team1" -> "First team", "team2" -> "Second team"))
    assert(p.accessPolicies === Seq("policy1" -> "Open policy"))
    assert(p.serviceConsumers === Seq("consumer1" -> "Downstream app"))
    // reference description format: "Used for <key − expiration, dashes→spaces> (N days)"
    assert(p.dataExpirations === Seq(
      ("marts-data-expiration", 400, "Used for marts data (400 days)"),
      ("temp-data-expiration", 30, "Used for temp data (30 days)")))
    assert(p.varInt("marts-data-expiration") === Some(400))
    assert(p.varInt("nope") === None)
  }

  test("models-tree +group/+access inheritance: deeper levels override") {
    val p = DbtProject.load(fixtureTree())
    assert(p.inheritedModelConfig("1_staging", "any") === (Some("analytics"), None))
    assert(p.inheritedModelConfig("3_marts", "other") === (Some("analytics"), Some("protected")))
    assert(p.inheritedModelConfig("3_marts", "subscription") === (Some("subs_team"), Some("protected")))
  }

  test("profiles resolve env_var with and without defaults, per search order") {
    val root = fixtureTree()
    val env = Map("GRAFT_DEV_PROJECT" -> "dev-project-123")
    val prof = Profiles.load(root, env, home = root) // no ~/.dbt in fixture
    assert(prof.targets === Seq("dev", "prod"))
    val dev = prof.profileConfig("dev", env)
    assert(dev("project") === "dev-project-123")
    assert(dev("dataset") === "dev_fallback") // env var absent → default
    assert(dev("threads") === "8")
    assert(prof.profileConfig("prod", env)("project") === "fixed-prod")
    // DBT_PROFILES_DIR wins over <root>/.profiles
    val other = Files.createTempDirectory("graft_profdir")
    Files.writeString(other.resolve("profiles.yml"),
      "default:\n  outputs:\n    dev:\n      project: from-env-dir\n")
    val viaEnv = Profiles.load(root, env + ("DBT_PROFILES_DIR" -> other.toString), home = root)
    assert(viaEnv.profileConfig("dev", env)("project") === "from-env-dir")
  }

  test("desiredGrantees resolves meta names through the config trees") {
    val root = fixtureTree()
    val p = DbtProject.load(root)
    val s = ProjectConfig.load(root)
    val got = Admin.desiredGrantees(
      explicit = Seq("group:explicit@example.com"),
      metaTeams = Seq("team1"), metaAccessPolicies = Seq("policy1"),
      metaServiceConsumers = Seq("consumer1"),
      project = p, settings = s, access = Some("protected"), nodeName = "mrt_x")
    assert(got === Seq(
      "group:all-users@example.com", // open-access group (protected)
      "group:consumers@example.com",
      "group:explicit@example.com",
      "group:team1@example.com",
      "serviceAccount:app@example.iam.gserviceaccount.com",
      "serviceAccount:svc@example.iam.gserviceaccount.com"))
    // private access → no open-access group
    val priv = Admin.desiredGrantees(Nil, Seq("team1"), Nil, Nil, p, s, None, "m")
    assert(priv === Seq("group:team1@example.com"))
    // team2 exists but has no principal → contributes nothing
    assert(Admin.desiredGrantees(Nil, Seq("team2"), Nil, Nil, p, s, None, "m") === Nil)
    // unknown name fails with the valid choices
    val ex = intercept[IllegalArgumentException] {
      Admin.desiredGrantees(Nil, Seq("ghost"), Nil, Nil, p, s, None, "mrt_x")
    }
    assert(ex.getMessage.contains("mrt_x") && ex.getMessage.contains("team1|team2"))
    // error names the model-meta key (access-policy), not the var-dict key
    val exPolicy = intercept[IllegalArgumentException] {
      Admin.desiredGrantees(Nil, Nil, Seq("ghost"), Nil, p, s, None, "mrt_x")
    }
    assert(exPolicy.getMessage.contains("Unable to find access-policy with name 'ghost'"))
    // empty/absent access dict short-circuits to Nil instead of raising (grants.py:19)
    assert(Admin.collectPrincipals(Seq("anything"), p, "no-such-dict", "no-such-dict", "m") === Nil)
    // non-group/SA principal is rejected
    intercept[IllegalArgumentException] {
      Admin.desiredGrantees(Seq("user:someone@example.com"), Nil, Nil, Nil, p, s, None, "m")
    }
  }

  test("resolveAllGrants sweeps the manifest with skips and collected errors") {
    import graft.manifest.ModelNode
    val root = fixtureTree()
    val p = DbtProject.load(root)
    val s = ProjectConfig.load(root)
    def node(name: String, schema: String = "mart",
             meta: Map[String, String] = Map.empty,
             materialized: String = "table", pkg: String = "mine") =
      ModelNode(uniqueId = s"model.mine.$name", database = "proj", schema = schema,
        name = name, meta = meta, materialized = materialized, packageName = pkg)
    val sweep = Admin.resolveAllGrants(
      Seq(
        node("m_teams", meta = Map("teams" -> "team1")),
        node("m_multi", meta = Map("access-policy" -> "policy1", "access" -> "protected")),
        node("m_eph", meta = Map("teams" -> "team1"), materialized = "ephemeral"),
        node("m_skip", meta = Map("teams" -> "team1", "skip_grants" -> "true")),
        node("m_elem", pkg = "elementary"),
        node("m_unknown", meta = Map("teams" -> "ghost")),
        node("m_none"),
        node("m_none_ok", schema = "elementary")),
      explicitGrants = Map("m_teams" -> Seq("group:extra@example.com")),
      project = p, settings = s)
    assert(sweep.desired(("proj", "mart"))("m_teams") ===
      Seq("group:extra@example.com", "group:team1@example.com"))
    assert(sweep.desired(("proj", "mart"))("m_multi") === Seq(
      "group:all-users@example.com", "group:consumers@example.com",
      "serviceAccount:svc@example.iam.gserviceaccount.com"))
    assert(sweep.skipped === 3) // ephemeral + skip_grants + skip-schema no-config
    assert(sweep.errors.exists(_.contains("ghost")))
    assert(sweep.errors.exists(_.contains("m_none")))
    assert(!sweep.desired.contains(("proj", "elementary")))
  }

  test("missingSourceReaders: dataset-level access wins, table-level is per-table") {
    val missing = Admin.missingSourceReaders(
      datasetReaders = Set("sa-ds@x.iam"),
      tableReaders = Map("t1" -> Set("sa-t1@x.iam"), "t2" -> Set("sa-t1@x.iam", "sa-t2@x.iam")),
      serviceAccounts = Seq("sa-ds@x.iam", "sa-t1@x.iam", "sa-t2@x.iam"),
      tables = Seq("t1", "t2"))
    assert(missing === Map("sa-t2@x.iam" -> Seq("t1")))
  }

  test("checkSourceReaders is config-fed and skips unchecked projects") {
    val root = Files.createTempDirectory("graft_cfg_sa")
    Files.writeString(root.resolve("pyproject.toml"),
      """[tool.dbtwiz.project]
        |source_reader_service_accounts = { "sa-etl@x.iam" = "nightly ETL", "sa-bi@x.iam" = "dashboards" }
        |source_reader_unchecked_projects = ["trusted-proj"]
        |""".stripMargin)
    val s = ProjectConfig.load(root)
    assert(s.sourceReaderServiceAccounts ===
      scala.collection.immutable.ListMap("sa-etl@x.iam" -> "nightly ETL", "sa-bi@x.iam" -> "dashboards"))
    assert(Admin.checkSourceReaders(s, "trusted-proj",
      Set.empty, Map.empty, Seq("t")) === Map.empty)
    val missing = Admin.checkSourceReaders(s, "other-proj",
      datasetReaders = Set("sa-bi@x.iam"), tableReaders = Map.empty, tables = Seq("t"))
    assert(missing === Map("sa-etl@x.iam" -> Seq("t")))
  }

  test("declared partition expirations resolve literals and var references") {
    val p = DbtProject.load(fixtureTree())
    assert(Admin.resolveDeclaredExpiration("180", p) === 180)
    assert(Admin.resolveDeclaredExpiration("{{ var('marts-data-expiration') }}", p) === 400)
    assert(Admin.resolveDeclaredExpiration("{{ var('unknown-var') }}", p) === 0)
    assert(ModelFiles.extractVarName("{{ var('x-data-expiration') }}") === Some("x-data-expiration"))
    assert(ModelFiles.extractVarName("365") === None)
    // round-trip with the writer
    val written = ModelFiles.config("incremental", expirationVar = Some("marts-data-expiration"))
      .toMap.apply("partition_expiration_days")
    assert(Admin.resolveDeclaredExpiration(written, p) === 400)
  }

  test("emptyDevelopmentDataset drops every table in the profile's dataset") {
    import TestSession._
    import spark.implicits._
    val root = fixtureTree()
    val env = Map("GRAFT_DATASET" -> "dev_sandbox")
    val prof = Profiles.load(root, env, home = root)
    val wh = new graft.core.Warehouse(spark, Files.createTempDirectory("graft_dev").toString)
    wh.overwrite("dev_sandbox", "t1", Seq((1, "a")).toDF("id", "v"))
    wh.overwrite("dev_sandbox", "t2", Seq((2, "b")).toDF("id", "v"))
    wh.overwrite("mart", "keep", Seq((3, "c")).toDF("id", "v"))
    val dropped = Admin.emptyDevelopmentDataset(wh, prof, "dev", env)
    assert(dropped === Seq("t1", "t2"))
    assert(wh.listTables("dev_sandbox").isEmpty)
    assert(wh.listTables("mart") === Seq("keep"))
  }

  test("validators accept/reject per the reference rules (F10)") {
    assert(Validators.validateName("my_model9").isRight)
    assert(Validators.validateName("9bad").isLeft)
    assert(Validators.validateName("bad_").isLeft)
    assert(Validators.validateName("Bad").isLeft)
    assert(Validators.validateDatasetName("INFORMATION_SCHEMA").isRight)
    assert(Validators.validateDatasetName("my_ds").isRight)
    assert(Validators.validateDatasetName("MY_DS").isLeft)
    assert(Validators.validateTableName("INFORMATION_SCHEMA")("TABLES").isRight)
    assert(Validators.validateTableName("INFORMATION_SCHEMA")("tables").isLeft)
    assert(Validators.validateTableName("mart")("orders").isRight)
    assert(Validators.validateTableName("mart")("Orders").isLeft)
    assert(Validators.validateDescription("Describes things").isRight)
    assert(Validators.validateDescription(" leading space").isLeft)
  }

  test("timestamp parse accepts epoch ms and the six datetime shapes (F5)") {
    assert(TimeParse.parseTimestamp("1234567890123") === 1234567890123L)
    assert(TimeParse.parseTimestamp("2024-01-15T10:30:00") === 1705314600000L)
    assert(TimeParse.parseTimestamp("2024-01-15 10:30:00") === 1705314600000L)
    assert(TimeParse.parseTimestamp("2024-01-15T10:30:00.250000") === 1705314600250L)
    assert(TimeParse.parseTimestamp("2024-01-15 10:30:00.250000") === 1705314600250L)
    // short fractions parse like Python's %f (1-6 digits)
    assert(TimeParse.parseTimestamp("2024-01-15T10:30:00.5") === 1705314600500L)
    assert(TimeParse.parseTimestamp("2024-01-15T10:30:00Z") === 1705314600000L)
    assert(TimeParse.parseTimestamp("2024-01-15") === 1705276800000L)
    intercept[IllegalArgumentException] { TimeParse.parseTimestamp("15/01/2024") }
    intercept[IllegalArgumentException] { // digits overflowing Long: format error, not NumberFormatException
      TimeParse.parseTimestamp("99999999999999999999")
    }
    assert(TimeParse.withinTimeTravelWindow(1000L, 1000L + 7L * 86400000))
    assert(!TimeParse.withinTimeTravelWindow(1000L, 1001L + 7L * 86400000))
  }

  test("augmented-docs sentinel strip keeps only dbt-authored text (F16)") {
    val s = Admin.AugmentedStart
    val e = Admin.AugmentedEnd
    assert(Admin.stripAugmentedDocs(s"Authored.\n$s\ngenerated\n$e\nTail kept.") === "Tail kept.")
    assert(Admin.stripAugmentedDocs(s"Authored.\n$s\nunterminated") === "Authored.")
    assert(Admin.stripAugmentedDocs("No sentinels here") === "No sentinels here")
    assert(Admin.stripAugmentedDocs("") === "")
  }

  test("TOML subset: comments, inline tables, arrays, dotted sections") {
    val t = Toml.parse(
      """# top comment
        |[a.b]
        |x = 5          # trailing
        |s = "has # not a comment"
        |arr = [1, 2, 3]
        |tbl = { k = "v", n = 2 }
        |flag = true
        |""".stripMargin)
    assert(Toml.num(Toml.at(t, "a", "b", "x")) === Some(5L))
    assert(Toml.str(Toml.at(t, "a", "b", "s")) === Some("has # not a comment"))
    assert(Toml.at(t, "a", "b", "arr") === Some(Toml.Arr(Seq(Toml.Num(1), Toml.Num(2), Toml.Num(3)))))
    assert(Toml.str(Toml.at(t, "a", "b", "tbl", "k")) === Some("v"))
    assert(Toml.at(t, "a", "b", "flag") === Some(Toml.Bool(true)))
    val t2 = Toml.parse("[a]\nratio = 0.8\nneg = -5\n")
    assert(Toml.at(t2, "a", "ratio") === Some(Toml.Dbl(0.8)))
    assert(Toml.num(Toml.at(t2, "a", "neg")) === Some(-5L))
    // multi-line arrays (the layout poetry/black emit)
    val t3 = Toml.parse(
      """[a]
        |deps = [
        |  "x",
        |  "y[extra]",
        |]
        |""".stripMargin)
    assert(Toml.strings(Toml.at(t3, "a", "deps")) === Seq("x", "y[extra]"))
    // unquoted bare word fails with a diagnostic, not a raw NumberFormatException
    val ex = intercept[IllegalArgumentException] {
      Toml.parse("[a]\nrole = roles/bigquery.dataViewer\n")
    }
    assert(ex.getMessage.contains("missing quotes"))
  }

  test("empty *-data-expiration vars are ignored, not a crash") {
    val root = Files.createTempDirectory("graft_cfg_emptyvar")
    Files.writeString(root.resolve("dbt_project.yml"),
      "name: p\nvars:\n  gdpr-data-expiration:\n  ok-data-expiration: 30\n")
    val p = DbtProject.load(root)
    assert(p.dataExpirations.map(_._1) === Seq("ok-data-expiration"))
  }
}
