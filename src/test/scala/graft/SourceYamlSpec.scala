package graft

import java.nio.file.{Files, Path}
import org.scalatest.funsuite.AnyFunSuite
import graft.manifest.SourceYaml
import graft.manifest.SourceYaml.NewTable

/** S15 — source-definition YAML read/write
  * (project.py:320-361, source/create.py:326-404). */
class SourceYamlSpec extends AnyFunSuite {

  private val sample =
    """version: 2
      |
      |sources:
      |  - name: crm
      |    database: acme-ingest
      |    schema: crm_raw
      |    description: "CRM export"
      |    tables:
      |      - name: accounts
      |        description: |
      |          All accounts.
      |          One row per account.
      |        columns:
      |          - name: id
      |            description: pk
      |      - name: contacts
      |        description: 'People'
      |  - name: billing
      |    database: acme-ingest
      |    schema: billing_raw
      |    tables: []
      |""".stripMargin

  private def tmpSources(): Path = {
    val dir = Files.createTempDirectory("graft_sources")
    Files.write(dir.resolve("crm.yml"), sample.getBytes("UTF-8"))
    dir
  }

  test("readSourceTables returns sorted table map and name-sorted sources (S15 read)") {
    val (tables, sources) = SourceYaml.readSourceTables(tmpSources())
    assert(tables.keys.toSeq === Seq("crm.accounts", "crm.contacts"))
    assert(tables("crm.accounts") === "All accounts.\nOne row per account.")
    assert(tables("crm.contacts") === "People")
    assert(sources.map(_.name) === Seq("billing", "crm"))
    val crm = sources.find(_.name == "crm").get
    assert(crm.project === "acme-ingest" && crm.dataset === "crm_raw")
    assert(crm.tables === Seq("accounts", "contacts"))
  }

  test("writeSourceFile creates a new file with version header and columns") {
    val f = Files.createTempDirectory("graft_src_new").resolve("web.yml")
    SourceYaml.writeSourceFile(f, "web", "Web events", "acme-ingest", "web_raw",
      Seq(NewTable("pageviews", "Raw pageviews",
        Seq("id" -> "pk", "url" -> "page url"))))
    val (tables, sources) = SourceYaml.readSourceTables(f.getParent)
    assert(tables === Map("web.pageviews" -> "Raw pageviews"))
    assert(sources.head.dataset === "web_raw")
    val text = new String(Files.readAllBytes(f), "UTF-8")
    assert(text.startsWith("version: 2"))
    assert(text.contains("- name: pageviews"))
  }

  test("writeSourceFile appends tables to an existing source, preserving others") {
    val dir = tmpSources()
    val f = dir.resolve("crm.yml")
    SourceYaml.writeSourceFile(f, "crm", "", "acme-ingest", "crm_raw",
      Seq(NewTable("leads", "New leads", Nil)))
    val (tables, sources) = SourceYaml.readSourceTables(dir)
    assert(tables.keys.toSeq === Seq("crm.accounts", "crm.contacts", "crm.leads"))
    // the untouched billing source and the multiline description survive
    assert(sources.map(_.name) === Seq("billing", "crm"))
    assert(tables("crm.accounts") === "All accounts.\nOne row per account.")
  }

  test("writeSourceFile adds a new source entry next to existing ones") {
    val dir = tmpSources()
    val f = dir.resolve("crm.yml")
    SourceYaml.writeSourceFile(f, "erp", "ERP", "acme-ingest", "erp_raw",
      Seq(NewTable("invoices", "", Seq("id" -> ""))))
    val (_, sources) = SourceYaml.readSourceTables(dir)
    assert(sources.map(_.name) === Seq("billing", "crm", "erp"))
    assert(sources.find(_.name == "erp").get.tables === Seq("invoices"))
  }

  test("render/parse round-trips the subset") {
    val doc = SourceYaml.parse(sample)
    val doc2 = SourceYaml.parse(SourceYaml.render(doc))
    assert(doc2 === doc)
  }
}
