package graft.manifest

/** Model-file sink (S16, dbtwiz/model/create.py:402-486,512-581): emit the
  * `.sql` body and `.yml` config for a new model. The engine emits Spark
  * SQL; the YAML is rendered directly (the config tree is small and
  * flat-ish — no YAML library in the dependency set, none needed).
  */
object ModelFiles {

  /** SQL body per layer/materialization (get_sql, create.py:400-430). */
  def sqlBody(layer: String, materialization: String, source: Option[String]): String =
    if (layer == "staging" && source.isDefined) {
      val Array(sourceName, tableName) = source.get.split("\\.", 2)
      s"""with
         |    source as (select * from {{ source("$sourceName", "$tableName") }}),
         |
         |    renamed as (
         |        select
         |            *
         |        from source
         |    )
         |
         |select *
         |from renamed
         |""".stripMargin
    } else if (materialization == "scd2") {
      """{{ scd2(
        |    source_model = ref(""),
        |    partition_date_column = "",
        |    primary_key_columns = [""],
        |    tracked_columns = [""],
        |    untracked_columns = [],
        |    custom_filter = none,
        |    custom_column_expressions = none,
        |    initial_partition="2023-01-01"
        |) }}
        |""".stripMargin
    } else "{# SQL placeholder #}\n"

  /** Model config per materialization (get_config, create.py:438-486):
    * incremental gets insert_overwrite + date partitioning + required
    * partition filter + additive schema evolution; scd2 folds to
    * incremental+merge. Returned as ordered key/value pairs. */
  def config(materialization: String,
             expirationVar: Option[String] = None,
             frequency: Option[String] = None,
             group: Option[String] = None): Seq[(String, String)] = {
    val base = scala.collection.mutable.ListBuffer.empty[(String, String)]
    materialization match {
      case "incremental" =>
        base += "materialized" -> "incremental"
        base += "incremental_strategy" -> "insert_overwrite"
        base += "partition_by" -> "{field: partitiondate, data_type: date}"
        expirationVar.foreach(v =>
          base += "partition_expiration_days" -> s"{{ var('$v') }}")
        base += "require_partition_filter" -> "true"
        base += "on_schema_change" -> "append_new_columns"
      case "scd2" =>
        base += "materialized" -> "incremental"
        base += "incremental_strategy" -> "merge"
        base += "unique_key" -> "['']"
      case m =>
        base += "materialized" -> m
    }
    frequency.foreach(f => base += "tags" -> s"[$f]")
    group.foreach(g => base += "group" -> g)
    base.toSeq
  }

  /** Render the model `.yml` (schema file) text. */
  def ymlText(name: String, description: String,
              config: Seq[(String, String)]): String = {
    val cfg = config.map { case (k, v) => s"      $k: $v" }.mkString("\n")
    s"""version: 2
       |
       |models:
       |  - name: $name
       |    description: "${capitalized(description)}"
       |    config:
       |$cfg
       |""".stripMargin
  }

  /** F14 — the reader matching [[config]]'s `{{ var('…') }}` writer
    * (partition.py:39-43): pull the var name back out of a rendered
    * expiration value so the declared TTL can be reconciled against the
    * live table. The reference splits on single quotes and takes the
    * second field; anything not starting with `{{ var(` is not a var
    * reference. */
  def extractVarName(value: String): Option[String] = {
    val t = value.trim
    if (!t.startsWith("{{ var(")) None
    else t.split("'").lift(1)
  }

  /** F13 — first-letter capitalization of descriptions
    * (create.py:129, source/create.py:153). */
  def capitalized(s: String): String =
    if (s.isEmpty) s else s.head.toUpper +: s.tail

  /** Model naming rule `<layer-abbr>_<domain>__<identifier>`
    * (README.md:80-84, config/project.py:127-130). */
  def modelFileName(layerAbbr: String, domain: String, identifier: String): String =
    s"${layerAbbr}_${domain}__$identifier"
}
