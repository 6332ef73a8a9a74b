package graft.manifest

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode

/** Manifest JSON source + models cache (S13/S14,
  * dbtwiz/dbt/manifest.py:31-74,151-171,216-220) and the staleness rules
  * for fetched prod manifests (S12, manifest.py:107-136).
  *
  * Parses the dbt manifest layout: `nodes` (keyed by unique_id, models
  * filtered by resource_type), `sources`, `parent_map`. Jackson ships with
  * Spark, so no extra dependency.
  */
object ManifestIO {

  private val mapper = new ObjectMapper()

  /** 2-hour prod-manifest cache TTL (manifest.py:124). */
  val ProdManifestTtlMillis: Long = 2L * 3600 * 1000

  /** S12 — re-download trigger: missing file or mtime older than the TTL. */
  def prodManifestStale(path: Path, ttlMillis: Long = ProdManifestTtlMillis,
                        nowMillis: Long = System.currentTimeMillis()): Boolean =
    !Files.exists(path) ||
      nowMillis - Files.getLastModifiedTime(path).toMillis > ttlMillis

  /** S14 — models-cache freshness: cache mtime at or after the manifest's
    * (manifest.py:61-74). */
  def cacheFresh(manifestPath: Path, cachePath: Path): Boolean =
    Files.exists(cachePath) && Files.exists(manifestPath) &&
      Files.getLastModifiedTime(cachePath).compareTo(
        Files.getLastModifiedTime(manifestPath)) >= 0

  private def text(n: JsonNode, field: String, default: String = ""): String =
    Option(n.get(field)).filterNot(_.isNull).map(_.asText).getOrElse(default)

  private def strings(n: JsonNode, field: String): Seq[String] =
    Option(n.get(field)).map(_.elements().asScala.map(_.asText).toSeq).getOrElse(Seq.empty)

  /** S13 — parse a manifest.json into the engine [[Manifest]]:
    * model nodes (manifest.py:281-309 projection), sources
    * (manifest.py:373-394), parent_map. */
  def load(path: Path): Manifest =
    parse(new String(Files.readAllBytes(path), StandardCharsets.UTF_8))

  def parse(json: String): Manifest = {
    val root = mapper.readTree(json)
    val models = Option(root.get("nodes")).map(_.properties().asScala.toSeq).getOrElse(Seq.empty)
      .map(e => (e.getKey, e.getValue))
      .filter { case (id, n) =>
        id.startsWith("model.") || text(n, "resource_type") == "model"
      }
      .map { case (id, n) =>
        val config = Option(n.get("config")).getOrElse(mapper.createObjectNode())
        ModelNode(
          uniqueId = id,
          database = text(n, "database"),
          schema = text(n, "schema"),
          name = text(n, "name"),
          alias = text(n, "alias"),
          path = text(n, "path"),
          tags = strings(n, "tags").toSet,
          meta = Option(n.get("meta")).map(_.properties().asScala
            .map(e => e.getKey -> e.getValue.asText).toMap).getOrElse(Map.empty),
          group = text(n, "group"),
          materialized = text(config, "materialized", "view"),
          description = text(n, "description"),
          packageName = text(n, "package_name"),
          deprecated = Option(n.get("deprecation_date")).exists(!_.isNull))
      }
    val sources = Option(root.get("sources")).map(_.properties().asScala.toSeq).getOrElse(Seq.empty)
      .map { e =>
        val n = e.getValue
        SourceNode(
          uniqueId = e.getKey,
          database = text(n, "database"),
          schema = text(n, "schema"),
          name = text(n, "name"),
          sourceName = text(n, "source_name"),
          identifier = text(n, "identifier"),
          description = text(n, "description"),
          tags = strings(n, "tags").toSet)
      }
    val parentMap = Option(root.get("parent_map")).map(_.properties().asScala
      .map(e => e.getKey -> e.getValue.elements().asScala.map(_.asText).toSet)
      .toMap).getOrElse(Map.empty)
    new Manifest(models.map(m => m.name -> m).toMap,
      sources.map(s => s.name -> s).toMap, parentMap)
  }

  /** S14 — models cache dump: name → projected record, written as JSON. */
  def writeModelsCache(manifest: Manifest, cachePath: Path): Unit = {
    val root = mapper.createObjectNode()
    manifest.models.values.toSeq.sortBy(_.name).foreach { m =>
      val n: ObjectNode = root.putObject(m.name)
      n.put("unique_id", m.uniqueId)
      n.put("database", m.database)
      n.put("schema", m.schema)
      n.put("name", m.name)
      n.put("alias", m.alias)
      n.put("materialized", m.materialized)
      n.put("description", m.description)
      val tags = n.putArray("tags")
      m.tags.toSeq.sorted.foreach(tags.add)
    }
    Files.createDirectories(cachePath.getParent)
    Files.write(cachePath, mapper.writerWithDefaultPrettyPrinter()
      .writeValueAsBytes(root))
  }
}
