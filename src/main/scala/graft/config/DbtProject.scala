package graft.config

import java.nio.file.{Files, Path}
import scala.collection.immutable.ListMap
import graft.manifest.SourceYaml
import graft.manifest.SourceYaml.{Mapp, Node, Scalar, Seqq}

/** dbt_project.yml variable settings (core/project.py:140-250): project
  * identity, the `teams` / `access-policies` / `service-consumers` var
  * dictionaries (name → description + principal(s)), `*-data-expiration`
  * TTL vars, and the models-tree `+group`/`+access` inheritance walk.
  * Parsed with the same YAML subset parser as source definitions. */
final class DbtProject(val data: Node) {

  private def mapAt(n: Node, key: String): ListMap[String, Node] = n match {
    case Mapp(m) => m.get(key) match {
      case Some(Mapp(inner)) => inner
      case _ => ListMap.empty
    }
    case _ => ListMap.empty
  }

  private def scalarAt(n: Node, key: String): Option[String] = n match {
    case Mapp(m) => m.get(key).collect { case Scalar(v) if v.nonEmpty => v }
    case _ => None
  }

  private def vars: ListMap[String, Node] = mapAt(data, "vars")

  def name: String = scalarAt(data, "name").getOrElse("")
  def profile: String = scalarAt(data, "profile").getOrElse("")

  /** Named var dictionary → (name, description) pairs, declared order
    * (core/project.py:176-201). */
  private def choicesOf(varName: String): Seq[(String, String)] =
    mapAt(Mapp(vars), varName).toSeq.map { case (k, v) =>
      k -> scalarAt(v, "description").getOrElse("")
    }

  def teams: Seq[(String, String)] = choicesOf("teams")
  def accessPolicies: Seq[(String, String)] = choicesOf("access-policies")
  def serviceConsumers: Seq[(String, String)] = choicesOf("service-consumers")

  /** Principal(s) of one entry in a var dictionary — `principal` may be a
    * scalar or a list (grants.py:14-40). None when the name is unknown. */
  def principalsOf(varName: String, entry: String): Option[Seq[String]] =
    mapAt(Mapp(vars), varName).get(entry).map {
      case Mapp(m) => m.get("principal") match {
        case Some(Scalar(p)) if p.nonEmpty => Seq(p)
        case Some(Seqq(items)) => items.collect { case Scalar(p) => p }
        case _ => Nil
      }
      case _ => Nil
    }

  def validNamesOf(varName: String): Seq[String] =
    mapAt(Mapp(vars), varName).keys.toSeq

  /** `*-data-expiration` vars → (name, days, description), with the
    * reference's description format (core/project.py:202-212). */
  def dataExpirations: Seq[(String, Int, String)] =
    vars.toSeq.collect {
      case (k, Scalar(v)) if k.endsWith("-data-expiration") &&
          v.nonEmpty && v.forall(_.isDigit) =>
        val label = k.replace("-", " ").replace(" expiration", "")
        (k, v.toInt, s"Used for $label (${v.toInt} days)")
    }

  /** Integer var lookup (partition-expiration resolution feed). */
  def varInt(nameKey: String): Option[Int] =
    vars.get(nameKey).collect { case Scalar(v) if v.forall(_.isDigit) && v.nonEmpty => v.toInt }

  /** models-tree walk project → layer folder → domain; deeper levels
    * override (+group/+access inheritance, core/project.py:215-250). */
  def inheritedModelConfig(layerFolder: String, domain: String): (Option[String], Option[String]) = {
    val models = mapAt(data, "models")
    val project = models.get(name).getOrElse(Mapp(ListMap.empty))
    val layer = mapAt(project, layerFolder)
    val dom = mapAt(Mapp(layer), domain)
    val levels = Seq(project, Mapp(layer), Mapp(dom))
    val group = levels.flatMap(scalarAt(_, "+group")).lastOption
    val access = levels.flatMap(scalarAt(_, "+access")).lastOption
    (group, access)
  }
}

object DbtProject {
  def load(root: Path): DbtProject =
    new DbtProject(SourceYaml.parse(Files.readString(root.resolve("dbt_project.yml"))))
}

/** profiles.yml resolution (core/project.py:51-138): located via
  * DBT_PROFILES_DIR, then `<root>/.profiles`, then `~/.dbt`; the active
  * project's profile block's `outputs` are exposed with `{{ env_var(…) }}`
  * templating resolved against a caller-supplied environment — the only
  * Jinja construct the reference renders in profiles. */
final class Profiles(outputs: ListMap[String, Node]) {

  def targets: Seq[String] = outputs.keys.toSeq

  /** Fully-resolved profile values for one target (core/project.py:94-138). */
  def profileConfig(target: String, env: Map[String, String]): ListMap[String, String] =
    outputs.get(target) match {
      case Some(Mapp(m)) => m.collect { case (k, Scalar(v)) =>
        k -> Profiles.resolveEnvVars(v, env)
      }
      case _ => ListMap.empty
    }
}

object Profiles {

  private val EnvVar =
    """\{\{\s*env_var\(\s*['"]([^'"]+)['"]\s*(?:,\s*['"]([^'"]*)['"]\s*)?\)\s*\}\}""".r

  /** Replace every `{{ env_var('NAME') }}` / `{{ env_var('NAME', 'dflt') }}`
    * with its environment value (missing + no default → empty, as
    * jinja's env_var=os.getenv renders None). */
  def resolveEnvVars(value: String, env: Map[String, String]): String =
    EnvVar.replaceAllIn(value, m =>
      scala.util.matching.Regex.quoteReplacement(
        env.getOrElse(m.group(1), Option(m.group(2)).getOrElse(""))))

  /** profiles.yml search order (core/project.py:60-88). */
  def locate(root: Path, env: Map[String, String], home: Path): Path = {
    val candidates = Seq(
      env.get("DBT_PROFILES_DIR").map(Path.of(_)),
      Some(root.resolve(".profiles")),
      Some(home.resolve(".dbt"))).flatten
    candidates.map(_.resolve("profiles.yml")).find(Files.exists(_)).getOrElse(
      throw new IllegalArgumentException(
        "Couldn't find profiles.yml. Checked: " +
          candidates.mkString(", ") + ". Is the DBT_PROFILES_DIR env var set?"))
  }

  /** Load the active project's outputs block. */
  def load(root: Path, env: Map[String, String] = sys.env,
           home: Path = Path.of(System.getProperty("user.home"))): Profiles = {
    val doc = SourceYaml.parse(Files.readString(locate(root, env, home)))
    val profileName = DbtProject.load(root).profile
    val outputs = doc match {
      case Mapp(m) => m.get(profileName) match {
        case Some(Mapp(p)) => p.get("outputs") match {
          case Some(Mapp(o)) => o
          case _ => ListMap.empty[String, Node]
        }
        case _ => ListMap.empty[String, Node]
      }
      case _ => ListMap.empty[String, Node]
    }
    new Profiles(outputs)
  }
}
