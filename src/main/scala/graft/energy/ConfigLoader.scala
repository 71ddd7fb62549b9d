package graft.energy

import java.nio.file.{Files, Paths}
import java.time.LocalDate
import org.yaml.snakeyaml.Yaml
import scala.jdk.CollectionConverters._

/** YAML config loader. The reference declares a config surface it never
  * fully reads (dataset params, storage root, timezone — SURVEY.md §2.13);
  * this engine honors all of it. Shape:
  *
  * {{{
  * project: { name: ..., timezone: UTC }
  * api: { base_url: ..., timeout_seconds: 30 }
  * run:
  *   backfill: { start_date: "2025-01-01", end_date: "2025-01-07" }
  * datasets:
  *   public_power_de: { endpoint: public_power, params: { country: de, resolution: 15min } }
  *   price_de_lu:    { endpoint: price,        params: { bzn: DE-LU } }
  * storage: { root: /path/to/data }
  * }}}
  */
object ConfigLoader {

  def fromYamlFile(path: String): EnergyConfig =
    fromYaml(Files.readString(Paths.get(path)))

  def fromYaml(yamlText: String): EnergyConfig = {
    val root = asMap(new Yaml().load[Any](yamlText))
    val defaults = EnergyConfig.default(
      str(root, "storage", "root").getOrElse("data"))

    val datasets = root.get("datasets").map(asMap).map { ds =>
      ds.map { case (name, v) =>
        val m = asMap(v)
        DatasetConfig(
          name = name,
          endpoint = m.get("endpoint").map(_.toString).getOrElse(name),
          params = m.get("params").map(asMap).getOrElse(Map.empty)
            .map { case (k, pv) => k -> pv.toString },
        )
      }.toSeq
    }.filter(_.nonEmpty).getOrElse(defaults.datasets)

    EnergyConfig(
      projectName = str(root, "project", "name").getOrElse(defaults.projectName),
      timezone = str(root, "project", "timezone").getOrElse(defaults.timezone),
      apiBaseUrl = str(root, "api", "base_url").getOrElse(defaults.apiBaseUrl),
      apiTimeoutSeconds = str(root, "api", "timeout_seconds")
        .map(_.toInt).getOrElse(defaults.apiTimeoutSeconds),
      backfill = (
        str(root, "run", "backfill", "start_date"),
        str(root, "run", "backfill", "end_date"),
      ) match {
        case (Some(s), Some(e)) =>
          BackfillConfig(LocalDate.parse(s), LocalDate.parse(e))
        case _ => defaults.backfill
      },
      datasets = datasets,
      storage = StorageConfig(str(root, "storage", "root").getOrElse("data")),
    )
  }

  private def asMap(v: Any): Map[String, Any] = v match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, value) => k.toString -> value }.toMap
    case _ => Map.empty
  }

  private def str(root: Map[String, Any], path: String*): Option[String] = {
    def go(m: Map[String, Any], ps: List[String]): Option[String] = ps match {
      case last :: Nil => m.get(last).map(_.toString)
      case head :: tail => m.get(head).map(asMap).flatMap(go(_, tail))
      case Nil => None
    }
    go(root, path.toList)
  }
}
