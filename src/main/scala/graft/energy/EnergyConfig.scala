package graft.energy

import java.time.LocalDate

/** Typed configuration for the energy pipeline.
  *
  * Mirrors the *declared* config surface of the reference
  * (`config/config.yaml`), including the parts the reference declares but
  * never reads (dataset params, storage paths, timezone — see SURVEY.md
  * §2.13): this engine honors them.
  */
final case class DatasetConfig(
    name: String,
    endpoint: String,            // "public_power" | "price"
    params: Map[String, String], // e.g. country=de, resolution=15min | bzn=DE-LU
)

final case class BackfillConfig(startDate: LocalDate, endDate: LocalDate) {
  require(
    !startDate.isAfter(endDate),
    s"start_date $startDate must be <= end_date $endDate",
  )
}

final case class StorageConfig(root: String) {
  def bronze(table: String): String = s"$root/bronze/$table"
  def silver(table: String): String = s"$root/silver/$table"
  def gold(table: String): String = s"$root/gold/$table"
}

final case class EnergyConfig(
    projectName: String,
    timezone: String, // applied to spark.sql.session.timeZone (reference declared but ignored it)
    apiBaseUrl: String,
    apiTimeoutSeconds: Int,
    backfill: BackfillConfig,
    datasets: Seq[DatasetConfig],
    storage: StorageConfig,
)

object EnergyConfig {
  /** Defaults mirroring the reference's `config/config.yaml`, with UTC
    * pinned instead of the declared-but-unused Europe/Berlin (intentional
    * determinism fix, SURVEY.md §1).
    */
  def default(storageRoot: String): EnergyConfig = EnergyConfig(
    projectName = "energy-data-pipeline",
    timezone = "UTC",
    apiBaseUrl = "https://api.energy-charts.info",
    apiTimeoutSeconds = 30,
    backfill = BackfillConfig(
      LocalDate.parse("2025-01-01"),
      LocalDate.parse("2025-01-07"),
    ),
    datasets = Seq(
      DatasetConfig(
        "public_power_de",
        "public_power",
        Map("country" -> "de", "resolution" -> "15min"),
      ),
      DatasetConfig("price_de_lu", "price", Map("bzn" -> "DE-LU")),
    ),
    storage = StorageConfig(storageRoot),
  )
}
