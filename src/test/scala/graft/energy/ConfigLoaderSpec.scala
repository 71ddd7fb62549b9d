package graft.energy

import org.scalatest.funsuite.AnyFunSuite

class ConfigLoaderSpec extends AnyFunSuite {

  test("full yaml round trip") {
    val cfg = ConfigLoader.fromYaml(
      """project: { name: test-pipeline, timezone: UTC }
        |api: { base_url: "https://example.test", timeout_seconds: 7 }
        |run:
        |  backfill: { start_date: "2025-03-01", end_date: "2025-03-05" }
        |datasets:
        |  public_power_de:
        |    endpoint: public_power
        |    params: { country: de, resolution: 15min }
        |  price_de_lu:
        |    endpoint: price
        |    params: { bzn: DE-LU }
        |storage: { root: /tmp/test-data }
        |""".stripMargin)
    assert(cfg.projectName == "test-pipeline")
    assert(cfg.apiTimeoutSeconds == 7)
    assert(cfg.backfill.startDate.toString == "2025-03-01")
    assert(cfg.datasets.map(_.endpoint).sorted == Seq("price", "public_power"))
    assert(cfg.datasets.find(_.endpoint == "public_power").get
      .params("resolution") == "15min")
    assert(cfg.storage.bronze("power") == "/tmp/test-data/bronze/power")
  }

  test("missing sections fall back to defaults") {
    val cfg = ConfigLoader.fromYaml("storage: { root: /tmp/x }\n")
    assert(cfg.timezone == "UTC")
    assert(cfg.datasets.size == 2)
    assert(cfg.backfill.startDate.toString == "2025-01-01")
  }

  test("invalid backfill range rejected") {
    intercept[IllegalArgumentException] {
      ConfigLoader.fromYaml(
        """run:
          |  backfill: { start_date: "2025-03-05", end_date: "2025-03-01" }
          |""".stripMargin)
    }
  }
}
