package graft.energy

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.net.URLEncoder
import java.nio.charset.StandardCharsets.UTF_8
import java.time.{Duration, LocalDate}

/** Abstraction over the Energy-Charts REST API.
  *
  * Reference: `src/utils/api_client.py:19-73` — `GET {base}/public_power`
  * with `country/start/end` and `GET {base}/price` with upper-cased
  * `bzn/start/end` (`api_client.py:69`), raising on non-2xx
  * (`api_client.py:31`). Returns the raw JSON payload text: bronze stores
  * the *string*, parsing happens at the silver layer.
  *
  * The build environment is zero-egress, so tests and the driver only ever
  * exercise [[FixtureEnergySource]]; [[HttpEnergySource]] is the thin
  * production impl behind the same trait.
  */
trait EnergySource {
  def publicPower(country: String, date: LocalDate): String
  def price(bzn: String, date: LocalDate): String
}

final class HttpEnergySource(baseUrl: String, timeout: Duration)
    extends EnergySource {
  private val client =
    HttpClient.newBuilder().connectTimeout(timeout).build()

  private def get(path: String, params: Map[String, String]): String = {
    val qs = params
      .map { case (k, v) =>
        s"${URLEncoder.encode(k, UTF_8)}=${URLEncoder.encode(v, UTF_8)}"
      }
      .mkString("&")
    val req = HttpRequest
      .newBuilder(URI.create(s"$baseUrl/$path?$qs"))
      .timeout(timeout)
      .GET()
      .build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new RuntimeException(
        s"GET $path -> HTTP ${resp.statusCode()}: ${resp.body().take(200)}"
      )
    resp.body()
  }

  override def publicPower(country: String, date: LocalDate): String =
    get(
      "public_power",
      Map("country" -> country, "start" -> date.toString, "end" -> date.toString),
    )

  // bzn is upper-cased like the reference client (`api_client.py:69`).
  override def price(bzn: String, date: LocalDate): String =
    get(
      "price",
      Map(
        "bzn" -> bzn.toUpperCase,
        "start" -> date.toString,
        "end" -> date.toString,
      ),
    )
}

/** Deterministic in-memory source for tests and offline runs: payloads are
  * provided per (key, date); missing entries raise like an HTTP 404 would.
  */
final class FixtureEnergySource(
    powerPayloads: Map[LocalDate, String],
    pricePayloads: Map[LocalDate, String],
) extends EnergySource {
  override def publicPower(country: String, date: LocalDate): String =
    powerPayloads.getOrElse(
      date,
      throw new RuntimeException(s"no power fixture for $date"),
    )
  override def price(bzn: String, date: LocalDate): String =
    pricePayloads.getOrElse(
      date,
      throw new RuntimeException(s"no price fixture for $date"),
    )
}

object FixtureEnergySource {
  /** Synthetic-but-realistic generator for the Energy-Charts payload
    * shapes (FIXTURES.md A1/A2): deterministic in `date`, usable at any
    * backfill width without checked-in files.
    */
  def synthetic(
      dates: Seq[LocalDate],
      productionTypes: Seq[String] = SyntheticPayloads.DefaultProductionTypes,
      pointsPerDay: Int = 96,
      pricePointsPerDay: Int = 24,
  ): FixtureEnergySource = new FixtureEnergySource(
    dates.map(d => d -> SyntheticPayloads.powerPayload(d, productionTypes, pointsPerDay)).toMap,
    dates.map(d => d -> SyntheticPayloads.pricePayload(d, pricePointsPerDay)).toMap,
  )
}
