package graft.sources

import java.net.{URI, URLEncoder}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

/**
 * Live NRCS station backend — the engine's counterpart of the
 * reference's default `SnotelPointData` resolution
 * (metevents/events.py:139-141, `source='NRCS'`; metloom fetches
 * daily accumulated precipitation from the USDA NRCS Air-Water
 * Database). Speaks the public AWDB REST API:
 *
 *   GET {endpoint}/data?stationTriplets={id}&elements=PREC
 *       &duration=DAILY&beginDate=yyyy-MM-dd&endDate=yyyy-MM-dd
 *
 * (`PREC` = accumulated precipitation since the start of the water
 * year, `DAILY` duration — the AWDB element behind metloom's
 * `PRECIPITATIONACCUM` for SNOTEL stations). Station ids are AWDB
 * triplets (`663:CA:SNTL`). The response is a JSON array with one
 * entry per station, each carrying `data[].values[]` of
 * `{date, value}` observations; absent/null values are missing days
 * (pandas NaN in the reference) and become null here.
 *
 * Timestamps: AWDB daily values carry bare dates; the engine pins
 * them to UTC midnight (same convention as [[CdecStationRowSource]] —
 * day-granularity storm delineation is offset-insensitive).
 *
 * Serializable (endpoint string is the only state) so
 * [[StationTableProvider]] fans a multi-station pull out across
 * executors, one HTTP fetch per task. The endpoint is injectable for
 * the offline cassette tests (StationSourcesSpec replays a recorded
 * AWDB response from a loopback server; CI never touches the
 * network).
 */
final class NrcsStationRowSource(endpoint: String = NrcsStationRowSource.DefaultEndpoint)
    extends StationRowSource with StationDirectory {

  /** AWDB station directory — `GET {endpoint}/stations` returns an
    * array of station metadata objects; the universe is their
    * `stationTriplet`s. `activeOnly=true` mirrors the service's own
    * default listing scope. */
  def listStations(): Seq[String] = {
    val url = s"$endpoint/stations?activeOnly=true"
    val client = HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(30)).build()
    val resp = client.send(
      HttpRequest.newBuilder(URI.create(url)).GET()
        .timeout(Duration.ofSeconds(60)).build(),
      HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode() == 200, s"AWDB station listing failed (${resp.statusCode()}): $url")
    parseStationList(resp.body())
  }

  /** AWDB `stations` payload → distinct sorted triplets. */
  private[graft] def parseStationList(body: String): Seq[String] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    JsonMethods.parse(body) match {
      case JArray(xs) =>
        xs.flatMap(st => st \ "stationTriplet" match {
          case JString(s) if s.nonEmpty => Some(s)
          case _ => None
        }).distinct.sorted
      case other => throw new IllegalArgumentException(
        s"unexpected AWDB station listing payload: $other")
    }
  }

  def fetchRows(stationId: String, startUs: Long, stopUs: Long): Seq[StationRow] = {
    val (begin, end) = StationTimes.dateWindow(startUs, stopUs)
    val triplet = URLEncoder.encode(stationId, StandardCharsets.UTF_8)
    val url = s"$endpoint/data?stationTriplets=$triplet&elements=PREC" +
      s"&duration=DAILY&beginDate=$begin&endDate=$end"
    val client = HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(30)).build()
    val resp = client.send(
      HttpRequest.newBuilder(URI.create(url)).GET()
        .timeout(Duration.ofSeconds(60)).build(),
      HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode() == 200, s"AWDB request failed (${resp.statusCode()}): $url")
    parseResponse(resp.body())
      .filter(r => r.tsMicros >= startUs && r.tsMicros <= stopUs)
      .sortBy(_.tsMicros)
  }

  /** AWDB REST `data` payload → rows: flattens every station entry's
    * `data[].values[]`; a null/absent `value` is a missing day. */
  private[graft] def parseResponse(body: String): Seq[StationRow] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val stations = JsonMethods.parse(body) match {
      case JArray(xs) => xs
      case other => throw new IllegalArgumentException(s"unexpected AWDB payload: $other")
    }
    for {
      st <- stations
      series <- st \ "data" match { case JArray(xs) => xs; case _ => Nil }
      obs <- series \ "values" match { case JArray(xs) => xs; case _ => Nil }
      dateStr <- (obs \ "date") match { case JString(s) => Some(s); case _ => None }
    } yield {
      val value: java.lang.Double = obs \ "value" match {
        case JDouble(v) => v
        case JInt(v) => v.toDouble
        case JDecimal(v) => v.toDouble
        case _ => null
      }
      StationRow(parseAwdbDate(dateStr), value)
    }
  }

  /** Bare `yyyy-MM-dd` (daily duration) or `yyyy-MM-dd HH:mm` (hourly
    * responses carry a time part) → UTC micros. */
  private def parseAwdbDate(s: String): Long = StationTimes.parseMicros(s)
}

object NrcsStationRowSource {
  val DefaultEndpoint = "https://wcc.sc.egov.usda.gov/awdbRestApi/services/v1"
}
