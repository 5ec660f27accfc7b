package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.{Duration, LocalDateTime, ZoneOffset}

/**
 * Live CDEC station backend — the engine's counterpart of the
 * reference's `CDECPointData` resolution (metevents/events.py:139-143;
 * metloom fetches daily accumulated precipitation over HTTP). Speaks
 * CDEC's public JSON data service:
 *
 *   GET {endpoint}?Stations={id}&SensorNums=2&dur_code=D
 *       &Start=yyyy-MM-dd&End=yyyy-MM-dd
 *
 * (sensor 2 = accumulated precipitation, dur_code D = daily). The
 * response is a JSON array of observations; `value: -9999` is CDEC's
 * missing marker and becomes null (pandas NaN in the reference).
 *
 * Documented divergence: timestamps are interpreted as UTC wall-clock
 * (the engine pins everything to UTC; metloom localizes to
 * US/Pacific first). Daily data at day granularity is unaffected by
 * the offset for storm delineation, which runs on day-sized steps.
 *
 * Instances are Serializable (only the endpoint string is state), so
 * [[StationTableProvider]] partitions can carry one to any executor —
 * a thousand-station pull fans out across the cluster, each task
 * opening its own connection. The endpoint is injectable, which is
 * also how the offline cassette test works: StationSourcesSpec
 * replays a recorded CDEC response from a loopback HTTP server
 * (CI never touches the network).
 */
final class CdecStationRowSource(endpoint: String = CdecStationRowSource.DefaultEndpoint)
    extends StationRowSource {

  def fetchRows(stationId: String, startUs: Long, stopUs: Long): Seq[StationRow] = {
    val (start, stop) = StationTimes.dateWindow(startUs, stopUs)
    val url = s"$endpoint?Stations=$stationId&SensorNums=2&dur_code=D&Start=$start&End=$stop"
    val client = HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(30)).build()
    val resp = client.send(
      HttpRequest.newBuilder(URI.create(url)).GET()
        .timeout(Duration.ofSeconds(60)).build(),
      HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode() == 200, s"CDEC request failed (${resp.statusCode()}): $url")
    parseResponse(resp.body())
      .filter(r => r.tsMicros >= startUs && r.tsMicros <= stopUs)
      .sortBy(_.tsMicros)
  }

  /** CDEC JSON array → rows. Tolerates the service's loose date format
    * ("2022-12-1 00:00") and both numeric and string values. */
  private[graft] def parseResponse(body: String): Seq[StationRow] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val arr = JsonMethods.parse(body) match {
      case JArray(xs) => xs
      case other => throw new IllegalArgumentException(s"unexpected CDEC payload: $other")
    }
    arr.flatMap { obs =>
      val fields = obs match { case JObject(fs) => fs.toMap; case _ => Map.empty[String, JValue] }
      val dateStr = fields.get("date").collect { case JString(s) => s }
      dateStr.map { d =>
        val value: java.lang.Double = fields.get("value") match {
          case Some(JDouble(v)) if v != -9999.0 => v
          case Some(JInt(v)) if v != BigInt(-9999) => v.toDouble
          case Some(JDecimal(v)) if v != BigDecimal(-9999) => v.toDouble
          case Some(JString(s)) if s.trim.nonEmpty && s.trim != "-9999" =>
            scala.util.Try(java.lang.Double.valueOf(s.trim)).getOrElse(null)
          case _ => null
        }
        StationRow(parseCdecDate(d), value)
      }
    }
  }

  /** "yyyy-M-d H:mm" with single-digit fields, as CDEC emits. */
  private def parseCdecDate(s: String): Long = {
    val t = s.trim
    val (datePart, timePart) = t.split("[ T]") match {
      case Array(d) => (d, "00:00")
      case Array(d, tm) => (d, tm)
      case parts => (parts(0), parts(1))
    }
    val Array(y, m, d) = datePart.split("-").map(_.toInt)
    val hm = timePart.split(":").map(_.toInt)
    val ldt = LocalDateTime.of(y, m, d, hm(0), if (hm.length > 1) hm(1) else 0)
    val i = ldt.toInstant(ZoneOffset.UTC)
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }
}

object CdecStationRowSource {
  val DefaultEndpoint = "https://cdec.water.ca.gov/dynamicapp/req/JSONDataServlet"
}
