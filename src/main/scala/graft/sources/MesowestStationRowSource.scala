package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.{Duration, Instant, LocalDate, ZoneOffset}
import java.time.format.DateTimeFormatter

/**
 * Live MesoWest station backend — the engine's counterpart of the
 * reference's `MesowestPointData` resolution
 * (metevents/events.py:139-143, `source='mesowest'`; metloom pulls
 * MesoWest observations through the Synoptic Data API and resamples
 * to daily). Speaks the public Synoptic timeseries service:
 *
 *   GET {endpoint}/stations/timeseries?stid={id}&vars=precip_accum
 *       &start=yyyyMMddHHmm&end=yyyyMMddHHmm&obtimezone=utc
 *       &units=english&token={token}
 *
 * The response carries one `STATION` entry with parallel arrays
 * `OBSERVATIONS.date_time[]` / `OBSERVATIONS.precip_accum_set_1[]`
 * at the station's native cadence (sub-daily for most MesoWest
 * networks).
 *
 * Daily resample: accumulated precipitation is monotone within a
 * reset period, so the engine takes the LAST observation of each UTC
 * day — the accumulation as of end-of-day — and stamps it at that
 * day's UTC midnight, matching the daily grain the storm detector
 * runs on (documented divergence: metloom resamples via pandas with
 * station-local days; at day granularity the delineation is
 * offset-insensitive, same argument as [[CdecStationRowSource]]).
 * Null entries in the value array are missing observations and drop
 * out before the day-resample (a day with only nulls yields null).
 *
 * Synoptic requires an API token; it is injectable (option `token`)
 * and never baked in. The endpoint is injectable too, which is how
 * the offline cassette test replays a recorded response from a
 * loopback server (CI never touches the network).
 */
final class MesowestStationRowSource(
    endpoint: String = MesowestStationRowSource.DefaultEndpoint,
    token: String = "demotoken")
    extends StationRowSource with StationDirectory {

  /** Failure messages land in driver logs, the Spark UI, and error
    * pipelines — never let the API credential ride along. */
  private def redacted(url: String): String =
    url.replaceAll("token=[^&]*", "token=REDACTED")

  /** Synoptic station directory — `GET {endpoint}/stations/metadata`
    * returns `{"STATION": [{"STID": ...}, ...]}`; the universe is the
    * STIDs. `status=active` keeps the listing to stations currently
    * reporting, the scope a fetch universe wants. */
  def listStations(): Seq[String] = {
    val url = s"$endpoint/stations/metadata?status=active&token=$token"
    val client = HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(30)).build()
    val resp = client.send(
      HttpRequest.newBuilder(URI.create(url)).GET()
        .timeout(Duration.ofSeconds(60)).build(),
      HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode() == 200,
      s"Synoptic station listing failed (${resp.statusCode()}): ${redacted(url)}")
    parseStationList(resp.body())
  }

  /** Synoptic metadata payload → distinct sorted STIDs. */
  private[graft] def parseStationList(body: String): Seq[String] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    JsonMethods.parse(body) \ "STATION" match {
      case JArray(xs) =>
        xs.flatMap(st => st \ "STID" match {
          case JString(s) if s.nonEmpty => Some(s)
          case _ => None
        }).distinct.sorted
      case other => throw new IllegalArgumentException(
        s"Synoptic station listing has no STATION array: $other")
    }
  }

  def fetchRows(stationId: String, startUs: Long, stopUs: Long): Seq[StationRow] = {
    val fmt = DateTimeFormatter.ofPattern("yyyyMMddHHmm")
    def stampOf(us: Long, default: Instant): String =
      (if (us == Long.MinValue || us == Long.MaxValue) default
       else Instant.ofEpochSecond(us / 1000000L))
        .atZone(ZoneOffset.UTC).format(fmt)
    val start = stampOf(startUs, LocalDate.of(1990, 1, 1).atStartOfDay(ZoneOffset.UTC).toInstant)
    val end = stampOf(stopUs, Instant.now())
    val url = s"$endpoint/stations/timeseries?stid=$stationId&vars=precip_accum" +
      s"&start=$start&end=$end&obtimezone=utc&units=english&token=$token"
    val client = HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(30)).build()
    val resp = client.send(
      HttpRequest.newBuilder(URI.create(url)).GET()
        .timeout(Duration.ofSeconds(60)).build(),
      HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode() == 200,
      s"Synoptic request failed (${resp.statusCode()}): ${redacted(url)}")
    dailyResample(parseObservations(resp.body()))
      .filter(r => r.tsMicros >= startUs && r.tsMicros <= stopUs)
      .sortBy(_.tsMicros)
  }

  /** Synoptic timeseries payload → native-cadence (micros, value)
    * observations; value null where the array carries JSON null. */
  private[graft] def parseObservations(body: String): Seq[(Long, java.lang.Double)] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val root = JsonMethods.parse(body)
    val station = root \ "STATION" match {
      case JArray(st :: _) => st
      case _ => throw new IllegalArgumentException(
        s"Synoptic payload has no STATION entry: ${JsonMethods.compact(root \ "SUMMARY")}")
    }
    val times = station \ "OBSERVATIONS" \ "date_time" match {
      case JArray(xs) => xs.collect { case JString(s) => s }
      case _ => Nil
    }
    val values = station \ "OBSERVATIONS" \ "precip_accum_set_1" match {
      case JArray(xs) => xs.map {
        case JDouble(v) => Double.box(v)
        case JInt(v) => Double.box(v.toDouble)
        case JDecimal(v) => Double.box(v.toDouble)
        case _ => null: java.lang.Double
      }
      case _ => Nil
    }
    require(times.length == values.length,
      s"Synoptic parallel arrays disagree: ${times.length} times vs ${values.length} values")
    times.zip(values).map { case (t, v) => (StationTimes.parseMicros(t), v) }
  }

  /** Last non-null observation per UTC day, stamped at day start; a
    * day whose observations are all null keeps a null (missing day). */
  private[graft] def dailyResample(obs: Seq[(Long, java.lang.Double)]): Seq[StationRow] =
    obs.groupBy { case (us, _) => us - Math.floorMod(us, 86400000000L) }
      .toSeq.sortBy(_._1)
      .map { case (dayUs, rows) =>
        val lastNonNull = rows.sortBy(_._1).reverseIterator.collectFirst {
          case (_, v) if v != null => v
        }
        StationRow(dayUs, lastNonNull.orNull)
      }
}

object MesowestStationRowSource {
  val DefaultEndpoint = "https://api.synopticdata.com/v2"
}
