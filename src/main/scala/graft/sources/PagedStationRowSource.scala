package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** Shared scaffolding for the scrolling station backends: one
  * HttpClient per scroll (keep-alive across pages, not one client per
  * page) and one JSON observation parser, so the offset and cursor
  * modes cannot drift apart on value coercion. */
private[sources] object PagedHttp {
  def newClient(): HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(30)).build()

  /** GET with bounded retry on TRANSIENT failures (5xx, 429, IO): a
    * thousand-page scroll dying on one blip re-fetches the whole
    * window, so a page is worth `retries` extra attempts with linear
    * backoff. 4xx (other than 429) fails immediately — a bad request
    * does not get better by retrying — and the scroll guards
    * (short-page, non-advancing cursor) still catch a server that
    * "recovers" into inconsistency. */
  def get(client: HttpClient, url: String, what: String, retries: Int = 2): String = {
    var attempt = 0
    while (true) {
      val outcome: Either[String, String] =
        try {
          val resp = client.send(
            HttpRequest.newBuilder(URI.create(url)).GET()
              .timeout(Duration.ofSeconds(60)).build(),
            HttpResponse.BodyHandlers.ofString())
          resp.statusCode() match {
            case 200 => Right(resp.body())
            case code if code >= 500 || code == 429 => Left(s"status $code")
            case code => throw new IllegalStateException(
              s"$what request failed ($code): $url")
          }
        } catch {
          case e: java.io.IOException => Left(e.toString)
        }
      outcome match {
        case Right(body) => return body
        case Left(reason) =>
          if (attempt >= retries) throw new IllegalStateException(
            s"$what request failed after ${attempt + 1} attempts ($reason): $url")
          attempt += 1
          Thread.sleep(100L * attempt)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Station listing for the paged backends' [[StationDirectory]]:
    * `GET {endpoint}/stations` → `{"stations": ["A", "B", ...]}`. One
    * un-paged request — a station directory is metadata-sized; a
    * service whose directory needs paging should expose a narrower
    * observation endpoint instead. */
  def listStations(client: HttpClient, endpoint: String): Seq[String] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val body = get(client, s"$endpoint/stations", "station-directory")
    JsonMethods.parse(body) match {
      case JObject(fs) => fs.toMap.get("stations") match {
        case Some(JArray(xs)) =>
          xs.collect { case JString(s) if s.nonEmpty => s }.distinct.sorted
        case other => throw new IllegalArgumentException(
          s"station directory payload lacks a stations array: $other")
      }
      case other => throw new IllegalArgumentException(
        s"unexpected station directory payload: $other")
    }
  }

  /** JSON observations → rows. Null/blank values are missing days,
    * like the CDEC client. Records without a string "date" are
    * DROPPED from the rows but still counted by the caller via the
    * raw result size — offset arithmetic must advance by records
    * SERVED, not records parsed, or a single malformed record shifts
    * every later page and re-fetches (duplicates) its boundary row. */
  def parseResults(results: List[org.json4s.JValue]): Seq[StationRow] = {
    import org.json4s._
    results.flatMap { obs =>
      val fs = obs match { case JObject(o) => o.toMap; case _ => Map.empty[String, JValue] }
      fs.get("date").collect { case JString(s) => s }.map { d =>
        val value: java.lang.Double = fs.get("value") match {
          case Some(JDouble(v)) => v
          case Some(JInt(v)) => v.toDouble
          case Some(JDecimal(v)) => v.toDouble
          case Some(JString(s)) if s.trim.nonEmpty =>
            scala.util.Try(java.lang.Double.valueOf(s.trim)).getOrElse(null)
          case _ => null
        }
        StationRow(StationTimes.parseMicros(d), value)
      }
    }
  }
}

/**
 * Paging-aware station backend — the second backend SHAPE next to the
 * fetch-all-window clients (CDEC/NRCS/MesoWest): most public data
 * services (NOAA CDO v2, Synoptic, USGS NWIS, ...) cap a response at
 * `limit` records and hand the rest back through offset/limit paging,
 * so a client that assumes one request per window silently truncates.
 * This client speaks the generic offset/limit contract:
 *
 *   GET {endpoint}?station={id}&start=yyyy-MM-dd&stop=yyyy-MM-dd
 *       &limit={pageLimit}&offset={n}
 *   → {"count": <total matching records>,
 *      "results": [{"date": "...", "value": <accum|null>}, ...]}
 *
 * with `offset` a 0-based record index and `results` ordered by date
 * (the invariant offset paging needs: consecutive ordered pages
 * concatenate to the ordered whole, so no cross-page sort — and no
 * page-spanning materialization — is required). Values are daily
 * ACCUMULATED precipitation like the rest of the family; empty/null
 * values are missing days.
 *
 * Paging discipline (the part that matters at fleet scale):
 *  - pages are pulled LAZILY ([[LazyList]]): a partition reader that
 *    stops early (pushed ts upper bound, limit) never fetches the
 *    tail pages, and per-task memory holds one page, not the window;
 *  - the offset advances by records SERVED (raw result size), not
 *    records parsed — a malformed record is dropped from the rows
 *    without shifting every subsequent page boundary;
 *  - a short page before `count` is reached fails LOUDLY — a service
 *    that stops serving mid-scroll would otherwise look like a clean
 *    short series and silently corrupt downstream storm totals;
 *  - `maxPages` bounds the scroll against a service that keeps
 *    producing (count drift, cursor bugs) — again an exception, not a
 *    silent cap.
 *
 * Under the streaming source ([[StationTableProvider]]) this composes
 * with admission control: `maxbatchstep` bounds how much EVENT TIME a
 * micro-batch covers, `limit` bounds how many ROWS each HTTP response
 * carries — a months-deep backfill is bounded in both dimensions, per
 * trigger, per station.
 */
final class PagedStationRowSource(
    endpoint: String,
    pageLimit: Int = 1000,
    maxPages: Int = 10000) extends StationRowSource with StationDirectory {
  require(pageLimit >= 1, s"pageLimit must be positive: $pageLimit")

  def listStations(): Seq[String] =
    PagedHttp.listStations(PagedHttp.newClient(), endpoint)

  def fetchRows(stationId: String, startUs: Long, stopUs: Long): Seq[StationRow] = {
    val (start, stop) = StationTimes.dateWindow(startUs, stopUs)
    val client = PagedHttp.newClient()
    // (total count, records served on this page, parsed rows)
    def page(offset: Int): (Int, Int, Seq[StationRow]) = {
      val url = s"$endpoint?station=$stationId&start=$start&stop=$stop" +
        s"&limit=$pageLimit&offset=$offset"
      parsePage(PagedHttp.get(client, url, "paged"))
    }
    def scroll(offset: Int, pageNo: Int): LazyList[Seq[StationRow]] = {
      val (count, served, rows) = page(offset)
      val next = offset + served
      if (next < count && served == 0)
        throw new IllegalStateException(
          s"paged service returned a short page: $next of $count records at offset $offset")
      if (pageNo >= maxPages && next < count)
        throw new IllegalStateException(
          s"paged scroll exceeded $maxPages pages with $next of $count records — " +
            "raise maxPages or narrow the window")
      if (next >= count) LazyList(rows)
      else rows #:: scroll(next, pageNo + 1)
    }
    scroll(0, 1).flatten
      .filter(r => r.tsMicros >= startUs && r.tsMicros <= stopUs)
  }

  /** One page: ("count": total, "results": ordered observations) →
    * (total, records served, parsed rows). */
  private[graft] def parsePage(body: String): (Int, Int, Seq[StationRow]) = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val fields = JsonMethods.parse(body) match {
      case JObject(fs) => fs.toMap
      case other => throw new IllegalArgumentException(s"unexpected paged payload: $other")
    }
    val count = fields.get("count") match {
      case Some(JInt(n)) => n.toInt
      case other => throw new IllegalArgumentException(s"paged payload lacks count: $other")
    }
    val results = fields.get("results") match {
      case Some(JArray(xs)) => xs
      case _ => Nil
    }
    (count, results.size, PagedHttp.parseResults(results))
  }
}

object PagedStationRowSource {
  /** No public default endpoint: the generic offset/limit contract is
    * deployment-specific, so `endpoint` is a required option. */
  val SourceName = "PAGED"
}

/**
 * Cursor-token paging variant of [[PagedStationRowSource]] — the
 * OTHER common scroll contract (Elasticsearch-style scrolls, DynamoDB
 * LastEvaluatedKey, most "nextPageToken" REST APIs): no total count is
 * advertised; each page carries an opaque continuation token and the
 * scroll ends when the token is absent:
 *
 *   GET {endpoint}?station={id}&start=...&stop=...&limit={n}[&cursor={token}]
 *   → {"results": [...], "next": "<token>"}        (more pages)
 *   → {"results": [...]}  or  {"next": null}        (last page)
 *
 * Same discipline as the offset form: lazy page pulls, one client per
 * scroll, `maxPages` runaway guard — and because no count exists to
 * check short pages against, the truncation guard becomes a
 * NON-ADVANCING-CURSOR check: a service that returns the same token
 * twice (or a token with an empty page and more promised) would loop
 * or silently stall, so both fail loudly instead. Selected via
 * `.option("paging", "cursor")` on the `PAGED` DSv2 source.
 */
final class CursorPagedStationRowSource(
    endpoint: String,
    pageLimit: Int = 1000,
    maxPages: Int = 10000) extends StationRowSource with StationDirectory {
  require(pageLimit >= 1, s"pageLimit must be positive: $pageLimit")

  def listStations(): Seq[String] =
    PagedHttp.listStations(PagedHttp.newClient(), endpoint)

  def fetchRows(stationId: String, startUs: Long, stopUs: Long): Seq[StationRow] = {
    val (start, stop) = StationTimes.dateWindow(startUs, stopUs)
    val client = PagedHttp.newClient()
    def page(cursor: Option[String]): (Option[String], Int, Seq[StationRow]) = {
      val cur = cursor.map(c =>
        "&cursor=" + java.net.URLEncoder.encode(c, "UTF-8")).getOrElse("")
      val url = s"$endpoint?station=$stationId&start=$start&stop=$stop" +
        s"&limit=$pageLimit$cur"
      parseCursorPage(PagedHttp.get(client, url, "cursor-paged"))
    }
    def scroll(cursor: Option[String], pageNo: Int): LazyList[Seq[StationRow]] = {
      val (next, served, rows) = page(cursor)
      if (next.isDefined && next == cursor)
        throw new IllegalStateException(
          s"cursor-paged service did not advance: cursor ${next.get} returned itself")
      if (next.isDefined && served == 0)
        throw new IllegalStateException(
          "cursor-paged service promised more pages but returned an empty one")
      if (pageNo >= maxPages && next.isDefined)
        throw new IllegalStateException(
          s"cursor scroll exceeded $maxPages pages — raise maxPages or narrow the window")
      next match {
        case None => LazyList(rows)
        case some => rows #:: scroll(some, pageNo + 1)
      }
    }
    scroll(None, 1).flatten
      .filter(r => r.tsMicros >= startUs && r.tsMicros <= stopUs)
  }

  /** One page: optional continuation token + (served, parsed rows). */
  private[graft] def parseCursorPage(body: String): (Option[String], Int, Seq[StationRow]) = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val fields = JsonMethods.parse(body) match {
      case JObject(fs) => fs.toMap
      case other => throw new IllegalArgumentException(s"unexpected cursor payload: $other")
    }
    val next = fields.get("next").collect { case JString(s) if s.nonEmpty => s }
    val results = fields.get("results") match {
      case Some(JArray(xs)) => xs
      case _ => Nil
    }
    (next, results.size, PagedHttp.parseResults(results))
  }
}
