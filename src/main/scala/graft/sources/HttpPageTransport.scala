package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.apache.spark.sql.SparkSession

import PagedSource._

/** Live HTTP implementation of [[PagedSource.PageTransport]] on the
  * JDK's built-in `java.net.http.HttpClient` — no extra dependency —
  * mapping the reference's four pagination modes (`bp-scala-api-
  * ingestions/dataSource bp/ModuleFunctions.scala:494-561`) onto the
  * `(pageIndex, token)` drive-loop contract:
  *
  *  - [[HttpPageTransport.QueryParam]] — `base?page=<pageIndex>`;
  *    exhaustion = a page with no docs.
  *  - [[HttpPageTransport.Header]] — continuation rides HTTP headers:
  *    the previous response's `responseHeader` value is sent back in
  *    `requestHeader`; exhaustion = last response had no header.
  *  - [[HttpPageTransport.AbsoluteUrl]] — the body's `nextField`
  *    carries the full next-page URL.
  *  - [[HttpPageTransport.RelativeUrl]] — same, resolved against the
  *    base URL.
  *
  * Auth: `authHeaders` is re-read on EVERY request, so after the drive
  * loop sees [[PageAuthExpired]] (HTTP 401/403) and calls
  * `refreshAuth` (→ `onAuthRefresh`), the retry automatically carries
  * the new credential — the reference's two-attempt token regeneration
  * (`Well Logs Curve Data/ModuleFunctions.scala:664-678`).
  *
  * Scale: pages are control-plane-sized API responses fetched in a
  * driver loop (as in the reference); the accumulated frame stays
  * distributed. Body parsing uses Jackson from Spark's own classpath.
  */
object HttpPageTransport {

  sealed trait Mode
  /** Offset pagination: `base?<param>=<pageIndex>`. */
  final case class QueryParam(param: String = "page") extends Mode
  /** Header continuation: send `requestHeader: <token>`, read the next
    * token from the response's `responseHeader`. */
  final case class Header(requestHeader: String = "X-Page-Token",
                          responseHeader: String = "X-Next-Token") extends Mode
  /** Body field `nextField` holds the FULL next-page URL. */
  final case class AbsoluteUrl(nextField: String = "next") extends Mode
  /** Body field `nextField` holds a link relative to the base URL. */
  final case class RelativeUrl(nextField: String = "next") extends Mode

  def apply(spark: SparkSession, baseUrl: String, mode: Mode,
            docsField: String = "items",
            authHeaders: () => Map[String, String] = () => Map.empty,
            onAuthRefresh: () => Unit = () => ()): PageTransport =
    new PageTransport {
      private val client = HttpClient.newHttpClient()
      private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

      override def refreshAuth(): Unit = onAuthRefresh()

      override def fetchPage(pageIndex: Int,
                             token: Option[String]): PageResponse = {
        // where to fetch; None = the token-threading modes saw no
        // continuation on the previous page → exhausted
        val uri: Option[String] = mode match {
          case QueryParam(p) =>
            val sep = if (baseUrl.contains("?")) "&" else "?"
            Some(s"$baseUrl$sep$p=$pageIndex")
          case _: Header =>
            if (pageIndex == 0 || token.isDefined) Some(baseUrl) else None
          case _: AbsoluteUrl =>
            if (pageIndex == 0) Some(baseUrl) else token
          case _: RelativeUrl =>
            if (pageIndex == 0) Some(baseUrl)
            else token.map(t => URI.create(baseUrl).resolve(t).toString)
        }
        uri match {
          case None => PageEnd
          case Some(u) =>
            val b = HttpRequest.newBuilder(URI.create(u)).GET()
            authHeaders().foreach { case (k, v) => b.header(k, v) }
            mode match {
              case Header(reqH, _) => token.foreach(t => b.header(reqH, t))
              case _ => ()
            }
            val resp = client.send(b.build(),
              HttpResponse.BodyHandlers.ofString())
            resp.statusCode() match {
              case 401 | 403 => PageAuthExpired
              case 204 => PageEnd
              case ok if ok / 100 == 2 =>
                val root = mapper.readTree(resp.body())
                val items = Option(root.get(docsField)).toSeq.flatMap { n =>
                  val it = n.elements()
                  val buf = Seq.newBuilder[String]
                  while (it.hasNext) buf += it.next().toString
                  buf.result()
                }
                val next = mode match {
                  case Header(_, respH) =>
                    val v = resp.headers().firstValue(respH)
                    if (v.isPresent) Some(v.get) else None
                  case AbsoluteUrl(f) =>
                    Option(root.get(f)).filterNot(_.isNull).map(_.asText)
                  case RelativeUrl(f) =>
                    Option(root.get(f)).filterNot(_.isNull).map(_.asText)
                  case _: QueryParam => None
                }
                if (items.isEmpty && next.isEmpty) PageEnd
                else {
                  import spark.implicits._
                  PageData(spark.createDataset(items), next)
                }
              case other =>
                throw new java.io.IOException(s"HTTP $other from $u")
            }
        }
      }
    }
}
