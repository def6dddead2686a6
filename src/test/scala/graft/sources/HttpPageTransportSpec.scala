package graft.sources

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.scalatest.BeforeAndAfterAll

import graft.SparkSpec

/** Exercises [[HttpPageTransport]] against a REAL loopback HTTP server
  * (`com.sun.net.httpserver`, no external network): all four reference
  * pagination modes end-to-end through `PagedSource.pagedSource`, plus
  * token-refresh-on-401. The fixture serves the same 6 docs
  * (ids 0..5, two per page) under every mode, so each mode must
  * accumulate the identical frame. */
class HttpPageTransportSpec extends SparkSpec with BeforeAndAfterAll {

  private val target = StructType(Seq(StructField("id", LongType)))
  private var server: HttpServer = _
  private var base: String = _

  private def pageBody(page: Int, extra: String = ""): String = {
    val items = if (page < 3)
      s"""[{"id":${page * 2}},{"id":${page * 2 + 1}}]"""
    else "[]"
    s"""{"items":$items$extra}"""
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def qparam(ex: HttpExchange, name: String): Option[Int] =
    Option(ex.getRequestURI.getQuery).toSeq
      .flatMap(_.split("&")).map(_.split("=", 2))
      .collectFirst { case Array(`name`, v) => v.toInt }

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)

    // QueryParam mode + auth: 401 until the Bearer token is "good"
    server.createContext("/qp", (ex: HttpExchange) => {
      val auth = Option(ex.getRequestHeaders.getFirst("Authorization"))
      if (!auth.contains("Bearer good")) respond(ex, 401, "")
      else respond(ex, 200, pageBody(qparam(ex, "page").getOrElse(0)))
    })

    // Header mode: continuation token rides headers
    server.createContext("/hdr", (ex: HttpExchange) => {
      val page = Option(ex.getRequestHeaders.getFirst("X-Page-Token"))
        .map(_.stripPrefix("t").toInt).getOrElse(0)
      if (page < 2) ex.getResponseHeaders.set("X-Next-Token", s"t${page + 1}")
      respond(ex, 200, pageBody(page))
    })

    // AbsoluteUrl mode: body carries the full next URL
    server.createContext("/abs", (ex: HttpExchange) => {
      val page = qparam(ex, "c").getOrElse(0)
      val extra = if (page < 2) s""","next":"$base/abs?c=${page + 1}"""" else ""
      respond(ex, 200, pageBody(page, extra))
    })

    // RelativeUrl mode: body carries a link relative to the base
    server.createContext("/rel", (ex: HttpExchange) => {
      val page = qparam(ex, "c").getOrElse(0)
      val extra = if (page < 2) s""","next":"/rel?c=${page + 1}"""" else ""
      respond(ex, 200, pageBody(page, extra))
    })

    server.start()
    base = s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  override def afterAll(): Unit = {
    if (server != null) server.stop(0)
    super.afterAll()
  }

  private def ids(r: PagedSource.PagedResult): Seq[Long] = {
    assert(r.failures.count() === 0L)
    r.data.orderBy("id").collect().map(_.getLong(0)).toSeq
  }

  test("QueryParam mode pages by index until an empty page, refreshing on 401") {
    var cred = "expired"
    var refreshes = 0
    val t = HttpPageTransport(spark, s"$base/qp",
      HttpPageTransport.QueryParam("page"),
      authHeaders = () => Map("Authorization" -> s"Bearer $cred"),
      onAuthRefresh = () => { cred = "good"; refreshes += 1 })
    val r = PagedSource.pagedSource(spark, target, t)
    assert(ids(r) === (0L to 5L))
    assert(refreshes === 1, "the 401 must trigger exactly one refresh")
  }

  test("Header mode threads the continuation token through headers") {
    val t = HttpPageTransport(spark, s"$base/hdr", HttpPageTransport.Header())
    assert(ids(PagedSource.pagedSource(spark, target, t)) === (0L to 5L))
  }

  test("AbsoluteUrl mode follows full next-page URLs from the body") {
    val t = HttpPageTransport(spark, s"$base/abs",
      HttpPageTransport.AbsoluteUrl())
    assert(ids(PagedSource.pagedSource(spark, target, t)) === (0L to 5L))
  }

  test("RelativeUrl mode resolves next links against the base URL") {
    val t = HttpPageTransport(spark, s"$base/rel",
      HttpPageTransport.RelativeUrl())
    assert(ids(PagedSource.pagedSource(spark, target, t)) === (0L to 5L))
  }

  test("a credential rejected even after refresh fails the crawl loudly") {
    val t = HttpPageTransport(spark, s"$base/qp",
      HttpPageTransport.QueryParam("page"),
      authHeaders = () => Map("Authorization" -> "Bearer still-bad"))
    val e = intercept[IllegalStateException] {
      PagedSource.pagedSource(spark, target, t)
    }
    assert(e.getMessage.contains("credential still rejected"))
  }
}
