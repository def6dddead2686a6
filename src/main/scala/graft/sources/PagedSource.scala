package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.operators.SchemaOps
import graft.operators.Converge.SanitizedCheckpoint

/** S10: paginated-source accumulation — the reference's most-used
  * extraction shape: fetch page, parse JSON, union-accumulate, repeat
  * until exhausted, with credential refresh mid-loop
  * (`bp-scala-api-ingestions/dataSource bp/ModuleFunctions.scala:494-561`,
  * Rushmore variant `Rushmore Reviews/ModuleFunctions.scala:520-604`).
  *
  * The network is abstracted behind `fetchPage`, so the operator is
  * fixture-testable; the engine owns what the reference's recursive
  * notebook loop owned: the drive loop, auth-expiry retry, per-page
  * schema-drift quarantine, and plan-safe accumulation.
  *
  * Pagination shapes map onto the `(pageIndex, token)` arguments:
  * QueryParam offset pagination keys off `pageIndex`; HEADER /
  * AbsoluteURL next-link pagination threads the continuation `token`
  * returned by the previous page.
  *
  * Scale notes: pages are control-plane-sized (an API response), so
  * per-page schema inference and the quarantine sample are driver
  * actions on tiny data — the accumulated frame itself is never
  * collected. Accumulation is `unionByName` with a `localCheckpoint`
  * every `checkpointEvery` pages so a 10k-page crawl doesn't build a
  * 10k-node plan.
  */
object PagedSource {

  /** One page-fetch outcome. */
  sealed trait PageResponse
  /** A page of raw JSON documents plus the continuation token to pass
    * to the next fetch (None when the source paginates by index). */
  final case class PageData(docs: Dataset[String],
                            next: Option[String] = None) extends PageResponse
  /** Credential expired mid-crawl: the loop calls `refreshAuth` and
    * retries the SAME page once (the reference's two-attempt token
    * regeneration, `Well Logs Curve Data/ModuleFunctions.scala:664-678`). */
  case object PageAuthExpired extends PageResponse
  /** No more pages. */
  case object PageEnd extends PageResponse

  /** Transport abstraction for [[pagedSource]]: WHERE pages come from,
    * separated from the drive loop / quarantine / accumulation logic
    * the engine owns. Production wires an HTTP implementation; specs
    * and local runs use [[PageTransport.fromPages]].
    *
    * An HTTP implementation maps the reference's four pagination modes
    * (`dataSource bp/ModuleFunctions.scala:494-561`) onto
    * `(pageIndex, token)` like this:
    *  - QueryParam: request `base?page=<pageIndex>` (or
    *    `offset=<pageIndex·pageSize>`); ignore `token`; return
    *    `PageData(docs, next = None)`.
    *  - HEADER: read the continuation from a response header (e.g.
    *    `X-Next-Token`) and return it as `next`; send the incoming
    *    `token` back in the request header; `PageEnd` when absent.
    *  - AbsoluteURL: the response body carries the full next-page
    *    URL — return it as `next` and request `token.getOrElse(base)`.
    *  - RelativeURL: same, but resolve `next` against the base URL.
    * Auth: translate 401/403 into [[PageAuthExpired]] and re-acquire
    * the credential in [[refreshAuth]] — the drive loop retries the
    * same page once after a refresh. */
  trait PageTransport {
    def fetchPage(pageIndex: Int, token: Option[String]): PageResponse
    def refreshAuth(): Unit = ()
  }

  object PageTransport {
    /** Fixture transport: serve `pages` (each a list of JSON docs) by
      * index — the QueryParam shape with a deterministic local
      * source. */
    def fromPages(spark: SparkSession, pages: Seq[Seq[String]]
                 ): PageTransport = new PageTransport {
      import spark.implicits._
      override def fetchPage(pageIndex: Int,
                             token: Option[String]): PageResponse =
        if (pageIndex < pages.size) PageData(pages(pageIndex).toDS())
        else PageEnd
    }
  }

  /** Quarantined page: which page, why, and one sample document. */
  final case class PageFailure(page: Int, reason: String, sampleDoc: String)

  final case class PagedResult(data: DataFrame, failures: Dataset[PageFailure])

  /** Drive `fetchPage` until `PageEnd`, parse each page's JSON docs,
    * and accumulate rows aligned to `target`.
    *
    * Schema-drift quarantine: a page whose inferred column set differs
    * from `target`'s (missing or unexpected fields — including Spark's
    * `_corrupt_record` for malformed JSON) is routed to `failures`
    * with a reason instead of failing the crawl; loadable pages are
    * cast column-wise onto `target` (`SchemaOps.alignTo`). This is the
    * reference's `schema == tableDF.schema` gate with the mismatch
    * branch kept as data (`Well Logs .../ModuleFunctions.scala:688-697`).
    */
  def pagedSource(spark: SparkSession, target: StructType,
                  fetchPage: (Int, Option[String]) => PageResponse,
                  refreshAuth: () => Unit = () => (),
                  maxPages: Int = 100000,
                  checkpointEvery: Int = 64): PagedResult = {
    import spark.implicits._
    val targetNames = target.fields.map(_.name).toSet
    var acc = Sources.emptyFrame(spark, target)
    val failures = scala.collection.mutable.ArrayBuffer[PageFailure]()
    var token: Option[String] = None
    var page = 0
    var pagesSinceCheckpoint = 0
    var retriedAuth = false
    var done = false
    while (!done && page < maxPages) {
      fetchPage(page, token) match {
        case PageEnd => done = true

        case PageAuthExpired =>
          if (retriedAuth) throw new IllegalStateException(
            s"credential still rejected after refresh at page $page")
          refreshAuth()
          retriedAuth = true

        case PageData(docs, next) =>
          retriedAuth = false
          val parsed = spark.read.json(docs)
          val have = parsed.columns.toSet
          val missing = (targetNames -- have).toSeq.sorted
          val unexpected = (have -- targetNames).toSeq.sorted
          if (missing.nonEmpty || unexpected.nonEmpty) {
            val reason = (
              (if (missing.nonEmpty) Seq(s"missing: ${missing.mkString(",")}")
               else Nil) ++
              (if (unexpected.nonEmpty) Seq(s"unexpected: ${unexpected.mkString(",")}")
               else Nil)).mkString("; ")
            failures += PageFailure(page, reason,
              docs.take(1).headOption.getOrElse(""))
          } else {
            acc = acc.unionByName(SchemaOps.alignTo(parsed, target))
            pagesSinceCheckpoint += 1
            if (pagesSinceCheckpoint >= checkpointEvery) {
              acc = acc.sanitizedCheckpoint()
              pagesSinceCheckpoint = 0
            }
          }
          token = next
          page += 1
      }
    }
    PagedResult(acc, spark.createDataset(failures.toSeq))
  }

  /** [[pagedSource]] over a [[PageTransport]] — the production entry
    * point (the function-typed overload remains for inline fixtures). */
  def pagedSource(spark: SparkSession, target: StructType,
                  transport: PageTransport): PagedResult =
    pagedSource(spark, target, transport.fetchPage _,
      () => transport.refreshAuth())
}
