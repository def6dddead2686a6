package graft.operators

import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.sources.PagedSource
import graft.sources.PagedSource.{PageAuthExpired, PageData, PageEnd}

class PagedSourceSpec extends SparkSpec {

  private val target = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType)))

  private def jsonPage(rows: (Long, String)*) = {
    import spark.implicits._
    rows.map { case (i, n) => s"""{"id":$i,"name":"$n"}""" }.toDS()
  }

  test("PageTransport trait drives the loop (fixture transport + auth refresh)") {
    import graft.sources.PagedSource.PageTransport
    // fromPages fixture: plain index pagination
    val t1 = PageTransport.fromPages(spark, Seq(
      Seq("""{"id":1,"name":"a"}""", """{"id":2,"name":"b"}"""),
      Seq("""{"id":3,"name":"c"}""")))
    val r1 = PagedSource.pagedSource(spark, target, t1)
    assert(r1.data.count() === 3 && r1.failures.count() === 0)

    // custom transport: first credential rejected, refresh re-serves
    var authed = false
    val t2 = new PageTransport {
      override def fetchPage(i: Int, token: Option[String]) =
        if (!authed) PageAuthExpired
        else if (i < 1) PageData(jsonPage((7L, "x")))
        else PageEnd
      override def refreshAuth(): Unit = authed = true
    }
    val r2 = PagedSource.pagedSource(spark, target, t2)
    assert(r2.data.collect().map(_.getLong(0)).toSeq === Seq(7L))
  }

  test("accumulates pages by index until PageEnd") {
    val res = PagedSource.pagedSource(spark, target,
      (i, _) => if (i < 3) PageData(jsonPage((i * 2L, s"a$i"), (i * 2L + 1, s"b$i")))
                else PageEnd)
    assert(res.data.count() === 6)
    assert(res.failures.count() === 0)
    assert(res.data.select("id").collect().map(_.getLong(0)).sorted
      === (0L until 6L).toArray)
  }

  test("threads the continuation token between pages") {
    val chain = Map("" -> "t1", "t1" -> "t2")
    val seen = scala.collection.mutable.ArrayBuffer[String]()
    val res = PagedSource.pagedSource(spark, target,
      (i, token) => {
        val cur = token.getOrElse("")
        if (i >= 3) PageEnd
        else { seen += cur; PageData(jsonPage((i.toLong, cur)), chain.get(cur)) }
      })
    // page 0 with no token, page 1 with t1, page 2 with t2, then end
    assert(seen.take(3) === Seq("", "t1", "t2"))
    assert(res.data.count() === 3)
  }

  test("refreshes auth once and retries the same page") {
    var authOk = false
    var refreshes = 0
    val res = PagedSource.pagedSource(spark, target,
      (i, _) =>
        if (!authOk) PageAuthExpired
        else if (i < 2) PageData(jsonPage((i.toLong, s"r$i")))
        else PageEnd,
      refreshAuth = () => { authOk = true; refreshes += 1 })
    assert(refreshes === 1)
    assert(res.data.count() === 2)
  }

  test("fails when refresh does not fix the credential") {
    intercept[IllegalStateException] {
      PagedSource.pagedSource(spark, target, (_, _) => PageAuthExpired)
    }
  }

  test("quarantines schema-drifted pages with a reason, keeps the rest") {
    import spark.implicits._
    val bad = Seq("""{"id":99,"wrong_field":"x"}""").toDS()
    val res = PagedSource.pagedSource(spark, target,
      (i, _) => i match {
        case 0 => PageData(jsonPage((1L, "ok1")))
        case 1 => PageData(bad)
        case 2 => PageData(jsonPage((2L, "ok2")))
        case _ => PageEnd
      })
    assert(res.data.count() === 2)
    val f = res.failures.collect()
    assert(f.length === 1)
    assert(f.head.page === 1)
    assert(f.head.reason.contains("missing: name"))
    assert(f.head.reason.contains("unexpected: wrong_field"))
    assert(f.head.sampleDoc.contains("wrong_field"))
  }

  test("malformed JSON pages are quarantined via _corrupt_record") {
    import spark.implicits._
    val res = PagedSource.pagedSource(spark, target,
      (i, _) => i match {
        case 0 => PageData(Seq("{not json at all").toDS())
        case _ => PageEnd
      })
    assert(res.data.count() === 0)
    assert(res.failures.head().reason.contains("_corrupt_record"))
  }

  test("apiIngestPaged loads good pages and lands bad pages in failures") {
    import spark.implicits._
    import graft.control.Control.{JobSpec, RunLog}
    val tmp = java.nio.file.Files.createTempDirectory("paged").toString
    val spec = JobSpec(42L, 1, 1, "api", "", "tbl_paged", "SNP", keyCols = "id")
    val bad = Seq("""{"id":7,"drifted":"y"}""").toDS()
    val result = graft.run.Pipelines.apiIngestPaged(spark, spec, target,
      (i, _) => i match {
        case 0 => PageData(jsonPage((1L, "a"), (2L, "b")))
        case 1 => PageData(bad)
        case 2 => PageData(jsonPage((3L, "c")))
        case _ => PageEnd
      },
      refreshAuth = () => (),
      castSpecs = Seq("id:bigint"),
      targetPath = s"$tmp/data",
      failuresPath = s"$tmp/failures",
      runLog = new RunLog(spark, s"$tmp/runlog"))
    assert(result.status === "S")
    assert(spark.read.parquet(s"$tmp/data").count() === 3)
    val fails = spark.read.parquet(s"$tmp/failures").collect()
    assert(fails.length === 1)
    assert(fails.head.getAs[String]("reason").contains("unexpected: drifted"))
  }
}
