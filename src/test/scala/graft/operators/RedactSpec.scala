package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions

class RedactSpec extends SparkSpec {
  import spark.implicits._

  private def redact(s: String): String =
    Seq(s).toDF("t").select(TextFunctions.redactPii(col("t")))
      .collect().head.getString(0)

  test("redacts emails, urls, and phone spans with typed tokens") {
    assert(redact("write a.b_c+1@sub.ex.org today")
      === "write <EMAIL> today")
    assert(redact("docs at https://ex.io/a?q=1#f and http://plain.io x")
      === "docs at <URL> and <URL> x")
    assert(redact("call +44 (0) 2071-234-567 now")
      === "call <PHONE> now")
  }

  test("url wins over the email/phone patterns inside it") {
    assert(redact("https://ex.io/u@v/123456789 tail")
      === "<URL> tail")
  }

  test("plain text and short digit runs pass through") {
    val s = "version 1.2 of 42 things at 9am"
    assert(redact(s) === s)
  }
}
