package graft.operators

import graft.SparkSpec
import graft.dedup.SpanDedup

class SpanScrubSpec extends SparkSpec {
  import spark.implicits._

  private val shared = (1 to 5).map(i => s"dup$i").mkString(" ")

  test("duplicated span survives in its first owner, is cut elsewhere") {
    val docs = Seq(
      (1L, s"alpha beta $shared gamma delta"),
      (2L, s"one two three $shared four five"),
      (3L, "totally unrelated words here nothing shared at all"))
      .toDF("doc_id", "text")
    val out = SpanDedup.scrubDuplicatedSpans(docs, "doc_id", "text",
        window = 5)
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap
    // doc 1 owns the span (lowest id): nothing removed
    assert(out(1L)._3 === 0L)
    assert(out(1L)._1.contains("dup1"))
    // doc 2 loses exactly the 5 shared words
    assert(out(2L) === (("one two three four five", 10L, 5L)))
    // doc 3 untouched
    assert(out(3L)._3 === 0L)
  }

  test("overlapping duplicated windows merge into one clean cut") {
    // 6 shared words → two overlapping 5-windows in each doc; the cut
    // must remove the merged 6-word range once, not double-count
    val six = (1 to 6).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"$six tail words here"),
      (2L, s"head words $six"))
      .toDF("doc_id", "text")
    val out = SpanDedup.scrubDuplicatedSpans(docs, "doc_id", "text",
        window = 5)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(3)))
      .toMap
    assert(out(1L)._2 === 0L)
    assert(out(2L) === (("head words", 6L)))
  }

  test("documents shorter than the window pass through whole") {
    val docs = Seq((1L, "tiny doc"), (2L, "tiny doc")).toDF("doc_id", "text")
    val out = SpanDedup.scrubDuplicatedSpans(docs, "doc_id", "text", 5)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out === Map(1L -> 0L, 2L -> 0L))
  }
}
