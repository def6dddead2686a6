package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.LmCoverage

class LmCoverageSpec extends SparkSpec {

  import spark.implicits._

  test("bigram coverage matches a hand-computed corpus") {
    // corpus bigrams: "the cat"×2 (docs 1,2), "cat sat"×2 (docs 1,2),
    // "sat sat"×1 (doc 2), "dog runs"×1 (doc 3)
    val docs = Seq(
      (1L, "the cat sat"),            // bigrams: the cat, cat sat
      (2L, "the cat sat sat"),        // the cat, cat sat, sat sat
      (3L, "dog runs"),               // dog runs
      (4L, "single"),                 // <2 words → zeros
      (5L, "")).toDF("doc_id", "text")
    val got = LmCoverage.bigramCoverage(docs, "doc_id", "text")
      .orderBy("id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, 2L, 2L, 2L),  // both bigrams corpus-count 2
      (2L, 3L, 3L, 2L),  // sat sat is corpus-unique
      (3L, 1L, 1L, 0L),  // dog runs is corpus-unique
      (4L, 0L, 0L, 0L),
      (5L, 0L, 0L, 0L)))
  }

  test("repeated bigram inside ONE doc counts as covered at minCount=2") {
    val docs = Seq((1L, "go go go")).toDF("doc_id", "text") // "go go"×2
    val got = LmCoverage.bigramCoverage(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 2L, 1L, 1L)))
  }

  test("minCount=1 marks every bigram covered") {
    val docs = Seq((1L, "a b c"), (2L, "x y")).toDF("doc_id", "text")
    val got = LmCoverage.bigramCoverage(docs, "doc_id", "text", minCount = 1L)
      .orderBy("id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 2L, 2L, 2L), (2L, 1L, 1L, 1L)))
  }
}
