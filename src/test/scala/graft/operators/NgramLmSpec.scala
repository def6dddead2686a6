package graft.operators

import graft.SparkSpec
import graft.functions.NgramLm

class NgramLmSpec extends SparkSpec {

  import spark.implicits._

  /** Serial reference: add-one bigram NLL in micro-nats, per-bigram
    * rounding before the sum — the exact contract of bigramNll. */
  private def brute(docs: Seq[(Long, String)]): Map[Long, (Long, Long)] = {
    def words(t: String): Seq[String] = {
      val cleaned = t.toLowerCase.replaceAll("[^a-z0-9 ]", " ").trim
      if (cleaned.isEmpty) Seq.empty else cleaned.split("\\s+").toSeq
    }
    val tokenized = docs.map { case (id, t) => id -> words(t) }
    val vocab = tokenized.flatMap(_._2).distinct.size
    val allBigrams = tokenized.flatMap { case (_, w) => w.sliding(2).filter(_.size == 2).map(p => (p(0), p(1))) }
    val bigCnt = allBigrams.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val ctxCnt = allBigrams.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    tokenized.map { case (id, w) =>
      val bgs = w.sliding(2).filter(_.size == 2).map(p => (p(0), p(1))).toSeq
      val nll = bgs.map { bg =>
        val mn = math.round(math.log(
          (ctxCnt(bg._1) + vocab).toDouble / (bigCnt(bg) + 1.0)) * 1e6)
        mn
      }.sum
      id -> (bgs.size.toLong, nll)
    }.toMap
  }

  test("bigram NLL matches the serial reference on a hand corpus") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat"),
      (3L, "a dog runs fast"),
      (4L, "the the the"),
      (5L, "single"),
      (6L, ""))
    val expected = brute(docs)
    val got = NgramLm.bigramNll(docs.toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("id").as[(Long, Long, Long)].collect().toSeq
    assert(got.map(_._1) === docs.map(_._1).sorted)
    got.foreach { case (id, n, nll) =>
      assert((n, nll) === expected(id), s"doc $id")
    }
  }

  test("frequent bigrams score lower NLL than corpus-unique ones") {
    // "the cat" appears in every doc; "zq xv" once — the common bigram
    // must be cheaper per occurrence
    val docs = Seq(
      (1L, "the cat the cat the cat"),
      (2L, "the cat"),
      (3L, "zq xv")).toDF("doc_id", "text")
    val rows = NgramLm.bigramNll(docs, "doc_id", "text")
      .orderBy("id").as[(Long, Long, Long)].collect()
    val perBigramCommon = rows(1)._3.toDouble / rows(1)._2
    val perBigramRare = rows(2)._3.toDouble / rows(2)._2
    assert(perBigramCommon < perBigramRare)
  }

  test("short and empty documents report zeros") {
    val docs = Seq((1L, "a b"), (2L, "x"), (3L, "  ")).toDF("doc_id", "text")
    val got = NgramLm.bigramNll(docs, "doc_id", "text")
      .orderBy("id").as[(Long, Long, Long)].collect().toSeq
    assert(got(1) === ((2L, 0L, 0L)))
    assert(got(2) === ((3L, 0L, 0L)))
    assert(got(0)._2 === 1L)
  }
}
