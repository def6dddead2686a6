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

  test("train/score split equals the fused self-scoring phrasing") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat"),
      (3L, "a dog runs fast"),
      (4L, "the the the")).toDF("doc_id", "text")
    val fused = NgramLm.bigramNll(docs, "doc_id", "text")
      .orderBy("id").as[(Long, Long, Long)].collect().toSeq
    val lm = NgramLm.trainBigramLm(docs, "text")
    val split = NgramLm.scoreAgainstLm(docs, "doc_id", "text", lm)
      .orderBy("id").as[(Long, Long, Long)].collect().toSeq
    assert(split === fused)
  }

  test("scoring held-out text prices unseen bigrams at the add-one floor") {
    val corpus = Seq((1L, "the cat sat"), (2L, "the cat ran")).toDF("doc_id", "text")
    val lm = NgramLm.trainBigramLm(corpus, "text")
    // corpus: V=5 (the,cat,sat,ran + ...): words = the,cat,sat,ran → V=4
    // contexts: the→2, cat→2; bigrams: (the,cat)=2,(cat,sat)=1,(cat,ran)=1
    val heldOut = Seq(
      (10L, "the cat"),   // seen bigram: ln((2+4)/(2+1))
      (11L, "cat zzz"),   // seen context, unseen bigram: ln((2+4)/(0+1))
      (12L, "zzz qqq"))   // unseen context: ln((0+4)/(0+1))
      .toDF("doc_id", "text")
    val got = NgramLm.scoreAgainstLm(heldOut, "doc_id", "text", lm)
      .orderBy("id").as[(Long, Long, Long)].collect().toSeq
    def mn(num: Double, den: Double) = math.round(math.log(num / den) * 1e6)
    assert(got === Seq(
      (10L, 1L, mn(6.0, 3.0)),
      (11L, 1L, mn(6.0, 1.0)),
      (12L, 1L, mn(4.0, 1.0))))
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
