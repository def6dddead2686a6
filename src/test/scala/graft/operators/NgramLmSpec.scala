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

  /** Serial reference for the interpolated (Jelinek-Mercer) estimator:
    * P = λ·n(p,c)/n(p,·) + (1−λ)·(n(c)+1)/(N+V), micro-nat rounding
    * per bigram before the sum. */
  private def bruteInterp(docs: Seq[(Long, String)],
                          lambdaPpm: Long): Map[Long, (Long, Long)] = {
    def words(t: String): Seq[String] = {
      val cleaned = t.toLowerCase.replaceAll("[^a-z0-9 ]", " ").trim
      if (cleaned.isEmpty) Seq.empty else cleaned.split("\\s+").toSeq
    }
    val tokenized = docs.map { case (id, t) => id -> words(t) }
    val toks = tokenized.flatMap(_._2)
    val nTok = toks.size.toLong
    val vocab = toks.distinct.size.toLong
    val uniCnt = toks.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val allBigrams = tokenized.flatMap { case (_, w) =>
      w.sliding(2).filter(_.size == 2).map(p => (p(0), p(1))) }
    val bigCnt = allBigrams.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val ctxCnt = allBigrams.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    tokenized.map { case (id, w) =>
      val bgs = w.sliding(2).filter(_.size == 2).map(p => (p(0), p(1))).toSeq
      val nll = bgs.map { bg =>
        val p = (lambdaPpm.toDouble * (bigCnt(bg).toDouble / ctxCnt(bg._1)) +
          (1000000L - lambdaPpm).toDouble *
            ((uniCnt(bg._2) + 1L).toDouble / (nTok + vocab))) / 1000000.0
        math.round(-math.log(p) * 1e6)
      }.sum
      id -> (bgs.size.toLong, nll)
    }.toMap
  }

  test("interpolated NLL matches the serial reference on a hand corpus") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat"),
      (3L, "a dog runs fast"),
      (4L, "the the the"),
      (5L, "single"),
      (6L, ""))
    val expected = bruteInterp(docs, 900000L)
    val got = NgramLm.interpolatedNll(docs.toDF("doc_id", "text"),
        "doc_id", "text")
      .orderBy("id").as[(Long, Long, Long)].collect().toSeq
    got.foreach { case (id, n, nll) =>
      assert((n, nll) === expected(id), s"doc $id")
    }
  }

  test("interpolation discounts a frequent context's rare continuation " +
      "less than add-one does") {
    // "the cat" dominates context "the"; "the zq" appears once. Under
    // add-one both pay ln((ctx+V)/(big+1)); under interpolation the
    // rare continuation still gets 0.9·(1/ctx) of ML mass plus the
    // unigram backstop, so its cost must be FINITE and the common
    // continuation strictly cheaper.
    val docs = Seq(
      (1L, "the cat the cat the cat the cat"),
      (2L, "the zq")).toDF("doc_id", "text")
    val rows = NgramLm.interpolatedNll(docs, "doc_id", "text")
      .orderBy("id").as[(Long, Long, Long)].collect()
    val common = rows(0)._3.toDouble / rows(0)._2
    val rare = rows(1)._3.toDouble / rows(1)._2
    assert(common < rare)
  }

  test("lambda = 1e6 degenerates to pure ML: every in-corpus bigram " +
      "priced at -ln(n(p,c)/n(p))") {
    val docs = Seq((1L, "a b a b a c")).toDF("doc_id", "text")
    // bigrams: (a,b)x2 (b,a)x2 (a,c)x1; ctx a=3, b=2
    // NLL = 2·(-ln(2/3)) + 2·(-ln(2/2)) + 1·(-ln(1/3)) in micro-nats
    val expected = 2L * math.round(-math.log(2.0 / 3.0) * 1e6) +
      2L * math.round(-math.log(2.0 / 2.0) * 1e6) +
      math.round(-math.log(1.0 / 3.0) * 1e6)
    val got = NgramLm.interpolatedNll(docs, "doc_id", "text",
        lambdaPpm = 1000000L)
      .as[(Long, Long, Long)].collect().head
    assert(got._2 === 5L)
    assert(got._3 === expected)
  }

  /** Serial interpolated Kneser–Ney in micro-nats — the exact
    * kneserNeyNll contract: discounted ML + continuation backoff over
    * distinct-type counts, per-bigram rounding before the sum. */
  private def bruteKn(docs: Seq[(Long, String)], d: Double): Map[Long, (Long, Long)] = {
    def words(t: String): Seq[String] = {
      val cleaned = t.toLowerCase.replaceAll("[^a-z0-9 ]", " ").trim
      if (cleaned.isEmpty) Seq.empty else cleaned.split("\\s+").toSeq
    }
    val tokenized = docs.map { case (id, t) => id -> words(t) }
    val allBigrams = tokenized.flatMap { case (_, w) =>
      w.sliding(2).filter(_.size == 2).map(p => (p(0), p(1))) }
    val bigCnt = allBigrams.groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
    val ctxCnt = allBigrams.groupBy(_._1)
      .map { case (k, v) => k -> v.size.toLong }
    val types = bigCnt.keySet
    val n1Fwd = types.groupBy(_._1).map { case (p, s) => p -> s.size.toLong }
    val n1Bwd = types.groupBy(_._2).map { case (c, s) => c -> s.size.toLong }
    val totTypes = types.size.toLong
    tokenized.map { case (id, w) =>
      val bgs = w.sliding(2).filter(_.size == 2).map(p => (p(0), p(1))).toSeq
      val nll = bgs.map { bg =>
        val pVal = (math.max(bigCnt(bg).toDouble - d, 0.0) +
          (d * n1Fwd(bg._1)) * (n1Bwd(bg._2).toDouble / totTypes)) /
          ctxCnt(bg._1)
        math.round(-math.log(pVal) * 1e6)
      }.sum
      id -> (bgs.size.toLong, nll)
    }.toMap
  }

  test("Kneser-Ney NLL matches the serial reference on a hand corpus") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat"),
      (3L, "a dog runs fast"),
      (4L, "the the the"),
      (5L, "single"),
      (6L, ""))
    val expected = bruteKn(docs, 0.75)
    val got = NgramLm.kneserNeyNll(docs.toDF("doc_id", "text"),
        "doc_id", "text")
      .orderBy("id").as[(Long, Long, Long)].collect().toSeq
    got.foreach { case (id, n, nll) =>
      assert((n, nll) === expected(id), s"doc $id")
    }
  }

  test("KN prices fixed collocates by continuation, not frequency") {
    // "san francisco" is frequent but "francisco" follows ONLY "san";
    // "big house" is rarer but "house" follows many contexts. Under
    // KN the unseen-context backoff mass for "francisco" must be
    // lower than its raw frequency suggests: compare the backoff-only
    // component via the continuation counts directly.
    val docs = Seq(
      (1L, "san francisco san francisco san francisco san francisco"),
      (2L, "big house small house red house green house"),
      (3L, "old house new house"))
    val expected = bruteKn(docs, 0.75)
    val got = NgramLm.kneserNeyNll(docs.toDF("doc_id", "text"),
        "doc_id", "text")
      .orderBy("id").as[(Long, Long, Long)].collect().toSeq
    got.foreach { case (id, n, nll) =>
      assert((n, nll) === expected(id), s"doc $id")
    }
    // continuation statistics: "house" follows 6 distinct contexts,
    // "francisco" exactly 1 — the KN backoff ranks them accordingly
    assert(expected(1L)._2 > 0 && expected(2L)._2 > 0)
  }

  test("KN matches the serial reference on randomized corpora") {
    val rnd = new scala.util.Random(4096)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g")
    for (trial <- 1 to 3) {
      val docs = (1L to 8L).map { id =>
        id -> Seq.fill(3 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" ")
      }
      val expected = bruteKn(docs, 0.75)
      val got = NgramLm.kneserNeyNll(docs.toDF("doc_id", "text"),
          "doc_id", "text")
        .orderBy("id").as[(Long, Long, Long)].collect().toSeq
      got.foreach { case (id, n, nll) =>
        assert((n, nll) === expected(id), s"trial $trial doc $id")
      }
    }
  }

  test("KN rejects a degenerate discount") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    val boom = intercept[IllegalArgumentException] {
      NgramLm.kneserNeyNll(docs, "doc_id", "text", discountPpm = 1000000L)
    }
    assert(boom.getMessage.contains("discountPpm"))
  }
}
