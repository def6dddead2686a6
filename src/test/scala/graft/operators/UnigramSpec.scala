package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.functions.{Bpe, Unigram}

/** Unigram (SentencePiece-style) tokenizer training
  * ([[Unigram]]): the Viterbi DP unit-tested on hand-checkable
  * costs, and the whole distributed training loop (seed → hard-EM
  * rounds → prune) replayed against a serial driver-side reference
  * on random corpora — the [[Bpe]] property-test contract for the
  * stages no SQL oracle can express (q_unigram_seed carries the
  * oracle-expressible stage).
  */
class UnigramSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def holds(p: Prop, n: Int = 6): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(n).withInitialSeed(42L), p)
    assert(res.passed, res.status.toString)
  }

  test("viterbi picks the cheapest segmentation") {
    val cost = Map("ab" -> 5L, "a" -> 4L, "b" -> 4L, "abc" -> 9L, "c" -> 3L)
    // [a,b,c]=11, [ab,c]=8, [abc]=9 → [ab, c]
    assert(Unigram.viterbi("abc", cost, 4) == Seq("ab", "c"))
    assert(Unigram.viterbi("", cost, 4) == Nil)
    assert(Unigram.viterbi("b", cost, 4) == Seq("b"))
  }

  test("viterbi ties prefer the longer piece") {
    val cost = Map("ab" -> 5L, "a" -> 4L, "b" -> 4L, "abc" -> 8L, "c" -> 3L)
    // [ab,c]=8 ties [abc]=8 → the longer final piece wins
    assert(Unigram.viterbi("abc", cost, 4) == Seq("abc"))
  }

  test("viterbi OOV characters fall back to deterministic per-char pieces") {
    val cost = Map("a" -> 4L, "b" -> 4L, "ab" -> 5L)
    assert(Unigram.viterbi("axb", cost, 4) == Seq("a", "x", "b"))
  }

  test("segmentation concatenates back to the word") {
    val types = Bpe.wordTypes(
      Seq((1L, "banana bandana cabana banana")).toDF("doc_id", "text"), "text")
    val model = Unigram.train(types, vocabSize = 10, maxPieceLen = 3,
      rounds = 2, seedSize = 20)
    Seq("banana", "bandana", "cabana").foreach { w =>
      assert(Unigram.viterbi(w, model.costMap, model.maxPieceLen)
        .mkString == w)
    }
  }

  test("training replays the serial reference exactly on random corpora") {
    val word = Gen.choose(1, 5).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val corpus = Gen.choose(3, 30).flatMap(n => Gen.listOfN(n, word))
    val (vocabSize, maxLen, rounds, seedSize) = (8, 3, 2, 12)

    def costsOf(counts: Seq[(String, Long)]): Seq[(String, Long, Long)] = {
      val total = counts.map(_._2).sum
      val v = counts.size.toLong
      counts.map { case (p, c) =>
        (p, c, math.round(math.log((total + v).toDouble / (c + 1.0)) * 1e6))
      }
    }

    def serialTrain(ws: Seq[String]): Seq[(String, Long, Long)] = {
      val types = ws.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val sub = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
      for ((w, n) <- types; i <- 0 until w.length;
           l <- 1 to math.min(maxLen, w.length - i))
        sub(w.substring(i, i + l)) += n
      val chars0 = sub.filter(_._1.length == 1).toSeq
      val top0 = sub.filter(_._1.length > 1).toSeq
        .sortBy { case (p, c) => (-c, p) }.take(seedSize)
      var model = costsOf((chars0 ++ top0).sortBy(_._1))
      (1 to rounds).foreach { _ =>
        val cm = model.map(p => p._1 -> p._3).toMap
        val used = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
        for ((w, n) <- types;
             p <- Unigram.viterbi(w, cm, maxLen)) used(p) += n
        val chars = model.map(_._1).filter(_.length == 1)
          .map(p => (p, used.getOrElse(p, 0L)))
        val longer = used.filter(_._1.length > 1).toSeq
          .sortBy { case (p, c) => (-c, p) }.take(vocabSize)
        model = costsOf((chars ++ longer).sortBy(_._1))
      }
      model
    }

    holds(Prop.forAll(corpus) { ws =>
      val docs = Seq((1L, ws.mkString(" "))).toDF("doc_id", "text")
      val got = Unigram.train(Bpe.wordTypes(docs, "text"),
        vocabSize, maxLen, rounds, seedSize).pieces
      got == serialTrain(ws)
    })
  }

  test("encodeStats counts pieces per document") {
    val docs = Seq(
      (1L, "aba aba cab"),
      (2L, ""),
      (3L, "cab")).toDF("doc_id", "text")
    val model = Unigram.train(Bpe.wordTypes(docs, "text"),
      vocabSize = 6, maxPieceLen = 3, rounds = 1, seedSize = 10)
    val rows = Unigram.encodeStats(docs, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows(2L) == ((0L, 0L, 0L)))
    assert(rows(1L)._1 == 3L) // three words
    assert(rows(3L)._1 == 1L)
    // piece totals are consistent: doc 3's pieces ⊆ doc 1's piece count
    assert(rows(1L)._2 >= rows(3L)._2)
  }
}
