package graft.operators

import graft.SparkSpec
import graft.functions.WordPiece

/** WordPiece training vs a serial reference (exact integer score,
  * greedy fold, ## algebra), plus the contract that separates it from
  * BPE: the likelihood score prefers a pair of RARE symbols over a
  * more frequent pair of common ones. */
class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  private def words(t: String): Seq[String] = {
    val cleaned = t.toLowerCase.replaceAll("[^a-z0-9 ]", " ").trim
    if (cleaned.isEmpty) Seq.empty else cleaned.split("\\s+").toSeq
  }

  /** Serial WordPiece: score = cnt·10¹² floor-div (ca·cb), ties
    * (score desc, a, b), greedy left-to-right fold per word. */
  private def serialTrain(docs: Seq[String], numMerges: Int)
      : Seq[(Int, String, String, Long, Long)] = {
    var types: Map[Vector[String], Long] = docs.flatMap(words)
      .groupBy(identity).map { case (w, os) =>
        w.toVector.zipWithIndex.map { case (c, i) =>
          if (i == 0) c.toString else "##" + c }.toVector -> os.size.toLong
      }
      // distinct words can collapse to one symbol seq only if equal
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long, Long)]
    for (r <- 1 to numMerges) {
      val pairCnt = scala.collection.mutable.Map.empty[(String, String), Long]
      val symCnt = scala.collection.mutable.Map.empty[String, Long]
      types.foreach { case (s, n) =>
        s.foreach(x => symCnt(x) = symCnt.getOrElse(x, 0L) + n)
        s.sliding(2).filter(_.size == 2).foreach { p =>
          pairCnt((p(0), p(1))) = pairCnt.getOrElse((p(0), p(1)), 0L) + n }
      }
      if (pairCnt.nonEmpty) {
        val scored = pairCnt.toSeq.map { case ((a, b), cnt) =>
          val sc = (BigInt(cnt) * BigInt(1000000000000L) /
            (BigInt(symCnt(a)) * BigInt(symCnt(b)))).toLong
          (a, b, cnt, sc)
        }
        val (a, b, cnt, sc) = scored.minBy { case (a, b, _, sc) =>
          (-sc, a, b) }
        out += ((r, a, b, cnt, sc))
        val merged = a + b.stripPrefix("##")
        def fold(s: Vector[String]): Vector[String] =
          s.foldLeft(Vector.empty[String]) { (acc, x) =>
            if (acc.nonEmpty && acc.last == a && x == b)
              acc.init :+ merged
            else acc :+ x
          }
        types = types.toSeq.map { case (s, n) => fold(s) -> n }
          .groupBy(_._1).map { case (s, vs) => s -> vs.map(_._2).sum }
      }
    }
    out.toSeq
  }

  private def run(docs: Seq[String], numMerges: Int)
      : Seq[(Int, String, String, Long, Long)] = {
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val model = WordPiece.train(WordPiece.wordTypes(df, "text"), numMerges)
    model.merges
  }

  test("merge table matches the serial reference on a hand corpus") {
    val docs = Seq(
      "the cat sat on the mat",
      "the cats sat on the mats",
      "matting and catting",
      "hugging huggable hugs")
    assert(run(docs, 6) === serialTrain(docs, 6))
  }

  test("randomized corpora replay exactly") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      val vocab = Seq("aba", "abab", "bab", "cab", "abc", "ccc", "ca")
      val docs = Seq.fill(6)(
        Seq.fill(8)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      assert(run(docs, 5) === serialTrain(docs, 5), s"trial $trial")
    }
  }

  test("likelihood score prefers rare-symbol pairs over raw frequency") {
    // "ab" appears 12x but a and b are everywhere (cheap score);
    // "xq" appears 3x and x/q appear nowhere else — WordPiece must
    // merge (x, ##q) first while BPE would take the frequent pair
    val docs = Seq(
      Seq.fill(12)("ab").mkString(" ") + " " + Seq.fill(10)("ba").mkString(" "),
      Seq.fill(3)("xq").mkString(" "))
    val wp = run(docs, 1).head
    assert((wp._2, wp._3) === (("x", "##q")))
    val bpe = graft.functions.Bpe.train(
      graft.functions.Bpe.wordTypes(
        docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text"), "text"), 1).merges.head
    assert((bpe._2, bpe._3) === (("a", "b")))
  }

  /** Serial maximal munch: longest vocab prefix at each position
    * (##-prefixed past position 1), whole word → [UNK] on any miss. */
  private def serialMunch(word: String, vocab: Set[String]): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < word.length) {
      val pre = if (i == 0) "" else "##"
      val l = (word.length - i to 1 by -1)
        .find(l => vocab.contains(pre + word.substring(i, i + l)))
        .getOrElse(0)
      if (l == 0) return Seq("[UNK]")
      out += pre + word.substring(i, i + l)
      i += l
    }
    out.toSeq
  }

  test("maximal munch and merge replay genuinely disagree") {
    // merges in training order: (a,##b)→ab, (##c,##d)→##cd,
    // (ab,##c)→abc. Replaying them on "abcd" consumes ##c into ##cd
    // at round 2, so round 3's (ab,##c) never fires → [ab, ##cd].
    // Maximal munch against the FINAL vocab takes the longest prefix
    // first → [abc, ##d]. Real BERT consumers run the latter.
    val merges = Seq(("a", "##b"), ("##c", "##d"), ("ab", "##c"))
    val vocab = Seq("a", "##b", "##c", "##d", "ab", "##cd", "abc")
    val types = Seq(("abcd", 1L, Seq("a", "##b", "##c", "##d")))
      .toDF("word", "n", "s")
    val replayed = WordPiece.applyMerges(types, merges)
      .select("s").as[Seq[String]].collect().head
    val munched = WordPiece.maximalMunch(types, vocab)
      .select("s").as[Seq[String]].collect().head
    assert(replayed === Seq("ab", "##cd"))
    assert(munched === Seq("abc", "##d"))
    assert(munched === serialMunch("abcd", vocab.toSet))
    assert(replayed !== munched)
  }

  test("maximal munch matches the serial reference on random words") {
    val rnd = new scala.util.Random(23)
    val alphabet = "abcd"
    for (trial <- 1 to 3) {
      val words = Seq.fill(30)(
        Seq.fill(1 + rnd.nextInt(8))(alphabet(rnd.nextInt(4))).mkString)
        .distinct
      // random vocab: a truncated alphabet (c dropped as a root, ##d
      // dropped as a continuation) + random longer pieces, so both
      // the UNK path and multi-char matches are exercised
      val vocab = (Seq("a", "b", "d", "##a", "##b", "##c") ++
        Seq.fill(12) {
          val l = 2 + rnd.nextInt(3)
          val p = Seq.fill(l)(alphabet(rnd.nextInt(4))).mkString
          if (rnd.nextBoolean()) p else "##" + p
        }).distinct
      val types = words.map(w => (w, 1L)).toDF("word", "n")
      val got = WordPiece.maximalMunch(types, vocab)
        .select("word", "s", "is_unk")
        .as[(String, Seq[String], Boolean)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      words.foreach { w =>
        val want = serialMunch(w, vocab.toSet)
        assert(got(w)._1 === want, s"trial $trial word $w vocab $vocab")
        assert(got(w)._2 === (want == Seq("[UNK]")), s"unk flag for $w")
      }
    }
  }

  test("frequency-truncated vocab yields [UNK] and inferStats counts it") {
    val docs = Seq((1L, "aa qz qz"), (2L, "qz qz"), (3L, ""))
      .toDF("doc_id", "text")
    val types0 = WordPiece.wordTypes(docs, "text")
    val model = WordPiece.train(types0, 1)
    // likelihood prefers the RARE pair: (a,##a) cnt 1 scores 10¹²/1
    // over (q,##z) cnt 4 at 4·10¹²/16, so the single merge is "aa";
    // minCount 5 then drops every raw symbol (a/##a count 1, q/##z
    // count 4), leaving vocab = {the merged "aa"} — "qz" cannot be
    // segmented while "aa" still can, via the merge
    val vocab = WordPiece.vocab(types0, model, minCount = 5L)
    assert(vocab === Seq("aa"))
    val munched = WordPiece.maximalMunch(types0, vocab)
    val got = munched.select("word", "s", "is_unk")
      .as[(String, Seq[String], Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("qz") === ((Seq("[UNK]"), true)))
    assert(got("aa") === ((Seq("aa"), false)))
    val stats = WordPiece.inferStats(docs, "doc_id", "text", munched)
      .orderBy("id")
      .as[(Long, Long, Long, Long, Long)].collect()
    // doc 1: 3 words, 2 unk occurrences; doc 2: 2 words, 2 unk; doc 3
    // empty text → all-zero row (the left-join contract)
    assert(stats.map(r => (r._1, r._2, r._5)) ===
      Seq((1L, 3L, 2L), (2L, 2L, 2L), (3L, 0L, 0L)))
  }

  test("join-path munch (large vocab) matches inline path and serial") {
    // a few-thousand-entry vocab forces the broadcast-join strategy
    // (> InlineVocabMax); equivalence is gated against the serial
    // reference, which the inline-path tests above already match —
    // so serial agreement here proves join ≡ inline on this vocab
    val rnd = new scala.util.Random(31)
    val alphabet = "abcdef"
    def randPiece(): String = {
      val l = 1 + rnd.nextInt(4)
      val p = Seq.fill(l)(alphabet(rnd.nextInt(alphabet.length))).mkString
      if (rnd.nextBoolean()) p else "##" + p
    }
    // ~3000 distinct pieces incl. tricky literals (quote, backslash)
    val vocab = (Seq("a'b", "c\\d", "##e'f") ++
      Seq.fill(4000)(randPiece())).distinct
    assert(vocab.size > WordPiece.InlineVocabMax)
    val words = (Seq("a'bcd", "c\\def") ++ Seq.fill(60)(
      Seq.fill(1 + rnd.nextInt(10))(
        alphabet(rnd.nextInt(alphabet.length))).mkString)).distinct
    val types = words.map(w => (w, 1L)).toDF("word", "n")
    val viaAuto = WordPiece.maximalMunch(types, vocab) // join path
      .select("word", "s", "is_unk")
      .as[(String, Seq[String], Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    words.foreach { w =>
      val want = serialMunch(w, vocab.toSet)
      assert(viaAuto(w)._1 === want, s"word $w")
      assert(viaAuto(w)._2 === (want == Seq("[UNK]")), s"unk flag for $w")
    }
  }

  test("inline-path literal escaping survives quotes and backslashes") {
    // stays under InlineVocabMax → the CASE-inlined strategy, whose
    // pieces are injected as SQL string literals (the escaping
    // surface the join path doesn't have)
    val vocab = Seq("a'b", "c\\d", "##e'f", "a", "b", "c", "d", "e", "f",
      "##a", "##b", "##c", "##d", "##e", "##f")
    val words = Seq("a'bcd", "c\\de", "abe'f", "xyz")
    val types = words.map(w => (w, 1L)).toDF("word", "n")
    val got = WordPiece.maximalMunch(types, vocab)
      .select("word", "s").as[(String, Seq[String])].collect().toMap
    words.foreach { w =>
      assert(got(w) === serialMunch(w, vocab.toSet), s"word $w")
    }
  }

  test("## algebra: merged continuation symbols keep the prefix") {
    // single word "aaa" -> [a, ##a, ##a]; pair counts: (a,##a)=1,
    // (##a,##a)=1; symbol counts a=1, ##a=2 -> score(a,##a)=1e12/2,
    // score(##a,##a)=1e12/4 -> merge (a, ##a) -> "aa", leaving
    // [aa, ##a]; round 2 merges (aa, ##a) -> "aaa"
    val m = run(Seq("aaa"), 2)
    assert(m.map(x => (x._2, x._3)) === Seq(("a", "##a"), ("aa", "##a")))
    val df = Seq((1L, "aaa")).toDF("doc_id", "text")
    val model = WordPiece.train(WordPiece.wordTypes(df, "text"), 2)
    val s = model.types.select("s").as[Seq[String]].collect().head
    assert(s === Seq("aaa"))
  }
}
