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
