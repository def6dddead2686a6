package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.functions.Bpe

class BpeSpec extends SparkSpec {

  import spark.implicits._

  /** Serial reference: word-frequency-weighted BPE with the exact
    * contract of Bpe.train — argmax (count desc, a asc, b asc),
    * greedy left-to-right apply. */
  private def bruteTrain(docs: Seq[String], numMerges: Int)
      : (Seq[(Int, String, String, Long)], Map[String, Seq[String]]) = {
    def words(t: String): Seq[String] = {
      val cleaned = t.toLowerCase.replaceAll("[^a-z0-9 ]", " ").trim
      if (cleaned.isEmpty) Seq.empty else cleaned.split("\\s+").toSeq
    }
    val counts = docs.flatMap(words).groupBy(identity)
      .map { case (w, o) => w -> o.size.toLong }
    var types: Map[String, (Long, Seq[String])] =
      counts.map { case (w, n) => w -> (n, w.map(_.toString)) }.toMap
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    var r = 1
    var done = false
    while (r <= numMerges && !done) {
      val pairCounts = scala.collection.mutable.Map[(String, String), Long]()
        .withDefaultValue(0L)
      types.values.foreach { case (n, s) =>
        s.sliding(2).filter(_.size == 2)
          .foreach(p => pairCounts((p(0), p(1))) += n)
      }
      if (pairCounts.isEmpty) done = true
      else {
        val ((a, b), cnt) = pairCounts.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }
        merges += ((r, a, b, cnt))
        def apply1(s: Seq[String]): Seq[String] =
          s.foldLeft(Vector.empty[String]) { (acc, x) =>
            if (acc.nonEmpty && acc.last == a && x == b)
              acc.init :+ (a + b)
            else acc :+ x
          }
        types = types.map { case (w, (n, s)) => w -> (n, apply1(s)) }
        r += 1
      }
    }
    (merges.toSeq, types.map { case (w, (_, s)) => w -> s })
  }

  private val corpus = Seq(
    "low lower lowest low low",
    "new newer newest new",
    "wider wide wide widest",
    "low and new and wide")

  test("merge table matches the serial reference") {
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val (expMerges, _) = bruteTrain(corpus, 10)
    val model = Bpe.train(Bpe.wordTypes(docs, "text"), 10)
    assert(model.merges === expMerges)
  }

  test("post-merge segmentations match the serial reference") {
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val (_, expTypes) = bruteTrain(corpus, 6)
    val model = Bpe.train(Bpe.wordTypes(docs, "text"), 6)
    val got = model.types.select("word", "s")
      .as[(String, Seq[String])].collect().toMap
    assert(got === expTypes)
  }

  test("greedy left-to-right fold handles overlapping runs") {
    // 'aaaa' under merge (a,a): [aa, aa]; 'aaa': [aa, a]
    val df = Seq(("aaaa", 1L), ("aaa", 1L), ("ab", 1L)).toDF("word", "n")
      .withColumn("s", org.apache.spark.sql.functions.expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))"))
    val merged = df.select(col("word"),
        Bpe.foldMerge(col("s"), "a", "a").as("s"))
      .as[(String, Seq[String])].collect().toMap
    assert(merged("aaaa") === Seq("aa", "aa"))
    assert(merged("aaa") === Seq("aa", "a"))
    assert(merged("ab") === Seq("a", "b"))
  }

  test("train stops early when no pairs remain") {
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val model = Bpe.train(Bpe.wordTypes(docs, "text"), 10)
    assert(model.merges === Seq((1, "a", "b", 2L)))
  }

  test("encode stats count subwords per document") {
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val model = Bpe.train(Bpe.wordTypes(docs, "text"), 6)
    val (_, expTypes) = bruteTrain(corpus, 6)
    val got = Bpe.encodeStats(docs, "doc_id", "text", model.types)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    corpus.zipWithIndex.foreach { case (t, i) =>
      val ws = t.split("\\s+").toSeq
      val subs = ws.flatMap(expTypes(_))
      assert(got(i.toLong) ===
        ((ws.size.toLong, subs.size.toLong, subs.distinct.size.toLong)), s"doc $i")
    }
  }
}
