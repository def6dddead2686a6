package graft.operators

import graft.SparkSpec
import graft.classify.NaiveBayes

class NaiveBayesSpec extends SparkSpec {

  import spark.implicits._

  /** Serial reference of classify's micro-nat integer contract. */
  private def brute(docs: Seq[(Long, String, String)])
      : Map[Long, (String, Long)] = {
    def words(t: String): Seq[String] = {
      val cleaned = t.toLowerCase.replaceAll("[^a-z0-9 ]", " ").trim
      if (cleaned.isEmpty) Seq.empty else cleaned.split("\\s+").toSeq
    }
    val tok = docs.flatMap { case (id, t, l) => words(t).map(w => (id, l, w)) }
    val nWc = tok.groupBy(r => (r._2, r._3)).map { case (k, v) => k -> v.size.toLong }
      .withDefaultValue(0L)
    val nC = tok.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    val vocab = tok.map(_._3).distinct.size.toLong
    val nDocs = docs.groupBy(_._3).map { case (k, v) => k -> v.size.toLong }
    val n = docs.size.toLong
    val classes = nDocs.keys.toSeq.sorted
    docs.map { case (id, t, _) =>
      val ws = words(t)
      val costs = classes.map { c =>
        val pc = math.round(math.log(n.toDouble / nDocs(c)) * 1e6)
        val wcost = ws.map { w =>
          math.round(math.log((nC(c) + vocab).toDouble / (nWc((c, w)) + 1.0)) * 1e6)
        }.sum
        c -> (pc + wcost)
      }
      val (pred, cost) = costs.minBy { case (c, k) => (k, c) }
      id -> (pred, cost)
    }.toMap
  }

  private val docs = Seq(
    (1L, "gato perro casa sol gato", "es"),
    (2L, "perro sol casa luna", "es"),
    (3L, "cat dog house sun cat", "en"),
    (4L, "dog sun house moon", "en"),
    (5L, "chat chien maison soleil", "fr"),
    (6L, "gato luna sol", "es"),
    (7L, "cat moon sun", "en"),
    (8L, "sun sol", "en"))

  test("matches the serial micro-nat reference") {
    val got = NaiveBayes.classify(docs.toDF("doc_id", "text", "lang"),
        "doc_id", "text", "lang")
      .as[(Long, String, String, Long)].collect()
      .map(r => r._1 -> ((r._3, r._4))).toMap
    assert(got === brute(docs))
  }

  test("self-training recovers the labels of separable documents") {
    val got = NaiveBayes.classify(docs.toDF("doc_id", "text", "lang"),
        "doc_id", "text", "lang")
      .as[(Long, String, String, Long)].collect()
    // docs 1-7 use class-distinctive vocabulary; their own label wins
    got.filter(_._1 <= 7L).foreach { r =>
      assert(r.`_3` === r.`_2`, s"doc ${r._1}")
    }
  }

  test("held-out scoring prices unseen words at the add-one floor") {
    val train = Seq(
      (1L, "gato perro casa", "es"), (2L, "perro sol", "es"),
      (3L, "cat dog house", "en"), (4L, "dog sun", "en"))
    val test = Seq((10L, "gato zzz"), (11L, "zzz qqq"))
    val model = NaiveBayes.train(train.toDF("doc_id", "text", "lang"),
      "text", "lang")
    val got = NaiveBayes.score(test.toDF("doc_id", "text"),
        "doc_id", "text", model)
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // serial: V=8, n_c=5 per class, priors ln(2) each
    def mn(num: Double, den: Double) = math.round(math.log(num / den) * 1e6)
    val floor = mn(13.0, 1.0) // ln((5+8)/1): unseen word, either class
    val prior = mn(2.0, 1.0)
    // doc 10: 'gato' seen only in es (n_wc=1): es cost ln(13/2)+floor,
    // en cost floor+floor — es wins
    assert(got(10L) === (("es", prior + mn(13.0, 2.0) + floor)))
    // doc 11: both words unseen → equal costs, tie to 'en' (asc)
    assert(got(11L) === (("en", prior + 2 * floor)))
  }

  test("a word-less document takes the prior-only argmin") {
    val withEmpty = docs :+ ((9L, "   ", "fr"))
    val got = NaiveBayes.classify(withEmpty.toDF("doc_id", "text", "lang"),
        "doc_id", "text", "lang")
      .as[(Long, String, String, Long)].collect()
      .map(r => r._1 -> ((r._3, r._4))).toMap
    // priors: en 4/9, es 3/9, fr 1/9 → 'en' is the cheapest prior
    assert(got(9L)._1 === "en")
    assert(got === brute(withEmpty))
  }
}
