package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.similarity.SparseCosine

class SparseCosineSpec extends AnyFunSuite with SparkSpec {

  test("identical term distributions score cos2 = 1.0") {
    import spark.implicits._
    val docs = Seq((1L, "spark shuffles data fast"),
        (2L, "fast spark data shuffles"),
        (3L, "completely different words here"))
      .toDF("id", "text")
    val got = SparseCosine.cosinePairs(docs, "id", "text", 0L)
      .orderBy("id_a", "id_b").as[(Long, Long, Long, Long)]
      .collect().toSeq
    // only (1,2) share any term; all tf=1, dot=4, norms 4·4
    assert(got === Seq((1L, 2L, 4L, 1000000L)))
  }

  test("hand-computed partial overlap") {
    import spark.implicits._
    // a: {x:2, y:1} n2=5 ; b: {x:1, z:1} n2=2 ; dot=2
    // cos² = 4/10 → 400000 ppm
    val docs = Seq((1L, "x x y"), (2L, "x z")).toDF("id", "text")
    val got = SparseCosine.cosinePairs(docs, "id", "text", 0L)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 2L, 2L, 400000L)))
  }

  test("maxDf drops stop-grade terms from the index but not norms") {
    import spark.implicits._
    // "the" appears in all 4 docs; with maxDf=3 it never joins, so
    // docs sharing ONLY "the" produce no pair — and a surviving
    // pair's norm still includes it (score sinks below 1.0)
    val docs = Seq((1L, "the alpha"), (2L, "the alpha"),
        (3L, "the beta"), (4L, "the gamma"))
      .toDF("id", "text")
    val got = SparseCosine
      .cosinePairs(docs, "id", "text", 0L, maxDf = 3L)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // only (1,2) share a surviving term; dot=1 (alpha), norms 2·2 →
    // cos² = 1/4 → 250000 (the dropped "the" still weighs the norms)
    assert(got === Seq((1L, 2L, 1L, 250000L)))
  }

  test("random corpora match the brute-force TF cosine exactly") {
    import spark.implicits._
    // deterministic pseudo-random docs over a 12-word vocabulary —
    // dense enough that pairs share terms, with repeats for tf > 1
    val vocab = "alpha beta gamma delta eps zeta eta theta iota kappa lambda mu".split(" ")
    def doc(id: Long): String =
      (0 until 20).map(i => vocab(((id * 31 + i * i * 7) % 12).toInt))
        .mkString(" ")
    val docs = (1L to 15L).map(i => (i, doc(i))).toDF("id", "text")
    val got = SparseCosine.cosinePairs(docs, "id", "text", 0L)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => ((r._1, r._2), (r._3, r._4))).toMap
    val tfs = (1L to 15L).map(i => i ->
      doc(i).split(" ").groupBy(identity).map { case (w, a) =>
        w -> a.length.toLong }).toMap
    val want = (for {
      a <- 1L to 15L; b <- 1L to 15L if a < b
      dot = tfs(a).keySet.intersect(tfs(b).keySet).toSeq
        .map(w => tfs(a)(w) * tfs(b)(w)).sum if dot > 0
    } yield {
      val na = tfs(a).values.map(v => v * v).sum
      val nb = tfs(b).values.map(v => v * v).sum
      ((a, b), (dot, 1000000L * dot * dot / (na * nb)))
    }).toMap
    assert(got === want)
    assert(want.nonEmpty)
  }

  test("threshold prunes weak pairs") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d"), (2L, "a w x y"), (3L, "a b c e"))
      .toDF("id", "text")
    val all = SparseCosine.cosinePairs(docs, "id", "text", 0L)
      .as[(Long, Long, Long, Long)].collect()
    val strong = SparseCosine.cosinePairs(docs, "id", "text", 500000L)
      .as[(Long, Long, Long, Long)].collect()
    assert(all.length === 3)
    // only (1,3) share 3 of 4 terms: cos² = 9/16 → 562500
    assert(strong.map(p => (p._1, p._2)).toSeq === Seq((1L, 3L)))
    assert(strong.head._4 === 562500L)
  }
}
