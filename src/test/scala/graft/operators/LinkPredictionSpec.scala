package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.graph.LinkPrediction

class LinkPredictionSpec extends AnyFunSuite with SparkSpec {

  test("scores distance-2 pairs; adjacent pairs are excluded") {
    import spark.implicits._
    // square 1–2–3–4–1: each diagonal pair shares BOTH its neighbors
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("a", "b")
    val got = LinkPrediction.jaccardCandidates(edges, "a", "b")
      .orderBy("u", "v").as[(Long, Long, Long, Long)].collect().toSeq
    // diagonals (1,3) and (2,4): cn=2, deg 2+2−2=2 → jaccard 1.0
    assert(got === Seq((1L, 3L, 2L, 1000000L), (2L, 4L, 2L, 1000000L)))
  }

  test("jaccard denominator is the neighborhood union") {
    import spark.implicits._
    // 1 and 2 share neighbor 3; 1 also has 4, 2 also has 5 — and 1–2
    // are NOT adjacent: cn=1, union = {3,4} ∪ {3,5} = 3 → 333333 ppm
    val edges = Seq((1L, 3L), (1L, 4L), (2L, 3L), (2L, 5L)).toDF("a", "b")
    val got = LinkPrediction.jaccardCandidates(edges, "a", "b")
      .where($"u" === 1L && $"v" === 2L)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 2L, 1L, 333333L)))
  }

  test("minCommon prunes and maxCenterDegree drops hub wedges") {
    import spark.implicits._
    // star center 9 with leaves 1..5, plus a chain 1–6–2 (center 6)
    val star = (1L to 5L).map(l => (9L, l))
    val edges = (star ++ Seq((1L, 6L), (6L, 2L))).toDF("a", "b")
    // uncapped: C(5,2)=10 leaf pairs through 9, plus (6,9) through
    // BOTH 1 and 2 — 11 candidates; (1,2) via two centers → cn=2
    val all = LinkPrediction.jaccardCandidates(edges, "a", "b")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(all.size === 11)
    assert(all.find(p => p._1 == 1L && p._2 == 2L).get._3 === 2L)
    // cap below the hub degree: center 9's wedges vanish, centers
    // 1/2/6 (degree ≤ 2) still produce theirs
    val capped = LinkPrediction
      .jaccardCandidates(edges, "a", "b", maxCenterDegree = Some(3L))
      .orderBy("u", "v").as[(Long, Long, Long, Long)].collect().toSeq
    assert(capped.map(p => (p._1, p._2)) === Seq((1L, 2L), (6L, 9L)))
    // (6,9): cn=2, union = 2+5−2 = 5 → 400000 ppm
    assert(capped.find(p => p._1 == 6L).get._4 === 400000L)
    // minCommon=2 keeps only the doubly-connected pairs
    val strong = LinkPrediction
      .jaccardCandidates(edges, "a", "b", minCommon = 2L)
      .orderBy("u", "v").as[(Long, Long, Long, Long)].collect().toSeq
    assert(strong.map(p => (p._1, p._2)) === Seq((1L, 2L), (6L, 9L)))
  }
}
