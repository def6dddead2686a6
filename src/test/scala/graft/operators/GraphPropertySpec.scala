package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.graph.{KCore, LinkPrediction}

/** Serial-reference property tests for the session's graph
  * operators: deterministic pseudo-random graphs, exact expected
  * values computed with textbook single-threaded algorithms. */
class GraphPropertySpec extends AnyFunSuite with SparkSpec {

  /** deterministic edge set: keep (a,b) when a LCG of the pair hits */
  private def randomEdges(n: Int, seed: Long, keepMod: Long) =
    for {
      a <- 1L to n.toLong; b <- 1L to n.toLong
      if a < b && ((a * 2654435761L + b * seed) & 0x7fffffff) % keepMod == 0
    } yield (a, b)

  /** textbook sequential peel: exact coreness per node */
  private def serialCoreness(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.Set[Long]]
    edges.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, scala.collection.mutable.Set.empty) += b
      adj.getOrElseUpdate(b, scala.collection.mutable.Set.empty) += a
    }
    val core = scala.collection.mutable.Map.empty[Long, Long]
    val deg = scala.collection.mutable.Map(adj.map { case (k, v) => k -> v.size.toLong }.toSeq: _*)
    val alive = scala.collection.mutable.Set(adj.keys.toSeq: _*)
    var k = 0L
    while (alive.nonEmpty) {
      val peel = alive.filter(n => deg(n) <= k)
      if (peel.isEmpty) k += 1
      else peel.foreach { n =>
        core(n) = k
        alive -= n
        adj(n).foreach { m => if (alive(m)) deg(m) -= 1 }
      }
    }
    core.toMap
  }

  test("iterated h-index converges to the exact peeled coreness") {
    import spark.implicits._
    for (seed <- Seq(3L, 17L, 101L)) {
      val edges = randomEdges(24, seed, 3)
      val got = KCore
        .corenessHIndex(edges.toDF("a", "b"), "a", "b", rounds = 12)
        .as[(Long, Long)].collect().toMap
      assert(got === serialCoreness(edges), s"seed $seed")
    }
  }

  test("link prediction equals the brute-force distance-2 scores") {
    import spark.implicits._
    for (seed <- Seq(7L, 41L)) {
      val edges = randomEdges(20, seed, 4)
      val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      val edgeSet = edges.toSet
      val want = (for {
        u <- adj.keys; v <- adj.keys
        if u < v && !edgeSet.contains((u, v))
        cn = (adj(u) & adj(v)).size.toLong if cn >= 1
      } yield ((u, v), (cn,
        1000000L * cn / (adj(u).size + adj(v).size - cn)))).toMap
      val got = LinkPrediction
        .jaccardCandidates(edges.toDF("a", "b"), "a", "b")
        .as[(Long, Long, Long, Long)].collect()
        .map(r => ((r._1, r._2), (r._3, r._4))).toMap
      assert(got === want, s"seed $seed")
    }
  }
}
