package graft.operators

import graft.SparkSpec
import graft.graph.KTruss

/** k-truss vs a serial support-and-peel reference, plus the semantic
  * corners: peel cascades, the k-core/k-truss distinction, k = 2
  * degeneration, early stop ≡ capped unroll. */
class KTrussSpec extends SparkSpec {

  import spark.implicits._

  private def serial(edges: Seq[(Long, Long)], k: Int,
                     maxRounds: Int): Set[(Long, Long)] = {
    var e = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }.toSet
    var round = 0
    var changed = true
    while (changed && round < maxRounds) {
      round += 1
      def adj(n: Long) = e.collect {
        case (a, b) if a == n => b
        case (a, b) if b == n => a
      }
      val next = e.filter { case (u, v) =>
        (adj(u) intersect adj(v)).size >= k - 2
      }
      changed = next != e
      e = next
    }
    e
  }

  private def run(edges: Seq[(Long, Long)], k: Int,
                  maxRounds: Int): Set[(Long, Long)] =
    KTruss.kTruss(edges.toDF("a", "b"), "a", "b", k, maxRounds)
      .as[(Long, Long)].collect().toSet

  test("a clique survives, its pendant edges peel") {
    // K4 on 1..4 plus pendant 4-5: every K4 edge has support 2,
    // the pendant has 0 — 4-truss = the K4
    val k4 = for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)
    val edges = k4 :+ ((4L, 5L))
    assert(run(edges, 4, 8) === k4.toSet)
  }

  test("peeling cascades: losing one edge collapses the chain") {
    // two triangles sharing edge (2,3): each edge has support 1,
    // except (2,3) with support 2 — the 4-truss peel removes the
    // outer edges first, then (2,3) loses its support and goes too
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(run(edges, 4, 8) === Set.empty)
    // the 3-truss (support >= 1) keeps everything: every edge is in
    // at least one triangle
    assert(run(edges, 3, 8) === edges.toSet)
  }

  test("k = 2 keeps every edge") {
    val edges = Seq((1L, 2L), (3L, 4L), (2L, 3L))
    assert(run(edges, 2, 4) === edges.toSet)
  }

  test("a 4-cycle is a 2-core but has no 3-truss") {
    // the classic truss-vs-core separation: every node has degree 2
    // but no edge closes a triangle
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    assert(run(edges, 3, 4) === Set.empty)
  }

  test("early stop equals the capped unroll; cap bites identically") {
    val rnd = new scala.util.Random(901)
    val n = 14
    val edges = Seq.fill(50)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }.distinct
    // generous cap: fixpoint well inside — adaptive loop ≡ unroll
    assert(run(edges, 4, 20) === serial(edges, 4, 20))
    // tight cap: both sides stop mid-peel at the same round
    assert(run(edges, 4, 1) === serial(edges, 4, 1))
    assert(run(edges, 4, 2) === serial(edges, 4, 2))
  }

  private def serialTrussness(edges: Seq[(Long, Long)], maxK: Int,
                              maxRounds: Int): Map[(Long, Long), Long] = {
    val canon = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }.distinct
    val t = scala.collection.mutable.Map[(Long, Long), Long]()
    canon.foreach(e => t(e) = 2L)
    var cur = canon.toSet
    for (k <- 3 to maxK) {
      cur = serial(cur.toSeq, k, maxRounds)
      cur.foreach(e => t(e) = k.toLong)
    }
    t.toMap
  }

  test("trussness equals the nested serial peel, cliques grade by size") {
    // K4 ∪ shared-edge triangle ∪ pendant: K4 edges truss 4, the
    // triangle's 3, the pendant 2
    val k4 = for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)
    val edges = k4 ++ Seq((4L, 5L), (4L, 6L), (5L, 6L), (6L, 7L))
    val got = KTruss.trussness(edges.toDF("a", "b"), "a", "b",
        maxK = 6, maxRounds = 8)
      .as[(Long, Long, Long)].collect()
      .map { case (u, v, t) => (u, v) -> t }.toMap
    assert(got === serialTrussness(edges, 6, 8))
    assert(k4.forall(e => got(e) === 4L))
    assert(got((4L, 5L)) === 3L && got((5L, 6L)) === 3L)
    assert(got((6L, 7L)) === 2L)
  }

  test("trussness matches the nested serial peel on randomized graphs") {
    val rnd = new scala.util.Random(515)
    for (trial <- 1 to 3) {
      val n = 12
      val edges = Seq.fill(45)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }.distinct
      val got = KTruss.trussness(edges.toDF("a", "b"), "a", "b",
          maxK = 7, maxRounds = 10)
        .as[(Long, Long, Long)].collect()
        .map { case (u, v, t) => (u, v) -> t }.toMap
      assert(got === serialTrussness(edges, 7, 10), s"trial $trial")
    }
  }

  /** Run the incremental repair from a saved kTruss over `oldE` with
    * `newE` arriving as the batch; compare to a full recompute. */
  private def incrEqualsFull(oldE: Seq[(Long, Long)],
                             newE: Seq[(Long, Long)], k: Int,
                             clue: String): Unit = {
    val saved = KTruss.kTruss(oldE.toDF("a", "b"), "a", "b", k,
      maxRounds = 16)
    val got = KTruss.kTrussIncremental(oldE.toDF("a", "b"),
        newE.toDF("a", "b"), "a", "b", saved, k,
        maxExpandRounds = 16, maxPeelRounds = 16)
      .as[(Long, Long)].collect().toSet
    assert(got === serial(oldE ++ newE, k, 16), clue)
  }

  test("incremental repair: a batch edge completes a clique") {
    // K4 minus edge (1,2): nothing survives the 4-truss peel; the
    // batch adds (1,2), the whole K4 must come back — every revived
    // edge was PEELED in the old graph (the cascade-revival shape)
    val old = (for { a <- 1L to 4L; b <- 1L to 4L if a < b }
      yield (a, b)).filterNot(_ == (1L, 2L))
    incrEqualsFull(old, Seq((1L, 2L)), k = 4, "clique completion")
  }

  test("incremental repair: revival cascades beyond the batch's triangles") {
    // two K4s sharing edge (3,4), each missing one edge: the batch
    // completes only the FIRST K4, whose revival restores (3,4)'s
    // support but not the second K4's missing edge — region expansion
    // must cross into the first clique and stop there
    val k4a = for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)
    val k4b = for { a <- 3L to 6L; b <- 3L to 6L if a < b } yield (a, b)
    val old = (k4a ++ k4b).distinct
      .filterNot(e => e == (1L, 2L) || e == (5L, 6L))
    val saved = KTruss.kTruss(old.toDF("a", "b"), "a", "b", 4, 16)
    assert(saved.count() === 0)
    incrEqualsFull(old, Seq((1L, 2L)), k = 4, "partial cascade")
  }

  test("expansion budget exhaustion falls back to the full region") {
    // the cascade construct needs ≥ 2 expansion rounds; a 1-round
    // budget must fall back to peeled ∪ batch and still land on the
    // exact truss (the fallback is a sound over-approximation)
    val k4a = for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)
    val k4b = for { a <- 3L to 6L; b <- 3L to 6L if a < b } yield (a, b)
    val old = (k4a ++ k4b).distinct
      .filterNot(e => e == (1L, 2L) || e == (5L, 6L))
    val saved = KTruss.kTruss(old.toDF("a", "b"), "a", "b", 4, 16)
    val got = KTruss.kTrussIncremental(old.toDF("a", "b"),
        Seq((1L, 2L)).toDF("a", "b"), "a", "b", saved, 4,
        maxExpandRounds = 1, maxPeelRounds = 16)
      .as[(Long, Long)].collect().toSet
    assert(got === serial(old :+ ((1L, 2L)), 4, 16))
  }

  test("fallback raises the peel bound to the region size " +
      "(region-tuned maxPeelRounds must not throw)") {
    // a triangle staircase peels one rung per round at k = 4, so the
    // full-region peel needs ~n rounds; with the expansion budget
    // forced to fall back AND maxPeelRounds = 1 (a caller budget
    // tuned for a small region), the repair must still complete via
    // the region-size bound instead of throwing on the documented
    // graceful path
    val stairs = (1L to 8L).sliding(3).flatMap { w =>
      Seq((w(0), w(1)), (w(0), w(2)), (w(1), w(2)))
    }.toSeq.distinct
    val old = stairs.filterNot(_ == ((1L, 2L)))
    val saved = KTruss.kTruss(old.toDF("a", "b"), "a", "b", 4, 32)
    val got = KTruss.kTrussIncremental(old.toDF("a", "b"),
        Seq((1L, 2L)).toDF("a", "b"), "a", "b", saved, 4,
        maxExpandRounds = 1, maxPeelRounds = 1)
      .as[(Long, Long)].collect().toSet
    assert(got === serial(old :+ ((1L, 2L)), 4, 32))
  }

  test("incremental repair: empty and duplicate batches are no-ops") {
    val k4 = for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)
    val old = k4 :+ ((4L, 5L))
    incrEqualsFull(old, Seq.empty, k = 4, "empty batch")
    incrEqualsFull(old, old.take(3), k = 4, "duplicate batch")
  }

  test("incremental repair equals full recompute on randomized splits") {
    val rnd = new scala.util.Random(37)
    for (trial <- 1 to 4) {
      val n = 10
      val edges = Seq.fill(40)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      val (oldE, newE) = edges.partition(_ => rnd.nextInt(4) > 0)
      incrEqualsFull(oldE, newE, k = 3 + rnd.nextInt(2), s"trial $trial")
    }
  }

  /** Run the delete repair from a saved kTruss over `oldE` with
    * `delE` retracted; compare to a full recompute on the pruned
    * graph. */
  private def delEqualsFull(oldE: Seq[(Long, Long)],
                            delE: Seq[(Long, Long)], k: Int,
                            clue: String,
                            maxExpand: Int = 16): Unit = {
    val saved = KTruss.kTruss(oldE.toDF("a", "b"), "a", "b", k,
      maxRounds = 16)
    val got = KTruss.kTrussDeleted(oldE.toDF("a", "b"),
        delE.toDF("a", "b"), "a", "b", saved, k,
        maxExpandRounds = maxExpand, maxPeelRounds = 16)
      .as[(Long, Long)].collect().toSet
    val delSet = delE.map { case (a, b) =>
      (math.min(a, b), math.max(a, b)) }.toSet
    assert(got === serial(oldE.filterNot(delSet), k, 16), clue)
  }

  test("delete repair: retracting a clique edge collapses the truss") {
    // K4 + pendant: the 4-truss is the K4; deleting one K4 edge
    // drops every K4 edge's support below 2 — full cascade to empty
    val k4 = for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)
    delEqualsFull(k4 :+ ((4L, 5L)), Seq((1L, 2L)), k = 4, "collapse")
  }

  test("delete repair: the cascade stops at a reinforced core") {
    // two K4s sharing edge (3,4) plus edge (1,5)-(2,6)? keep simple:
    // a K5 with a pendant K4 sharing edge (4,5): deleting a K4-only
    // edge must collapse the K4's private edges but leave the K5
    // (each K5 edge has support 3 within the K5) intact
    val k5 = for { a <- 1L to 5L; b <- 1L to 5L if a < b } yield (a, b)
    val k4 = for { a <- 4L to 7L; b <- 4L to 7L if a < b } yield (a, b)
    val g = (k5 ++ k4).distinct
    delEqualsFull(g, Seq((6L, 7L)), k = 4, "reinforced core survives")
  }

  test("delete repair: non-truss and absent deletions are no-ops") {
    val k4 = for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)
    val g = k4 :+ ((4L, 5L))
    delEqualsFull(g, Seq((4L, 5L)), k = 4, "non-truss deletion")
    delEqualsFull(g, Seq((8L, 9L)), k = 4, "absent deletion")
    delEqualsFull(g, Seq.empty, k = 4, "empty batch")
  }

  test("delete repair: expansion budget exhaustion falls back soundly") {
    val k4 = for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)
    delEqualsFull(k4 :+ ((4L, 5L)), Seq((1L, 2L)), k = 4,
      "fallback", maxExpand = 1)
  }

  test("delete repair equals full recompute on randomized splits") {
    val rnd = new scala.util.Random(43)
    for (trial <- 1 to 4) {
      val n = 10
      val edges = Seq.fill(42)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      val delE = edges.filter(_ => rnd.nextInt(5) == 0)
      delEqualsFull(edges, delE, k = 3 + rnd.nextInt(2), s"trial $trial")
    }
  }

  test("incremental trussness equals the cold decomposition") {
    // the two-K4 construct: the batch completes the first K4 and
    // lifts the shared edge's level, leaving the second K4 partial
    val k4a = for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)
    val k4b = for { a <- 3L to 6L; b <- 3L to 6L if a < b } yield (a, b)
    val old = (k4a ++ k4b).distinct
      .filterNot(e => e == (1L, 2L) || e == (5L, 6L))
    val saved = KTruss.trussness(old.toDF("a", "b"), "a", "b",
      maxK = 5, maxRounds = 16)
    val got = KTruss.trussnessIncremental(old.toDF("a", "b"),
        Seq((1L, 2L)).toDF("a", "b"), "a", "b", saved, maxK = 5,
        maxExpandRounds = 16, maxPeelRounds = 16)
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got === serialTrussness(old :+ ((1L, 2L)), 5, 16))
  }

  test("incremental trussness equals the cold decomposition, randomized") {
    val rnd = new scala.util.Random(41)
    for (trial <- 1 to 3) {
      val n = 9
      val edges = Seq.fill(34)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      val (oldE, newE) = edges.partition(_ => rnd.nextInt(4) > 0)
      val saved = KTruss.trussness(oldE.toDF("a", "b"), "a", "b",
        maxK = 5, maxRounds = 16)
      val got = KTruss.trussnessIncremental(oldE.toDF("a", "b"),
          newE.toDF("a", "b"), "a", "b", saved, maxK = 5,
          maxExpandRounds = 16, maxPeelRounds = 16)
        .as[(Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      assert(got === serialTrussness(oldE ++ newE, 5, 16),
        s"trial $trial")
    }
  }

  test("deleted trussness equals the cold decomposition") {
    // retracting a K4 edge collapses its level-4 slice while the
    // second K4's slice is independently untouched
    val k4a = for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)
    val k4b = for { a <- 5L to 8L; b <- 5L to 8L if a < b } yield (a, b)
    val old = (k4a ++ k4b :+ ((4L, 5L))).distinct
    val saved = KTruss.trussness(old.toDF("a", "b"), "a", "b",
      maxK = 5, maxRounds = 16)
    val got = KTruss.trussnessDeleted(old.toDF("a", "b"),
        Seq((1L, 2L)).toDF("a", "b"), "a", "b", saved, maxK = 5,
        maxExpandRounds = 16, maxPeelRounds = 16)
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got === serialTrussness(old.filterNot(_ == ((1L, 2L))), 5, 16))
  }

  test("deleted trussness equals the cold decomposition, randomized") {
    val rnd = new scala.util.Random(47)
    for (trial <- 1 to 3) {
      val n = 9
      val edges = Seq.fill(34)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      val (kept, dropped) = edges.partition(_ => rnd.nextInt(4) > 0)
      if (dropped.nonEmpty) {
        val saved = KTruss.trussness(edges.toDF("a", "b"), "a", "b",
          maxK = 5, maxRounds = 16)
        val got = KTruss.trussnessDeleted(edges.toDF("a", "b"),
            dropped.toDF("a", "b"), "a", "b", saved, maxK = 5,
            maxExpandRounds = 16, maxPeelRounds = 16)
          .as[(Long, Long, Long)].collect()
          .map(r => (r._1, r._2) -> r._3).toMap
        assert(got === serialTrussness(kept, 5, 16), s"trial $trial")
      }
    }
  }

  test("matches the serial reference on randomized graphs") {
    val rnd = new scala.util.Random(424)
    for (trial <- 1 to 4) {
      val n = 12 + rnd.nextInt(6)
      val edges = Seq.fill(60)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }.distinct
      val k = 3 + rnd.nextInt(3)
      assert(run(edges, k, 12) === serial(edges, k, 12),
        s"trial $trial k=$k")
    }
  }
}
