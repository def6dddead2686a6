package graft.operators

import graft.SparkSpec
import graft.graph.Sssp
import org.apache.spark.sql.functions._

/** BFS distances vs a serial reference, plus the semantic edges:
  * multi-source min, directedness, isolated sources at 0, the
  * maxHops cap, and unreachable-node omission. */
class SsspSpec extends SparkSpec {

  /** Serial level-synchronous BFS over a directed adjacency list. */
  private def serialBfs(edges: Seq[(Long, Long)], sources: Set[Long],
                        maxHops: Int): Map[Long, Long] = {
    val adj = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
    var dist = sources.map(_ -> 0L).toMap
    var frontier = sources
    var hop = 0L
    while (frontier.nonEmpty && hop < maxHops) {
      hop += 1
      val next = frontier.flatMap(n => adj.getOrElse(n, Seq.empty))
        .filterNot(dist.contains)
      dist ++= next.map(_ -> hop)
      frontier = next
    }
    dist
  }

  private def run(edges: Seq[(Long, Long)], sources: Seq[Long],
                  maxHops: Int): Map[Long, Long] = {
    import spark.implicits._
    Sssp.bfsDistances(edges.toDF("s", "d"), "s", "d",
        sources.toDF("src"), "src", maxHops)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("matches serial BFS on a branching digraph, randomized") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val n = 30
      val edges = Seq.fill(80)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val sources = Seq.fill(3)(rnd.nextInt(n).toLong).distinct
      val hops = 1 + rnd.nextInt(5)
      assert(run(edges, sources, hops) ===
        serialBfs(edges, sources.toSet, hops), s"trial $trial")
    }
  }

  test("multi-source takes the nearest seed; ties keep the min hop") {
    // 1 -> 2 -> 3 -> 4; sources {1, 4}: node 3 is 2 hops from 1,
    // node 4 is a source so stays at 0 (never relaxed to 3)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    assert(run(edges, Seq(1L, 4L), 10) ===
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 0L))
  }

  test("edges are directed; unreachable nodes are omitted") {
    val edges = Seq((1L, 2L), (3L, 2L)) // 3 only reaches 2, not vice versa
    assert(run(edges, Seq(1L), 10) === Map(1L -> 0L, 2L -> 1L))
  }

  test("isolated source appears at distance 0") {
    val edges = Seq((1L, 2L))
    assert(run(edges, Seq(99L), 5) === Map(99L -> 0L))
  }

  test("maxHops caps the expansion; early-converged loop matches full unroll") {
    val chain = (1L to 8L).sliding(2).map(p => (p(0), p(1))).toSeq
    assert(run(chain, Seq(1L), 3) ===
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
    // maxHops far beyond the diameter: identical to the exact answer
    assert(run(chain, Seq(1L), 100) ===
      (1L to 8L).map(i => i -> (i - 1)).toMap)
  }

  test("duplicate sources and duplicate edges collapse") {
    val edges = Seq((1L, 2L), (1L, 2L), (2L, 3L))
    assert(run(edges, Seq(1L, 1L, 1L), 10) ===
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("cycle terminates at the diameter, not maxHops") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    assert(run(edges, Seq(1L), 1000) ===
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  /** Serial Bellman-Ford capped at `rounds` relaxations: min-cost
    * walk using ≤ rounds edges — the weightedDistances contract. */
  private def serialBf(edges: Seq[(Long, Long, Long)], sources: Set[Long],
                       rounds: Int): Map[Long, Long] = {
    var dist = sources.map(_ -> 0L).toMap
    for (_ <- 1 to rounds) {
      val relaxed = edges.flatMap { case (s, d, w) =>
        dist.get(s).map(ds => d -> (ds + w)) }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1)
        .map { case (n, vs) => n -> vs.map(_._2).min }
    }
    dist
  }

  private def runW(edges: Seq[(Long, Long, Long)], sources: Seq[Long],
                   rounds: Int): Map[Long, Long] = {
    import spark.implicits._
    Sssp.weightedDistances(edges.toDF("s", "d", "w"), "s", "d", "w",
        sources.toDF("src"), "src", rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("weighted distances match serial Bellman-Ford, randomized") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val n = 25
      val edges = Seq.fill(70)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong,
          1L + rnd.nextInt(9)))
        .filter { case (a, b, _) => a != b }
      val sources = Seq.fill(2)(rnd.nextInt(n).toLong).distinct
      val rounds = 1 + rnd.nextInt(4)
      assert(runW(edges, sources, rounds) ===
        serialBf(edges, sources.toSet, rounds), s"trial $trial")
    }
  }

  test("a cheaper long way round beats the direct heavy edge") {
    // 1 -> 3 costs 10 direct, but 1 -> 2 -> 3 costs 2 + 3 = 5
    val edges = Seq((1L, 3L, 10L), (1L, 2L, 2L), (2L, 3L, 3L))
    assert(runW(edges, Seq(1L), 1) ===
      Map(1L -> 0L, 2L -> 2L, 3L -> 10L)) // one edge: direct only
    assert(runW(edges, Seq(1L), 2) ===
      Map(1L -> 0L, 2L -> 2L, 3L -> 5L))  // two edges: improved
  }

  test("parallel edges relax at the cheapest weight") {
    val edges = Seq((1L, 2L, 9L), (1L, 2L, 4L))
    assert(runW(edges, Seq(1L), 3) === Map(1L -> 0L, 2L -> 4L))
  }

  test("weighted early convergence equals the capped unroll") {
    val chain = Seq((1L, 2L, 5L), (2L, 3L, 5L))
    // converges after 2 rounds; 100 capped rounds must agree
    assert(runW(chain, Seq(1L), 100) === runW(chain, Seq(1L), 2))
  }

  private def runIncr(oldE: Seq[(Long, Long)], newE: Seq[(Long, Long)],
                      sources: Seq[Long], maxHops: Int): Map[Long, Long] = {
    import spark.implicits._
    val saved = Sssp.bfsDistances(oldE.toDF("s", "d"), "s", "d",
      sources.toDF("src"), "src", maxHops)
    Sssp.bfsDistancesIncremental(oldE.toDF("s", "d"), newE.toDF("s", "d"),
        "s", "d", saved, maxHops)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("incremental repair equals full recompute over the union, randomized") {
    val rnd = new scala.util.Random(99)
    for (trial <- 1 to 5) {
      val n = 25
      val all = Seq.fill(70)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }.distinct
      val (oldE, newE) = all.partition(_ => rnd.nextBoolean())
      val sources = Seq.fill(2)(rnd.nextInt(n).toLong).distinct
      val hops = 1 + rnd.nextInt(5)
      assert(runIncr(oldE, newE, sources, hops) ===
        run(all, sources, hops), s"trial $trial")
    }
  }

  test("a batch that improves nothing leaves the table unchanged") {
    val oldE = Seq((1L, 2L), (2L, 3L))
    val newE = Seq((1L, 3L)) // dist(3) already 2; 0+1+... no, 1->3 gives 1 < 2: improves!
    // use a truly non-improving edge instead: 3 -> 2 (2 already at 1)
    assert(runIncr(oldE, Seq((3L, 2L)), Seq(1L), 5) ===
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("a shortcut batch edge cascades improvements downstream") {
    // chain 1->2->3->4->5; new edge 1->4 improves 4 (3->1) and 5 (4->2)
    val oldE = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    assert(runIncr(oldE, Seq((1L, 4L)), Seq(1L), 10) ===
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 2L))
  }

  test("a batch edge unlocks nodes the saved run never reached") {
    val oldE = Seq((1L, 2L), (8L, 9L)) // 8-9 island unreached
    assert(runIncr(oldE, Seq((2L, 8L)), Seq(1L), 10) ===
      Map(1L -> 0L, 2L -> 1L, 8L -> 2L, 9L -> 3L))
  }

  test("incremental respects the hop cap") {
    val oldE = Seq((1L, 2L))
    // new chain extends beyond the cap: nodes past maxHops stay out
    assert(runIncr(oldE, Seq((2L, 3L), (3L, 4L)), Seq(1L), 2) ===
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  private def runDel(edges: Seq[(Long, Long)], delE: Seq[(Long, Long)],
                     sources: Seq[Long], maxHops: Int): Map[Long, Long] = {
    import spark.implicits._
    val saved = Sssp.bfsDistances(edges.toDF("s", "d"), "s", "d",
      sources.toDF("src"), "src", maxHops)
    Sssp.bfsDistancesDeleted(edges.toDF("s", "d"), delE.toDF("s", "d"),
        "s", "d", saved, maxHops)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("delete repair equals full recompute over the pruned graph, randomized") {
    val rnd = new scala.util.Random(123)
    for (trial <- 1 to 5) {
      val n = 25
      val all = Seq.fill(70)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }.distinct
      val delE = all.filter(_ => rnd.nextInt(4) == 0)
      val sources = Seq.fill(2)(rnd.nextInt(n).toLong).distinct
      val hops = 1 + rnd.nextInt(5)
      assert(runDel(all, delE, sources, hops) ===
        run(all.diff(delE), sources, hops), s"trial $trial")
    }
  }

  test("deleting a non-tight edge changes nothing") {
    // 1->2->3 plus the redundant long way 1->4->3: edge 4->3 reaches
    // 3 at dist 2 = its existing dist, so it is on no STRICTLY
    // shorter path... make it genuinely non-tight: 3 is at dist 2,
    // 4 at dist 1, so 4->3 IS tight (1+1=2). Use 2->4 instead
    // (d(4)=1 via 1->4, 1+1=2 != 1: non-tight).
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 4L), (4L, 3L), (2L, 4L))
    assert(runDel(edges, Seq((2L, 4L)), Seq(1L), 10) ===
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("deleting a bridge cuts the far side off entirely") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    assert(runDel(edges, Seq((2L, 3L)), Seq(1L), 10) ===
      Map(1L -> 0L, 2L -> 1L))
  }

  test("delete falls back to a longer surviving path") {
    // 1->2 direct plus detour 1->3->4->2: deleting 1->2 re-derives
    // 2 at dist 3 via the detour
    val edges = Seq((1L, 2L), (1L, 3L), (3L, 4L), (4L, 2L), (2L, 5L))
    assert(runDel(edges, Seq((1L, 2L)), Seq(1L), 10) ===
      Map(1L -> 0L, 3L -> 1L, 4L -> 2L, 2L -> 3L, 5L -> 4L))
  }

  test("delete repair respects the hop cap on the re-derived path") {
    // detour pushes node 2 past the cap: it must drop out
    val edges = Seq((1L, 2L), (1L, 3L), (3L, 4L), (4L, 2L))
    assert(runDel(edges, Seq((1L, 2L)), Seq(1L), 2) ===
      Map(1L -> 0L, 3L -> 1L, 4L -> 2L))
  }

  test("deleting an absent edge leaves the table unchanged") {
    val edges = Seq((1L, 2L), (2L, 3L))
    assert(runDel(edges, Seq((7L, 8L), (2L, 1L)), Seq(1L), 10) ===
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("an empty delete batch reproduces the saved table") {
    val edges = Seq((1L, 2L), (2L, 3L))
    assert(runDel(edges, Seq.empty, Seq(1L), 10) ===
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  /** Weighted incremental: saved table must be CONVERGED (the
    * contract), so the fixture runs weightedDistances far past the
    * relaxation depth and lets the signature stop it. */
  private def runWIncr(oldE: Seq[(Long, Long, Long)],
                       newE: Seq[(Long, Long, Long)],
                       sources: Seq[Long]): Map[Long, Long] = {
    import spark.implicits._
    val saved = Sssp.weightedDistances(oldE.toDF("s", "d", "w"),
      "s", "d", "w", sources.toDF("src"), "src", maxRounds = 64)
    Sssp.weightedDistancesIncremental(oldE.toDF("s", "d", "w"),
        newE.toDF("s", "d", "w"), "s", "d", "w", saved, maxRounds = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("weighted incremental repair equals converged recompute, randomized") {
    val rnd = new scala.util.Random(1234)
    for (trial <- 1 to 5) {
      val n = 25
      val all = Seq.fill(70)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong,
          1L + rnd.nextInt(9)))
        .filter { case (a, b, _) => a != b }.distinct
      val (oldE, newE) = all.partition(_ => rnd.nextBoolean())
      val sources = Seq.fill(2)(rnd.nextInt(n).toLong).distinct
      assert(runWIncr(oldE, newE, sources) ===
        runW(all, sources, 64), s"trial $trial")
    }
  }

  test("weighted batch: non-improving edge leaves the table unchanged") {
    val oldE = Seq((1L, 2L, 2L), (2L, 3L, 2L))
    // 1->3 at cost 9 never beats the existing 4
    assert(runWIncr(oldE, Seq((1L, 3L, 9L)), Seq(1L)) ===
      Map(1L -> 0L, 2L -> 2L, 3L -> 4L))
  }

  test("weighted batch: a cheap shortcut cascades improvements") {
    // chain 1->2->3->4 at cost 5 each; new 1->3 at 1 improves 3 and 4
    val oldE = Seq((1L, 2L, 5L), (2L, 3L, 5L), (3L, 4L, 5L))
    assert(runWIncr(oldE, Seq((1L, 3L, 1L)), Seq(1L)) ===
      Map(1L -> 0L, 2L -> 5L, 3L -> 1L, 4L -> 6L))
  }

  test("weighted batch: unlocks nodes the saved run never reached") {
    val oldE = Seq((1L, 2L, 3L), (8L, 9L, 2L)) // 8-9 island unreached
    assert(runWIncr(oldE, Seq((2L, 8L, 4L)), Seq(1L)) ===
      Map(1L -> 0L, 2L -> 3L, 8L -> 7L, 9L -> 9L))
  }

  test("weighted batch: parallel cheaper edge wins over the saved weight") {
    val oldE = Seq((1L, 2L, 9L))
    assert(runWIncr(oldE, Seq((1L, 2L, 4L)), Seq(1L)) ===
      Map(1L -> 0L, 2L -> 4L))
  }

  /** Weighted delete: saved table CONVERGED (the contract); deletion
    * is at the node-pair level (all parallel edges between the pair
    * go), so the reference recompute prunes by pair too. */
  private def runWDel(edges: Seq[(Long, Long, Long)],
                      delPairs: Seq[(Long, Long)],
                      sources: Seq[Long]): Map[Long, Long] = {
    import spark.implicits._
    val saved = Sssp.weightedDistances(edges.toDF("s", "d", "w"),
      "s", "d", "w", sources.toDF("src"), "src", maxRounds = 64)
    Sssp.weightedDistancesDeleted(edges.toDF("s", "d", "w"),
        delPairs.toDF("s", "d"), "s", "d", "w", saved, maxRounds = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("weighted delete repair equals converged recompute on the pruned graph, randomized") {
    val rnd = new scala.util.Random(31337)
    for (trial <- 1 to 5) {
      val n = 25
      val all = Seq.fill(70)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong,
          1L + rnd.nextInt(9)))
        .filter { case (a, b, _) => a != b }.distinct
      val delPairs = all.map(e => (e._1, e._2)).distinct
        .filter(_ => rnd.nextInt(4) == 0)
      val sources = Seq.fill(2)(rnd.nextInt(n).toLong).distinct
      val pruned = all.filterNot(e => delPairs.contains((e._1, e._2)))
      assert(runWDel(all, delPairs, sources) ===
        runW(pruned, sources, 64), s"trial $trial")
    }
  }

  test("weighted delete: bridge cut drops the far side") {
    val edges = Seq((1L, 2L, 2L), (2L, 3L, 3L), (3L, 4L, 1L))
    assert(runWDel(edges, Seq((2L, 3L)), Seq(1L)) ===
      Map(1L -> 0L, 2L -> 2L))
  }

  test("weighted delete: falls back to the heavier surviving path") {
    // direct 1->2 at 1; detour 1->3->2 at 4+4 = 8 survives
    val edges = Seq((1L, 2L, 1L), (1L, 3L, 4L), (3L, 2L, 4L), (2L, 5L, 1L))
    assert(runWDel(edges, Seq((1L, 2L)), Seq(1L)) ===
      Map(1L -> 0L, 3L -> 4L, 2L -> 8L, 5L -> 9L))
  }

  test("weighted delete: a pair retraction removes ALL parallel edges") {
    // both 1->2 edges (w 1 and w 7) go; only the 1->3->2 detour remains
    val edges = Seq((1L, 2L, 1L), (1L, 2L, 7L), (1L, 3L, 5L), (3L, 2L, 5L))
    assert(runWDel(edges, Seq((1L, 2L)), Seq(1L)) ===
      Map(1L -> 0L, 3L -> 5L, 2L -> 10L))
  }

  test("weighted delete: non-tight pair and absent pair change nothing") {
    // 4->3 carries cost 9 against 3's converged dist 4: on no shortest
    // path; (7, 8) is not in the graph at all
    val edges = Seq((1L, 2L, 2L), (2L, 3L, 2L), (1L, 4L, 1L), (4L, 3L, 9L))
    assert(runWDel(edges, Seq((4L, 3L), (7L, 8L)), Seq(1L)) ===
      Map(1L -> 0L, 2L -> 2L, 3L -> 4L, 4L -> 1L))
  }

  test("weighted delete: empty batch reproduces the saved table") {
    val edges = Seq((1L, 2L, 3L), (2L, 3L, 3L))
    assert(runWDel(edges, Seq.empty, Seq(1L)) ===
      Map(1L -> 0L, 2L -> 3L, 3L -> 6L))
  }

  test("weighted delete rejects non-positive weights") {
    import spark.implicits._
    val edges = Seq((1L, 2L, 0L), (2L, 3L, 2L)).toDF("s", "d", "w")
    val saved = Sssp.weightedDistances(edges, "s", "d", "w",
      Seq(1L).toDF("src"), "src", maxRounds = 8)
    val boom = intercept[IllegalArgumentException] {
      Sssp.weightedDistancesDeleted(edges, Seq((2L, 3L)).toDF("s", "d"),
        "s", "d", "w", saved, maxRounds = 8).count()
    }
    assert(boom.getMessage.contains("positive weights"))
  }

  private def runPerSource(edges: Seq[(Long, Long)], sources: Seq[Long],
                           maxHops: Int): Map[(Long, Long), Long] = {
    import spark.implicits._
    Sssp.bfsDistancesPerSource(edges.toDF("s", "d"), "s", "d",
        sources.toDF("src"), "src", maxHops)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
  }

  test("per-source distances match one serial BFS per pivot, randomized") {
    val rnd = new scala.util.Random(4242)
    for (trial <- 1 to 5) {
      val n = 25
      val edges = Seq.fill(60)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val sources = Seq.fill(3)(rnd.nextInt(n).toLong).distinct
      val hops = 1 + rnd.nextInt(5)
      val expected = sources.flatMap { s =>
        serialBfs(edges, Set(s), hops).map { case (v, d) => (s, v) -> d }
      }.toMap
      assert(runPerSource(edges, sources, hops) === expected, s"trial $trial")
    }
  }

  test("bitset centrality equals the tagged per-source reductions, randomized") {
    import org.apache.spark.sql.functions.{col, count, expr, lit, sum}
    val rnd = new scala.util.Random(555)
    for (trial <- 1 to 4) {
      val n = 30
      val edges = Seq.fill(70)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }.distinct
      val pivots = Seq.fill(2 + rnd.nextInt(6))(rnd.nextInt(n).toLong).distinct
      val hops = 1 + rnd.nextInt(5)
      import spark.implicits._
      val eDf = edges.toDF("s", "d")
      val pDf = pivots.toDF("src")
      val tagged = Sssp.bfsDistancesPerSource(eDf, "s", "d", pDf, "src", hops)
        .where(col("dist") > 0)
        .groupBy(col("node_id"))
        .agg(count(lit(1)).as("n_pivots"),
          sum(expr("1000000 div dist")).cast("long").as("harmonic_ppm"),
          expr("count(1) * 1000000 div sum(dist)").cast("long")
            .as("closeness_ppm"))
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      val bitset = Sssp.pivotCentralityBitset(eDf, "s", "d", pDf, "src", hops)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      assert(bitset === tagged, s"trial $trial hops $hops pivots $pivots")
    }
  }

  test("bitset centrality: pivot self-distance is excluded, 1024-pivot cap holds") {
    import spark.implicits._
    // triangle 1->2->3->1, pivots {1, 3}: node 2 is reached by 1 (d=1)
    // and 3 (d=2); pivot 1 is reached by 3 (d=1); pivot 3 by 1 (d=2)
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("s", "d")
    val got = Sssp.pivotCentralityBitset(e, "s", "d",
        Seq(1L, 3L).toDF("src"), "src", 10)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(2L) === ((2L, 1500000L, (2L * 1000000) / 3)))
    assert(got(1L) === ((1L, 1000000L, 1000000L)))
    assert(got(3L) === ((1L, 500000L, 500000L)))
    val boom = intercept[IllegalArgumentException] {
      Sssp.pivotCentralityBitset(e, "s", "d",
        (1L to 1025L).toDF("src"), "src", 2).count()
    }
    assert(boom.getMessage.contains("1..1024"))
  }

  test("bitset centrality past 64 pivots: k=128 equals the tagged form") {
    // production pivot counts are 256–1024; the mask generalizes to
    // ⌈k/64⌉ word columns. Prove word-boundary handling at k=128
    // (2 full words) and k=70 (partial second word) against the
    // tagged per-source reductions on a graph where every pivot
    // reaches most nodes.
    import org.apache.spark.sql.functions.{col, count, expr, lit, sum}
    import spark.implicits._
    val rnd = new scala.util.Random(808)
    val n = 160
    val ring = (0 until n).map(i => (i.toLong, ((i + 1) % n).toLong))
    val chords = Seq.fill(240)(
      (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    val edges = (ring ++ chords).distinct
    val eDf = edges.toDF("s", "d")
    for (k <- Seq(70, 128)) {
      val pivots = rnd.shuffle((0 until n).toList).take(k).map(_.toLong)
      val pDf = pivots.toDF("src")
      val hops = 4
      val tagged = Sssp.bfsDistancesPerSource(eDf, "s", "d", pDf, "src", hops)
        .where(col("dist") > 0)
        .groupBy(col("node_id"))
        .agg(count(lit(1)).as("n_pivots"),
          sum(expr("1000000 div dist")).cast("long").as("harmonic_ppm"),
          expr("count(1) * 1000000 div sum(dist)").cast("long")
            .as("closeness_ppm"))
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      val bitset = Sssp.pivotCentralityBitset(eDf, "s", "d", pDf, "src", hops)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      assert(bitset === tagged, s"k=$k")
    }
  }

  test("per-source keeps overlapping reaches separate, unlike bfsDistances") {
    // 1 and 3 both reach 2: bfsDistances would collapse to min; the
    // tagged run keeps one row per pivot
    val edges = Seq((1L, 2L), (3L, 2L), (2L, 4L))
    assert(runPerSource(edges, Seq(1L, 3L), 4) ===
      Map((1L, 1L) -> 0L, (3L, 3L) -> 0L, (1L, 2L) -> 1L, (3L, 2L) -> 1L,
        (1L, 4L) -> 2L, (3L, 4L) -> 2L))
  }
}
