package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.graph.PageRank

class PageRankSpec extends AnyFunSuite with SparkSpec {

  test("one iteration matches hand-computed fixed-point values") {
    import spark.implicits._
    // path graph 1–2–3, undirected
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
      .toDF("src", "dst")
    val got = PageRank.pageRank(edges, "src", "dst", iters = 1)
      .orderBy("node_id").as[(Long, Long)].collect().toSeq
    // contribs: 1→2 full 1e6; 2 splits 5e5 each way; 3→2 full 1e6
    // p1(1) = 150000 + 850000·500000/1e6  = 575000
    // p1(2) = 150000 + 850000·2000000/1e6 = 1850000
    // p1(3) = 575000
    assert(got === Seq((1L, 575000L), (2L, 1850000L), (3L, 575000L)))
  }

  test("rank is deterministic across partitionings") {
    import spark.implicits._
    val edges = (1L to 40L).flatMap(i =>
      Seq((i, i % 40 + 1), (i % 40 + 1, i))).toDF("src", "dst")
    val a = PageRank.pageRank(edges.repartition(1), "src", "dst", 3)
      .orderBy("node_id").as[(Long, Long)].collect().toSeq
    val b = PageRank.pageRank(edges.repartition(7), "src", "dst", 3)
      .orderBy("node_id").as[(Long, Long)].collect().toSeq
    assert(a === b)
    // ring graph: symmetry ⇒ all ranks equal
    assert(a.map(_._2).distinct.size === 1)
  }

  test("a hub outranks leaves") {
    import spark.implicits._
    val star = (2L to 6L).flatMap(i => Seq((1L, i), (i, 1L)))
      .toDF("src", "dst")
    val pr = PageRank.pageRank(star, "src", "dst", 3)
      .orderBy("node_id").as[(Long, Long)].collect().toMap
    assert(pr(1L) > pr(2L))
    assert((2L to 6L).map(pr).distinct.size === 1)
  }

  test("resume over an unchanged graph continues the cold trajectory") {
    import spark.implicits._
    // the trajectory-exact contract: resume(g, pr(g, i), j) = pr(g, i+j)
    val rnd = new scala.util.Random(31)
    for (trial <- 1 to 3) {
      val n = 12
      val edges = Seq.fill(40)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
        .toDF("src", "dst")
      val i = 1 + rnd.nextInt(3)
      val j = 1 + rnd.nextInt(3)
      val saved = PageRank.pageRank(edges, "src", "dst", iters = i)
      val warm = PageRank.pageRankResume(edges, "src", "dst", saved, iters = j)
        .orderBy("node_id").as[(Long, Long)].collect().toSeq
      val cold = PageRank.pageRank(edges, "src", "dst", iters = i + j)
        .orderBy("node_id").as[(Long, Long)].collect().toSeq
      assert(warm === cold, s"trial $trial (i=$i, j=$j)")
    }
  }

  test("resume with an empty saved vector is a cold start") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
      .toDF("src", "dst")
    val empty = Seq.empty[(Long, Long)].toDF("node_id", "pr_ppm")
    val warm = PageRank.pageRankResume(edges, "src", "dst", empty, iters = 2)
      .orderBy("node_id").as[(Long, Long)].collect().toSeq
    val cold = PageRank.pageRank(edges, "src", "dst", iters = 2)
      .orderBy("node_id").as[(Long, Long)].collect().toSeq
    assert(warm === cold)
  }

  test("batch-new nodes seed at the uniform init: hand-computed round") {
    import spark.implicits._
    // path 1–2–3; saved covers only {1, 2} (node 3 arrives with the
    // batch), so pr0 = (575000, 1850000, 1000000)
    // contribs: 1→2: 575000; 2→{1,3}: 925000 each; 3→2: 1000000
    // p(1) = 150000 + ⌊.85·925000⌋  = 936250
    // p(2) = 150000 + ⌊.85·1575000⌋ = 1488750
    // p(3) = 150000 + ⌊.85·925000⌋  = 936250
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
      .toDF("src", "dst")
    val saved = Seq((1L, 575000L), (2L, 1850000L)).toDF("node_id", "pr_ppm")
    val got = PageRank.pageRankResume(edges, "src", "dst", saved, iters = 1)
      .orderBy("node_id").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 936250L), (2L, 1488750L), (3L, 936250L)))
  }

  test("resume over a pruned graph drops vanished nodes: hand-computed") {
    import spark.implicits._
    // saved over path 1–2–3 (one cold round); resume after pruning
    // every edge touching 3: nodes = {1, 2}, node 3 leaves the table
    // contribs: 1→2: 575000 whole; 2→1: 1850000 whole
    // p(1) = 150000 + ⌊.85·1850000⌋ = 1722500
    // p(2) = 150000 + ⌊.85·575000⌋  =  638750
    val pruned = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val saved = Seq((1L, 575000L), (2L, 1850000L), (3L, 575000L))
      .toDF("node_id", "pr_ppm")
    val got = PageRank.pageRankResume(pruned, "src", "dst", saved, iters = 1)
      .orderBy("node_id").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 1722500L), (2L, 638750L)))
  }

  test("personalized restart matches hand-computed seed fixed point") {
    import spark.implicits._
    // path 1–2–3, seed {1}: p0 = (1e6, 0, 0)
    // round 1: contribs 1→2: 1e6; 2→{1,3}: 0; 3→2: 0
    //   p1(1) = 850000 + 850000·0 = 850000? base = 150000 for seed:
    //   p1(1) = 150000 + 0 = 150000; p1(2) = 0 + 850000·1e6/1e6 = 850000
    //   p1(3) = 0
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
      .toDF("src", "dst")
    val seeds = Seq(Tuple1(1L)).toDF("node")
    val got = PageRank.personalizedPageRank(edges, "src", "dst", seeds,
        iters = 1)
      .orderBy("node_id").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 150000L), (2L, 850000L), (3L, 0L)))
  }

  test("personalized rank concentrates near the seed") {
    import spark.implicits._
    // two triangles bridged by one edge; seed in the left triangle
    val sym = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L),
      (4L, 5L), (5L, 6L), (4L, 6L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("src", "dst")
    val pr = PageRank.personalizedPageRank(sym, "src", "dst",
        Seq(Tuple1(1L)).toDF("node"), iters = 3)
      .as[(Long, Long)].collect().toMap
    // every left-triangle node outranks every right-triangle node
    assert(Seq(1L, 2L, 3L).map(pr).min > Seq(5L, 6L).map(pr).max)
    // and the seeded graph is NOT the uniform ranking
    val uniform = PageRank.pageRank(sym, "src", "dst", 3)
      .as[(Long, Long)].collect().toMap
    assert(pr(1L).toDouble / pr(6L).max(1L) >
      uniform(1L).toDouble / uniform(6L))
  }

  test("personalized resume continues the cold trajectory and seeds " +
      "new nodes cold") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val edges = (0 until 60)
      .map(_ => (rnd.nextInt(15).toLong, rnd.nextInt(15).toLong))
      .filter { case (a, b) => a != b }.distinct.toDF("src", "dst")
    val seeds = Seq(1L, 7L).map(Tuple1(_)).toDF("node")
    // trajectory identity: resume(g, ppr(g, 2), 1) = ppr(g, 3)
    val saved = PageRank.personalizedPageRank(edges, "src", "dst",
      seeds, iters = 2)
    val warm = PageRank.personalizedPageRankResume(edges, "src", "dst",
        seeds, saved, iters = 1)
      .orderBy("node_id").as[(Long, Long)].collect().toSeq
    val cold = PageRank.personalizedPageRank(edges, "src", "dst",
        seeds, iters = 3)
      .orderBy("node_id").as[(Long, Long)].collect().toSeq
    assert(warm === cold)
    // batch-new nodes seed at the cold init: extending the artifact
    // with the cold values for the new nodes changes nothing
    val grown = edges.union(Seq((99L, 1L), (1L, 99L)).toDF("src", "dst"))
    val w1 = PageRank.personalizedPageRankResume(grown, "src", "dst",
        seeds, saved, iters = 1)
      .orderBy("node_id").as[(Long, Long)].collect().toSeq
    val extended = saved.unionByName(
      Seq((99L, 0L)).toDF("node_id", "pr_ppm"))
    val w2 = PageRank.personalizedPageRankResume(grown, "src", "dst",
        seeds, extended, iters = 1)
      .orderBy("node_id").as[(Long, Long)].collect().toSeq
    assert(w1 === w2)
  }

  test("forced wide (DECIMAL) arithmetic matches the long path exactly") {
    import spark.implicits._
    val edges = (1L to 40L).flatMap(i =>
      Seq((i, i % 40 + 1), (i % 40 + 1, i))).toDF("src", "dst")
    val narrow = PageRank.pageRank(edges, "src", "dst", 3,
      wide = Some(false)).orderBy("node_id").as[(Long, Long)].collect().toSeq
    val wide = PageRank.pageRank(edges, "src", "dst", 3,
      wide = Some(true)).orderBy("node_id").as[(Long, Long)].collect().toSeq
    assert(wide === narrow)
  }

  test("weighted resume over an unchanged graph continues the cold " +
      "trajectory") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val edges = Seq.fill(50)((rnd.nextInt(12).toLong, rnd.nextInt(12).toLong,
        1L + rnd.nextInt(5)))
      .filter { case (a, b, _) => a != b }
      .flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }.distinct
      .toDF("src", "dst", "w")
    val saved = PageRank.pageRankWeighted(edges, "src", "dst", "w",
      iters = 2)
    val warm = PageRank.pageRankWeightedResume(edges, "src", "dst", "w",
        saved, iters = 1)
      .orderBy("node_id").as[(Long, Long)].collect().toSeq
    val cold = PageRank.pageRankWeighted(edges, "src", "dst", "w",
        iters = 3)
      .orderBy("node_id").as[(Long, Long)].collect().toSeq
    assert(warm === cold)
    // batch-new nodes seed at the uniform init: extending the artifact
    // with SCALE rows for the new nodes changes nothing
    val grown = edges.union(Seq((99L, 1L, 2L), (1L, 99L, 2L))
      .toDF("src", "dst", "w"))
    val w1 = PageRank.pageRankWeightedResume(grown, "src", "dst", "w",
        saved, iters = 1)
      .orderBy("node_id").as[(Long, Long)].collect().toSeq
    val w2 = PageRank.pageRankWeightedResume(grown, "src", "dst", "w",
        saved.unionByName(Seq((99L, 1000000L)).toDF("node_id", "pr_ppm")),
        iters = 1)
      .orderBy("node_id").as[(Long, Long)].collect().toSeq
    assert(w1 === w2)
  }

  test("weighted personalized resume continues the cold trajectory " +
      "and pins the seed base") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val edges = Seq.fill(60)((rnd.nextInt(14).toLong, rnd.nextInt(14).toLong,
        1L + rnd.nextInt(4)))
      .filter { case (a, b, _) => a != b }
      .flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }.distinct
      .toDF("src", "dst", "w")
    val seeds = Seq(0L, 3L, 7L).toDF("node")
    val saved = PageRank.personalizedPageRankWeighted(edges, "src", "dst",
      "w", seeds, iters = 2)
    val warm = PageRank.personalizedPageRankWeightedResume(edges, "src",
        "dst", "w", seeds, saved, iters = 1)
      .orderBy("node_id").as[(Long, Long)].collect().toSeq
    val cold = PageRank.personalizedPageRankWeighted(edges, "src", "dst",
        "w", seeds, iters = 3)
      .orderBy("node_id").as[(Long, Long)].collect().toSeq
    assert(warm === cold)
    // a non-seed node with no seed-reachable mass holds rank 0; the
    // seeds' restart base is always present
    val ranks = cold.toMap
    Seq(0L, 3L, 7L).foreach(s =>
      assert(ranks.get(s).forall(_ >= 150000L), s"seed $s base"))
    spark.catalog.clearCache()
  }

  test("weighted forced wide (DECIMAL) arithmetic matches the long " +
      "path exactly") {
    import spark.implicits._
    val edges = (1L to 30L).flatMap(i =>
      Seq((i, i % 30 + 1, 1L + i % 4), (i % 30 + 1, i, 1L + i % 4)))
      .toDF("src", "dst", "w")
    val narrow = PageRank.pageRankWeighted(edges, "src", "dst", "w", 3,
        wide = Some(false))
      .orderBy("node_id").as[(Long, Long)].collect().toSeq
    val wide = PageRank.pageRankWeighted(edges, "src", "dst", "w", 3,
        wide = Some(true))
      .orderBy("node_id").as[(Long, Long)].collect().toSeq
    assert(wide === narrow)
  }

  test("weighted auto-probe widens when pr·w overflows a long and " +
      "stays exact") {
    import spark.implicits._
    // edge 1→0 carries w = 10¹³: the narrow per-edge multiply
    // pr·w = 10⁶·10¹³ = 10¹⁹ > Long.Max would wrap, and the probe
    // (max(w)·SCALE pushes safeNodes to 0 < node count) must route
    // the round through DECIMAL and land the exact fixed point:
    //   contrib 1→0 = ⌊10⁶·10¹³ / 10¹³⌋ = 10⁶ (wsum(1) = w)
    //   pr(0) = 150000 + ⌊.85·(10⁶ + 9·10⁶)⌋ = 8650000
    //   pr(1) = 150000 + ⌊.85·10⁶⌋ = 1000000 (0→1); pr(i≥2) = 150000
    val big = 10000000000000L
    val edges = (Seq((1L, 0L, big), (0L, 1L, 1L)) ++
        (2L to 10L).map(i => (i, 0L, 1L)))
      .toDF("src", "dst", "w")
    val got = PageRank.pageRankWeighted(edges, "src", "dst", "w",
        iters = 1)
      .where($"node_id".isin(0L, 1L, 2L))
      .orderBy("node_id").as[(Long, Long)].collect().toSeq
    assert(got === Seq((0L, 8650000L), (1L, 1000000L), (2L, 150000L)))
  }

  test("auto-probe widens past the long overflow bound and stays exact") {
    // 12M leaves → one hub: round-1 mass into the hub is 1.2e13 ppm,
    // so damping·s = 8.5e5 · 1.2e13 ≈ 1.02e19 > Long.Max — long
    // arithmetic would wrap (or throw under ANSI); the probe
    // (12,000,001 nodes > Long.Max/(850000·1e6) ≈ 1.085e7) must pick
    // DECIMAL and reproduce the hand-computed fixed point:
    //   pr(hub)  = 150000 + (850000 · 12e6·1e6) div 1e6 = 10_200_000_150_000
    //   pr(1)    = 150000 + 850000·1e6 div 1e6          = 1_000_000 (hub→1)
    //   pr(i>1)  = 150000                                (no in-edges)
    import org.apache.spark.sql.functions.{col, lit}
    val m = 12000000L
    val leaves = spark.range(1, m + 1)
      .select(col("id").as("src"), lit(0L).as("dst"))
    val edges = leaves.union(
      spark.range(1).select(lit(0L).as("src"), lit(1L).as("dst")))
    val pr = PageRank.pageRank(edges, "src", "dst", iters = 1)
    val picked = pr.where(col("node_id").isin(0L, 1L, 2L, m))
      .orderBy("node_id").collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(picked.toSeq === Seq(0L -> 10200000150000L, 1L -> 1000000L,
      2L -> 150000L, m -> 150000L))
  }
}
