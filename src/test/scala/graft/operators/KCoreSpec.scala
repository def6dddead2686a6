package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.graph.KCore

class KCoreSpec extends AnyFunSuite with SparkSpec {

  test("round 0 is the degree; converged rounds give exact coreness") {
    import spark.implicits._
    // a 4-clique {1,2,3,4} with a pendant path 4–5–6: coreness is 3
    // on the clique, 1 on the path
    val clique = for {
      a <- 1L to 4L; b <- 1L to 4L if a < b
    } yield (a, b)
    val edges = (clique ++ Seq((4L, 5L), (5L, 6L))).toDF("a", "b")
    val deg = KCore.corenessHIndex(edges, "a", "b", rounds = 0)
      .orderBy("node_id").as[(Long, Long)].collect().toSeq
    assert(deg === Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 4L),
      (5L, 2L), (6L, 1L)))
    val core = KCore.corenessHIndex(edges, "a", "b", rounds = 4)
      .orderBy("node_id").as[(Long, Long)].collect().toSeq
    assert(core === Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L),
      (5L, 1L), (6L, 1L)))
  }

  test("values are non-increasing in rounds and partition-invariant") {
    import spark.implicits._
    // ring of 12 + chords — coreness 2 everywhere on the ring
    val ring = (1L to 12L).map(i => (i, i % 12 + 1))
    val edges = (ring ++ Seq((1L, 7L), (2L, 8L))).toDF("a", "b")
    val r1 = KCore.corenessHIndex(edges.repartition(1), "a", "b", 1)
      .orderBy("node_id").as[(Long, Long)].collect().toSeq
    val r3 = KCore.corenessHIndex(edges.repartition(7), "a", "b", 3)
      .orderBy("node_id").as[(Long, Long)].collect().toSeq
    assert(r1.map(_._1) === r3.map(_._1))
    r1.zip(r3).foreach { case ((_, v1), (_, v3)) => assert(v3 <= v1) }
    // and the 1-round result itself is partition-invariant
    val r1b = KCore.corenessHIndex(edges.repartition(5), "a", "b", 1)
      .orderBy("node_id").as[(Long, Long)].collect().toSeq
    assert(r1 === r1b)
  }

  test("bucketed h-index handles heavy value ties (star + matched " +
    "leaves) exactly") {
    import spark.implicits._
    // hub 0 with 9 leaves, leaves chained in 3 triangles so leaf
    // values tie in bulk: after round 1 every leaf has the same
    // value — the bucket-cumulative form must count ties exactly
    // (c(w) sums the whole bucket, not rank-within-bucket)
    val star = (1L to 9L).map(l => (0L, l))
    val tris = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L), (5L, 6L),
      (6L, 4L), (7L, 8L), (8L, 9L), (9L, 7L))
    val edges = (star ++ tris).toDF("a", "b")
    // exact coreness: every node is in a triangle+hub structure —
    // hub has 9 neighbors of value ≥ ..., leaves have hub + 2
    // triangle peers. Converged coreness: 3 everywhere (hub's
    // h-index over nine 3s is min(3, 9)=3; leaf over {hub=3,3,3}=3).
    val got = KCore.corenessHIndex(edges, "a", "b", rounds = 8)
      .orderBy("node_id").as[(Long, Long)].collect().toSeq
    assert(got === (0L to 9L).map(n => (n, 3L)))
    // and a 1-round value with ties: hub degree 9, leaves degree 3;
    // hub h-index over nine 3s = 3, leaf over {9,3,3} = 3
    val r1 = KCore.corenessHIndex(edges, "a", "b", rounds = 1)
      .orderBy("node_id").as[(Long, Long)].collect().toSeq
    assert(r1 === (0L to 9L).map(n => (n, 3L)))
  }

  test("duplicate, reversed, and self-loop edges are canonicalized") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 2L), (1L, 1L), (2L, 3L))
      .toDF("a", "b")
    val got = KCore.corenessHIndex(edges, "a", "b", rounds = 2)
      .orderBy("node_id").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 1L), (2L, 1L), (3L, 1L)))
  }

  private def core(edges: Seq[(Long, Long)], rounds: Int = 20) = {
    import spark.implicits._
    KCore.corenessHIndex(edges.toDF("a", "b"), "a", "b", rounds)
      .orderBy("node_id").as[(Long, Long)].collect().toSeq
  }

  private def resume(edges: Seq[(Long, Long)], saved: Seq[(Long, Long)],
                     slack: Long, rounds: Int = 20) = {
    import spark.implicits._
    KCore.corenessResume(edges.toDF("a", "b"),
        "a", "b", saved.toDF("node_id", "coreness"), slack, rounds)
      .orderBy("node_id").as[(Long, Long)].collect().toSeq
  }

  test("insert resume converges to the cold decomposition (sandwich)") {
    // old: 4-clique {1..4} + pendant path 4-5-6; batch closes
    // {4,5,6,7} into a second clique — coreness of 5,6 RISES 1 → 3
    val clique = for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)
    val old = clique ++ Seq((4L, 5L), (5L, 6L))
    val batch = Seq((4L, 6L), (4L, 7L), (5L, 7L), (6L, 7L))
    val warm = resume(old ++ batch, core(old), slack = batch.size)
    assert(warm === core(old ++ batch))
    // node 7 is batch-new: absent from the artifact, seeds at degree
    assert(warm.find(_._1 == 7L).map(_._2) === Some(3L))
  }

  test("delete resume (slack 0) converges to the cold decomposition") {
    val clique = for { a <- 1L to 5L; b <- 1L to 5L if a < b } yield (a, b)
    val old = clique ++ Seq((5L, 6L), (6L, 7L))
    // retract two clique edges: coreness drops 4 → 3 on the clique
    val kept = old.filterNot(e => e == (1L, 2L) || e == (3L, 4L))
    assert(resume(kept, core(old), slack = 0L) === core(kept))
  }

  test("resume over an unchanged graph from the converged artifact " +
      "is a fixpoint") {
    val ring = (1L to 10L).map(i => (i, i % 10 + 1))
    val saved = core(ring)
    assert(resume(ring, saved, slack = 0L, rounds = 1) === saved)
  }

  test("randomized insert and delete batches match the cold peel") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 30
      val all = (for {
        a <- 1L to n; b <- 1L to n
        if a < b && rnd.nextInt(100) < 18
      } yield (a, b)).toSeq
      val (old, batch) = all.partition(_ => rnd.nextInt(100) < 75)
      if (old.nonEmpty && batch.nonEmpty) {
        // insert direction: old + batch, slack = |batch|
        assert(resume(all, core(old), slack = batch.size) === core(all),
          s"insert trial $trial")
        // delete direction: all − batch, slack = 0
        assert(resume(old, core(all), slack = 0L) === core(old),
          s"delete trial $trial")
      }
    }
  }

  test("trickle insert repairs the K4-minus-edge case exactly (the " +
      "non-incident growth that breaks naive regions)") {
    import spark.implicits._
    // K4 minus {3,4}: all coreness 2. Insert {3,4}: all rise to 3 —
    // including 1 and 2, NOT incident to the batch edge. The region
    // closure must pull them in through the crossing rule.
    val old = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L))
      .toDF("a", "b")
    val saved = KCore.corenessHIndex(old, "a", "b", rounds = 8)
    val grown = old.union(Seq((3L, 4L)).toDF("a", "b"))
    val got = KCore.corenessTrickle(grown, "a", "b", saved,
        Seq(3L, 4L).toDF("n"), slack = 1L, rounds = 8, expandRounds = 8)
      .orderBy("node_id").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)))
    spark.catalog.clearCache()
  }

  test("trickle batch insert: two edges completing K4 from a pendant " +
      "(per-edge subcores computed on old coreness would miss it)") {
    import spark.implicits._
    // triangle {1,2,3} (coreness 2) + pendant 4–1 (coreness 1).
    // Insert (4,2) and (4,3): K4, all coreness 3. Each edge's
    // single-edge subcore on OLD coreness is just {4} — the ±b drift
    // in the batch rule is what captures 1, 2, 3.
    val old = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 1L)).toDF("a", "b")
    val saved = KCore.corenessHIndex(old, "a", "b", rounds = 8)
    val grown = old.union(Seq((4L, 2L), (4L, 3L)).toDF("a", "b"))
    val got = KCore.corenessTrickle(grown, "a", "b", saved,
        Seq(4L, 2L, 3L).toDF("n"), slack = 2L, rounds = 8,
        expandRounds = 8)
      .orderBy("node_id").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)))
    spark.catalog.clearCache()
  }

  test("trickle delete repairs the K4 edge retraction exactly") {
    import spark.implicits._
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L)).toDF("a", "b")
    val saved = KCore.corenessHIndex(k4, "a", "b", rounds = 8)
    val pruned = k4.where(!($"a" === 3L && $"b" === 4L))
    val got = KCore.corenessTrickle(pruned, "a", "b", saved,
        Seq(3L, 4L).toDF("n"), slack = 0L, rounds = 8,
        expandRounds = 8, deleteSlack = 1L)
      .orderBy("node_id").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 2L), (2L, 2L), (3L, 2L), (4L, 2L)))
    spark.catalog.clearCache()
  }

  test("trickle equals the converged cold decomposition on random " +
      "graphs with random small batches, both directions") {
    import spark.implicits._
    val rnd = new scala.util.Random(1818)
    for (trial <- 1 to 3) {
      val all = Seq.fill(120)((rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct
      val batch = all.take(3)
      val old = all.drop(3)
      // INSERT: saved on old, batch arrives
      val savedIns = KCore.corenessHIndex(old.toDF("a", "b"), "a", "b",
        rounds = 16)
      val cold = KCore.corenessHIndex(all.toDF("a", "b"), "a", "b",
          rounds = 16)
        .orderBy("node_id").as[(Long, Long)].collect().toSeq
      val gotIns = KCore.corenessTrickle(all.toDF("a", "b"), "a", "b",
          savedIns, batch.flatMap(e => Seq(e._1, e._2)).toDF("n"),
          slack = batch.size.toLong, rounds = 16, expandRounds = 32)
        .orderBy("node_id").as[(Long, Long)].collect().toSeq
      assert(gotIns === cold, s"insert trial $trial")
      // DELETE: saved on all, batch retracts
      val savedAll = KCore.corenessHIndex(all.toDF("a", "b"), "a", "b",
        rounds = 16)
      val coldOld = KCore.corenessHIndex(old.toDF("a", "b"), "a", "b",
          rounds = 16)
        .orderBy("node_id").as[(Long, Long)].collect().toSeq
      val gotDel = KCore.corenessTrickle(old.toDF("a", "b"), "a", "b",
          savedAll, batch.flatMap(e => Seq(e._1, e._2)).toDF("n"),
          slack = 0L, rounds = 16, expandRounds = 32,
          deleteSlack = batch.size.toLong)
        .orderBy("node_id").as[(Long, Long)].collect().toSeq
      assert(gotDel === coldOld, s"delete trial $trial")
      spark.catalog.clearCache()
    }
  }
}
