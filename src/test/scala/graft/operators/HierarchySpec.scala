package graft.operators

import graft.SparkSpec

class HierarchySpec extends SparkSpec {
  import spark.implicits._

  private def closure(edges: Seq[(Long, Long)]): Set[(Long, Long, Long)] =
    Hierarchy.ancestorClosure(edges.toDF("c", "p"), "c", "p")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("a deep chain closes with exact depths") {
    // 1→2→3→…→10 (each points at the next as parent)
    val edges = (1L to 9L).map(i => i -> (i + 1))
    val expected = (for {
      n <- 1L to 9L; a <- (n + 1) to 10L
    } yield (n, a, a - n)).toSet
    assert(closure(edges) === expected)
  }

  test("a branching tree gives every node all its ancestors") {
    //      1
    //    2   3
    //   4 5   6
    val edges = Seq(2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 2L, 6L -> 3L)
    assert(closure(edges) === Set(
      (2L, 1L, 1L), (3L, 1L, 1L),
      (4L, 2L, 1L), (4L, 1L, 2L),
      (5L, 2L, 1L), (5L, 1L, 2L),
      (6L, 3L, 1L), (6L, 1L, 2L)))
  }

  test("a DAG reports the shortest ancestor distance") {
    // 1→2→4 and 1→4 directly: depth(1,4) must be 1, not 2
    val edges = Seq(1L -> 2L, 2L -> 4L, 1L -> 4L)
    val out = closure(edges)
    assert(out.contains((1L, 4L, 1L)))
    assert(!out.contains((1L, 4L, 2L)))
  }

  test("a cycle converges and is detectable as self-reachability") {
    // min-depth pairs are finite even on cycles, so the loop
    // terminates; node==anc rows are the corruption signal
    val out = closure(Seq(1L -> 2L, 2L -> 1L))
    assert(out.contains((1L, 1L, 2L)))
    assert(out.contains((2L, 2L, 2L)))
    assert(out.contains((1L, 2L, 1L)))
  }
}
