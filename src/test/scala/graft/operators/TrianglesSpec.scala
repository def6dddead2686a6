package graft.operators

import graft.SparkSpec
import graft.graph.Triangles

class TrianglesSpec extends SparkSpec {

  import spark.implicits._

  test("K4 plus a pendant: hand-computed per-node counts") {
    // complete graph on {1,2,3,4} (4 triangles, each node in 3) plus
    // pendant 5–1 (no triangles); duplicates/reversals/self-loops must
    // collapse
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (2L, 1L), (3L, 1L), // reversed duplicates
      (4L, 4L),           // self-loop
      (5L, 1L)).toDF("s", "d")
    val got = Triangles.triangleCounts(edges, "s", "d")
      .orderBy("node_id").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L), (5L, 0L)))
    spark.catalog.clearCache()
  }

  test("triangle-free bipartite graph counts all zeros") {
    val edges = (1L to 4L).flatMap(i => Seq((i, 10L + i), (i, 10L + i % 4 + 1)))
      .toDF("s", "d")
    val got = Triangles.triangleCounts(edges, "s", "d")
    assert(got.count() === 8L)
    assert(got.where($"n_triangles" =!= 0L).count() === 0L)
    spark.catalog.clearCache()
  }

  test("hub star with one chord: only the chord triangle counts") {
    // star center 0 with leaves 1..20, plus chord 1–2 → exactly one
    // triangle (0,1,2); the degree orientation keeps the hub's wedge
    // list small (owner of a wedge is the LOW-degree corner)
    val edges = ((1L to 20L).map(i => (0L, i)) :+ (1L, 2L)).toDF("s", "d")
    val got = Triangles.triangleCounts(edges, "s", "d")
      .orderBy("node_id").as[(Long, Long)].collect().toMap
    assert(got(0L) === 1L && got(1L) === 1L && got(2L) === 1L)
    assert((3L to 20L).forall(got(_) === 0L))
    spark.catalog.clearCache()
  }
}
