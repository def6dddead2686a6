package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.graph.{TriangleDelta, Triangles}

class TriangleDeltaSpec extends AnyFunSuite with SparkSpec {

  test("a closing diagonal creates exactly the two expected triangles") {
    import spark.implicits._
    val old = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("a", "b")
    val batch = Seq((1L, 3L)).toDF("a", "b")
    val got = TriangleDelta.triangleDelta(old, batch, "a", "b")
      .orderBy("node_id").as[(Long, Long)].collect().toSeq
    // triangles (1,2,3) and (1,3,4): corners 1 and 3 twice, 2/4 once
    assert(got === Seq((1L, 2L), (2L, 1L), (3L, 2L), (4L, 1L)))
  }

  test("delta equals the full-recount difference on a random graph") {
    import spark.implicits._
    val all = (for {
      a <- 1L to 25L; b <- 1L to 25L
      if a < b && (a * 31 + b * 17) % 5 == 0
    } yield (a, b)).toDF("a", "b")
    val old = all.where((col("a") * 13 + col("b") * 7) % 3 =!= 0)
    val batch = all.where((col("a") * 13 + col("b") * 7) % 3 === 0)
    val got = TriangleDelta.triangleDelta(old, batch, "a", "b")
      .as[(Long, Long)].collect().toMap
    val before = Triangles.triangleCounts(old, "a", "b")
      .as[(Long, Long)].collect().toMap
    val after = Triangles.triangleCounts(all, "a", "b")
      .as[(Long, Long)].collect().toMap
    val want = after.map { case (n, c) =>
      n -> (c - before.getOrElse(n, 0L))
    }.filter(_._2 != 0L)
    assert(got === want)
    assert(got.nonEmpty) // the split actually creates triangles
  }

  test("re-inserting existing edges creates nothing") {
    import spark.implicits._
    val old = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b")
    val batch = Seq((2L, 1L), (3L, 2L)).toDF("a", "b") // reversed dups
    val got = TriangleDelta.triangleDelta(old, batch, "a", "b")
      .collect()
    assert(got.isEmpty)
  }

  test("deleting a diagonal destroys exactly the two triangles it closed") {
    import spark.implicits._
    val old = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
      .toDF("a", "b")
    val batch = Seq((3L, 1L)).toDF("a", "b") // reversed orientation
    val got = TriangleDelta.triangleDeltaDeleted(old, batch, "a", "b")
      .orderBy("node_id").as[(Long, Long)].collect().toSeq
    // triangles (1,2,3) and (1,3,4) both contained the diagonal
    assert(got === Seq((1L, 2L), (2L, 1L), (3L, 2L), (4L, 1L)))
  }

  test("deleted delta equals the full-recount difference on a random graph") {
    import spark.implicits._
    val all = (for {
      a <- 1L to 25L; b <- 1L to 25L
      if a < b && (a * 31 + b * 17) % 5 == 0
    } yield (a, b)).toDF("a", "b")
    val batch = all.where((col("a") * 13 + col("b") * 7) % 3 === 0)
    val pruned = all.where((col("a") * 13 + col("b") * 7) % 3 =!= 0)
    val got = TriangleDelta.triangleDeltaDeleted(all, batch, "a", "b")
      .as[(Long, Long)].collect().toMap
    val before = Triangles.triangleCounts(all, "a", "b")
      .as[(Long, Long)].collect().toMap
    val after = Triangles.triangleCounts(pruned, "a", "b")
      .as[(Long, Long)].collect().toMap
    val want = before.map { case (n, c) =>
      n -> (c - after.getOrElse(n, 0L))
    }.filter(_._2 != 0L)
    assert(got === want)
    assert(got.nonEmpty) // the split actually destroys triangles
  }

  test("deleting absent edges destroys nothing") {
    import spark.implicits._
    val old = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b")
    val batch = Seq((4L, 5L), (2L, 4L)).toDF("a", "b")
    val got = TriangleDelta.triangleDeltaDeleted(old, batch, "a", "b")
      .collect()
    assert(got.isEmpty)
  }

  test("a triangle losing all three edges is counted once per corner") {
    import spark.implicits._
    val old = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b")
    val batch = Seq((1L, 2L), (3L, 2L), (1L, 3L)).toDF("a", "b")
    val got = TriangleDelta.triangleDeltaDeleted(old, batch, "a", "b")
      .orderBy("node_id").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 1L), (2L, 1L), (3L, 1L)))
  }
}
