package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.graph.Triangles

/** Accumulated streaming deltas == full recount: a triangle is
  * created exactly when its last edge first arrives, so summing
  * TriangleDelta over arriving batches must reproduce
  * `Triangles.triangleCounts` on the final graph (nonzero rows). */
class TriangleStreamSpec extends AnyFunSuite with SparkSpec {

  test("streamed co-purchase batches sum to the batch recount") {
    import spark.implicits._
    val got = graft.streaming.EventStream
      .triangleStreamAvailableNow(spark, sf, maxOrderKey = 1500L,
        batches = 3)
      .as[(Long, Long)].collect().toMap
    val li = graft.Tables(spark, sf, "lineitem")
      .where(col("l_orderkey") < 1500L)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val edges = li.alias("x").join(li.alias("y"),
        col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
      .select(col("x.pk").as("p1"), col("y.pk").as("p2"))
    val want = Triangles.triangleCounts(edges, "p1", "p2")
      .where(col("n_triangles") > 0)
      .as[(Long, Long)].collect().toMap
    assert(got === want)
    assert(got.nonEmpty) // the fixture graph actually has triangles
  }
}
