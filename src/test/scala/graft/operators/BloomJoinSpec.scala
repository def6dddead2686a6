package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.SparkSpec

class BloomJoinSpec extends AnyFunSuite with SparkSpec {

  test("result is identical to the plain inner join") {
    import spark.implicits._
    val probe = (1L to 1000L).map(i => (i, s"p$i")).toDF("pk", "pv")
    val build = Seq((10L, "a"), (500L, "b"), (999L, "c"), (2000L, "d"))
      .toDF("bk", "bv")
    val got = BloomJoin.bloomPrunedJoin(probe, "pk", build, "bk")
      .select(col("pk"), col("pv"), col("bv"))
      .orderBy("pk").as[(Long, String, String)].collect().toSeq
    val want = probe.join(build, col("pk") === col("bk"))
      .select(col("pk"), col("pv"), col("bv"))
      .orderBy("pk").as[(Long, String, String)].collect().toSeq
    assert(got === want)
    assert(got.map(_._1) === Seq(10L, 500L, 999L))
  }

  test("bloom prefilter prunes most non-matching probe rows") {
    import spark.implicits._
    val probe = (1L to 5000L).map(i => (i, i % 7)).toDF("pk", "m")
    val build = Seq(1L, 2L, 3L).toDF("bk")
    // count what survives the prefilter alone: with fpp=0.01 the
    // 4997 misses should almost all be dropped (allow 2% slack)
    val spark2 = spark
    val keys = build.select(col("bk")).distinct()
    val f = keys.stat.bloomFilter("bk", 64L, 0.01)
    val bc = spark2.sparkContext.broadcast(f)
    val survived = probe
      .filter(org.apache.spark.sql.functions.udf((k: Long) =>
        bc.value.mightContainLong(k)).apply(col("pk")))
      .count()
    assert(survived >= 3L && survived <= 3L + 100L)
    // and the full operator still returns the exact 3 matches
    val got = BloomJoin.bloomPrunedJoin(probe, "pk", build, "bk").count()
    assert(got === 3L)
  }

  test("null probe keys never match and never crash the prefilter") {
    import spark.implicits._
    val probe = Seq(Some(1L), None, Some(2L)).toDF("pk")
    val build = Seq(1L).toDF("bk")
    val got = BloomJoin.bloomPrunedJoin(probe, "pk", build, "bk")
      .select(col("pk")).as[Long].collect().toSeq
    assert(got === Seq(1L))
  }
}
