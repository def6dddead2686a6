package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.functions.{FeatureHash, TextFunctions}

class FeatureHashSpec extends AnyFunSuite with SparkSpec {

  test("bucket is stable, in range, and md5-derived") {
    import spark.implicits._
    val words = Seq("alpha", "beta", "gamma", "alpha").toDF("w")
    val b = words.select(FeatureHash.bucket(col("w"), 64).as("b"))
      .as[Long].collect().toSeq
    assert(b.forall(x => x >= 0 && x < 64))
    assert(b(0) === b(3)) // same token, same bucket
    // stability pin: bucket = pmod(first-15-md5-hex, 64)
    val h = words.limit(1)
      .select(TextFunctions.hash64(col("w")).as("h")).as[Long].head()
    assert(b(0) === (h % 64 + 64) % 64)
  }

  test("hashedTf sums counts per bucket with sign correction") {
    import spark.implicits._
    val docs = Seq((1L, "red red blue"), (2L, ""), (3L, "red")).toDF("id", "text")
    val out = FeatureHash.hashedTf(docs, "id", "text", dim = 1024)
      .orderBy("id", "bucket")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // doc 2 is empty → no rows; doc 3 has one bucket with tf 1
    assert(!out.exists(_._1 == 2L))
    val d3 = out.filter(_._1 == 3L)
    assert(d3.size === 1 && d3.head._3 === 1L &&
      math.abs(d3.head._4) === 1L)
    // doc 1: "red"×2 and "blue"×1 — dim 1024 makes a collision
    // astronomically unlikely; tf per bucket is the token count
    val d1 = out.filter(_._1 == 1L)
    assert(d1.map(_._3).sorted === Seq(1L, 2L))
    d1.foreach(r => assert(math.abs(r._4) === r._3)) // one token/bucket
  }

  test("a collision at dim=1 keeps tf exact while signs may cancel") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d")).toDF("id", "text")
    val out = FeatureHash.hashedTf(docs, "id", "text", dim = 1)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out.size === 1)
    val (_, bucket, tf, signed) = out.head
    assert(bucket === 0L && tf === 4L)
    assert(math.abs(signed) <= 4L && (signed % 2 + 2) % 2 === 0L)
    // 4 signs of ±1 always sum to an even number
  }
}
