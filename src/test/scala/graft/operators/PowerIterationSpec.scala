package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.similarity.PowerIteration

class PowerIterationSpec extends AnyFunSuite with SparkSpec {

  test("recovers the exact dominant direction of a rank-1 corpus") {
    import spark.implicits._
    // two copies of the vector (3, 1): G = [[18,6],[6,2]], dominant
    // eigenvector ∝ (3,1) → L∞-ppm (1000000, 333333)
    val codes = Seq((1L, 0L, 3L), (1L, 1L, 1L), (2L, 0L, 3L),
        (2L, 1L, 1L))
      .toDF("id", "dim", "code")
    val got = PowerIteration.principalDirection(codes, iters = 3)
      .orderBy("dim").as[(Long, Long)].collect().toSeq
    assert(got === Seq((0L, 1000000L), (1L, 333333L)))
  }

  test("iterate is partition-invariant and positively normalized") {
    import spark.implicits._
    val codes = (1L to 40L).flatMap(id =>
      (0L to 7L).map(d => (id, d, (id * 11 + d * d * 5) % 256)))
      .toDF("id", "dim", "code")
    val a = PowerIteration.principalDirection(codes.repartition(1), 3)
      .orderBy("dim").as[(Long, Long)].collect().toSeq
    val b = PowerIteration.principalDirection(codes.repartition(5), 3)
      .orderBy("dim").as[(Long, Long)].collect().toSeq
    assert(a === b)
    assert(a.map(_._2).max === 1000000L) // L∞ normalization lands on 10⁶
    assert(a.forall(_._2 >= 0L)) // Perron–Frobenius: stays non-negative
  }

  test("separates an axis-dominant corpus from a balanced one") {
    import spark.implicits._
    // corpus hugging dim 0: component 0 must dominate after 3 rounds
    val codes = (1L to 30L).flatMap(id =>
      Seq((id, 0L, 200L), (id, 1L, (id % 5) + 1L), (id, 2L, 3L)))
      .toDF("id", "dim", "code")
    val got = PowerIteration.principalDirection(codes, 3)
      .orderBy("dim").as[(Long, Long)].collect().toSeq
    assert(got.head._2 === 1000000L)
    assert(got.tail.forall(_._2 < 100000L))
  }
}
