package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.dedup.Dedup

class DedupSpec extends AnyFunSuite with SparkSpec {

  test("duplicateClusters resolves transitive chains to min-id labels") {
    import spark.implicits._
    // 1-2-3 is a chain (needs >1 propagation round); 10-11 separate
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val got = Dedup.duplicateClusters(pairs)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L)))
  }

  test("duplicateClusters handles a long path within maxIters") {
    import spark.implicits._
    val pairs = (1L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Dedup.duplicateClusters(pairs)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(got.map(_._2).distinct === Seq(1L))
    assert(got.size === 12)
  }
}
