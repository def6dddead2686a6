package graft.operators

import org.apache.spark.sql.functions._
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

  test("minHashPairsAgainstIndex agrees with the self-join on cross pairs") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, base), (2L, base + " extra"), (3L, "completely different words " +
        "nothing shared here at all with anything else whatsoever"),
      (4L, base), (5L, "another unrelated string of many distinct tokens " +
        "that matches nothing in this tiny corpus")
    ).toDF("doc_id", "text")
    // full self-join pairs, restricted to odd-probe × even-index
    val expected = Dedup.minHashPairs(docs, "doc_id", "text",
        threshold = 0.5)
      .where(col("id_a") % 2 =!= col("id_b") % 2)
      .select(
        when(col("id_a") % 2 === 1, col("id_a")).otherwise(col("id_b"))
          .as("probe_id"),
        when(col("id_a") % 2 === 1, col("id_b")).otherwise(col("id_a"))
          .as("index_id"),
        col("jaccard"))
      .as[(Long, Long, Double)].collect().toSet
    val index = Dedup.minHashIndex(docs.where(col("doc_id") % 2 === 0),
      "doc_id", "text")
    val probe = Dedup.minHashIndex(docs.where(col("doc_id") % 2 === 1),
      "doc_id", "text")
    val got = Dedup.minHashPairsAgainstIndex(probe, index, threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(got === expected)
    assert(got.map(p => (p._1, p._2)).contains((1L, 4L))) // exact dup pair
  }
}
