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

  test("containmentPairs: embedded quote scores 1.0 in one direction only") {
    import spark.implicits._
    val quote = "the five word secret message here"
    val container = "prefix words before it " + quote +
      " and plenty of trailing filler words to dilute the jaccard score badly"
    val docs = Seq((1L, quote), (2L, container),
      (3L, "entirely unrelated text with many distinct words in this row"))
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "doc_id", "text",
        k = 5, threshold = 0.9)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got === Seq((1L, 2L, 1.0))) // 1⊂2 only; 2→1 diluted, 3 unrelated
  }

  test("containmentPairs equals the brute-force definition") {
    import spark.implicits._
    import graft.functions.TextFunctions
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
        "lambda mu nu xi omicron pi"),
      (3L, "alpha beta gamma delta epsilon different tail words here now"),
      (4L, "unrelated corpus entry with its own vocabulary entirely")
    ).toDF("doc_id", "text")
    val t = 0.5
    val got = Dedup.containmentPairs(docs, "doc_id", "text", k = 5,
        threshold = t)
      .orderBy("src_id", "dst_id").as[(Long, Long, Double)].collect().toSeq
    val sh = docs.select(col("doc_id"),
        TextFunctions.shingles(col("text"), 5).as("sh"))
    val brute = sh.alias("a").join(sh.alias("b"),
        col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        round(size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
          size(col("a.sh")), 6).as("c"))
      .where(col("c") >= t)
      .orderBy(col("a.doc_id"), col("b.doc_id"))
      .as[(Long, Long, Double)].collect().toSeq
    assert(got === brute)
    assert(got.nonEmpty)
  }

  test("hammingPairs equals brute force over random 64-bit signatures") {
    import spark.implicits._
    // seeded generator: negative longs included — the top band of a
    // 64-bit signature sign-extends under shiftright, which the band
    // mask must strip
    val rnd = new scala.util.Random(42)
    val base = Array.fill(40)(rnd.nextLong())
    // plant near-dups: flip ≤ 3 random bits of earlier signatures
    val sigs = (base.take(25) ++ base.take(15).map { s =>
      (0 until 1 + rnd.nextInt(3)).foldLeft(s)((a, _) =>
        a ^ (1L << rnd.nextInt(64)))
    }).zipWithIndex.map { case (s, i) => (i.toLong, s) }.toSeq
    val df = sigs.toDF("id", "sig")
    val maxH = 3
    val got = Dedup.hammingPairs(df, "id", "sig", bits = 64,
        maxHamming = maxH, bands = 8)
      .orderBy("id_a", "id_b").as[(Long, Long, Int)].collect().toSeq
    val brute = for {
      (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
      h = java.lang.Long.bitCount(sa ^ sb) if h <= maxH
    } yield (ia, ib, h)
    assert(got === brute.sortBy(p => (p._1, p._2)))
    assert(got.nonEmpty)
    // banding cannot guarantee recall at maxHamming >= bands
    intercept[IllegalArgumentException] {
      Dedup.hammingPairs(df, "id", "sig", bits = 64, maxHamming = 8,
        bands = 8)
    }
  }

  test("incremental cluster fold-in equals full re-clustering") {
    import spark.implicits._
    // old world: {1,2} and {3,4}; new batch BRIDGES them (2-3) and
    // opens a fresh cluster {7,8}
    val oldPairs = Seq((1L, 2L), (3L, 4L)).toDF("id_a", "id_b")
    val newPairs = Seq((2L, 3L), (7L, 8L)).toDF("id_a", "id_b")
    val labels = Dedup.duplicateClusters(oldPairs)
    val got = Dedup.duplicateClustersIncremental(labels, newPairs)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    val full = Dedup.duplicateClusters(oldPairs.unionByName(newPairs))
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(got === full)
    assert(got === Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      7L -> 7L, 8L -> 7L))
  }
}
