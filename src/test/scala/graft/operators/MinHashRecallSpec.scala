package graft.operators

import graft.SparkSpec
import graft.dedup.Dedup

/** Measured quality evidence for the LSH dedup stack: on a corpus with
  * KNOWN near-duplicates, every emitted pair must be exactly at/above
  * the threshold (precision 1 — `minHashPairs` verifies true Jaccard
  * behind the candidates), and banded candidate generation must
  * recover nearly all truly-similar pairs (theory at s≥0.8, b=8, r=4:
  * recall ≈ 1-(1-s⁴)⁸ ≥ 0.98). The truth set is computed by exact
  * shingle-set Jaccard over all pairs — affordable here, impossible at
  * corpus scale, which is the point of the sketch. */
class MinHashRecallSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)
  private def doc(n: Int): Vector[String] =
    Vector.fill(n)(s"w${rnd.nextInt(800)}")

  // 30 originals, each with one lightly-perturbed copy (≈2-3 words of
  // 120 swapped → expected shingle Jaccard ≈ 0.9), plus 20 unrelated
  private val docs: Seq[(Long, String)] = {
    val originals = (0L until 30L).map(i => i -> doc(120))
    val copies = originals.map { case (i, ws) =>
      (100L + i) -> ws.map(w =>
        if (rnd.nextDouble() < 0.98) w else s"x${rnd.nextInt(10000)}")
    }
    val fillers = (200L until 220L).map(i => i -> doc(120))
    (originals ++ copies ++ fillers).map { case (i, ws) =>
      i -> ws.mkString(" ")
    }
  }

  test("precision is exact and candidate recall beats 0.9 at threshold 0.8") {
    val df = docs.toDF("doc_id", "text")
    // exact truth: all-pairs Jaccard over the same shingle space the
    // sketch uses (80 docs → 3160 pairs, fine here, not at 100 TB)
    val sets = Dedup.minHashIndex(df, "doc_id", "text", shingleK = 3,
        numHashes = 32)
      .select("id", "sh").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val ids = sets.keys.toSeq.sorted
    val truth = (for {
      a <- ids; b <- ids if a < b
      j = sets(a).intersect(sets(b)).size.toDouble /
        sets(a).union(sets(b)).size
      if j >= 0.8
    } yield (a, b)).toSet
    assert(truth.size >= 10, s"fixture too weak: ${truth.size} true pairs")

    val got = Dedup.minHashPairs(df, "doc_id", "text", shingleK = 3,
        numHashes = 32, bands = 8, threshold = 0.8)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    // precision: the exact verify means NO emitted pair is below
    // threshold — set containment, not a ratio
    assert(got.subsetOf(truth),
      s"false positives: ${got.diff(truth).take(5)}")
    val recall = got.intersect(truth).size.toDouble / truth.size
    assert(recall >= 0.9, f"candidate recall $recall%.3f < 0.9")
  }
}
