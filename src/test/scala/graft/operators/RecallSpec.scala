package graft.operators

import graft.SparkSpec
import graft.similarity.Similarity

/** [[Similarity.recallAtK]] — the ANN evaluation operator. The oracle
  * gates (q_ann_recall / q_ann_recall_probe2) prove engine ≡ SQL over
  * the real search chains; this spec pins the counting semantics on
  * handcrafted top-k frames.
  */
class RecallSpec extends SparkSpec {
  import spark.implicits._

  test("per-query hit counting, ppm floors, and missing queries") {
    val exact = Seq(
      (1L, 10L), (1L, 11L), (1L, 12L), // q1: 3 exact neighbors
      (2L, 20L), (2L, 21L), (2L, 22L), // q2
      (3L, 30L), (3L, 31L), (3L, 32L)) // q3: absent from approx
      .toDF("query_id", "nbr_id")
    val approx = Seq(
      (1L, 10L), (1L, 11L), (1L, 12L), // all 3
      (2L, 20L), (2L, 99L), (2L, 98L)) // 1 of 3
      .toDF("query_id", "nbr_id")
    val got = Similarity.recallAtK(approx, exact).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(1L) == ((3L, 3L, 1000000L)))
    assert(got(2L) == ((3L, 1L, 333333L)))
    assert(got(3L) == ((3L, 0L, 0L))) // empty cell ⇒ zero, not missing
  }

  test("extra approx rows beyond the exact set never inflate recall") {
    val exact = Seq((1L, 10L)).toDF("query_id", "nbr_id")
    val approx = Seq((1L, 10L), (1L, 11L), (1L, 12L), (1L, 13L))
      .toDF("query_id", "nbr_id")
    val r = Similarity.recallAtK(approx, exact).head()
    assert(r.getLong(1) == 1L && r.getLong(2) == 1L &&
      r.getLong(3) == 1000000L)
  }
}
