package graft.operators

import graft.SparkSpec

class JoinAuditSpec extends SparkSpec {
  import spark.implicits._

  private val left = Seq(1L, 1L, 1L, 2L, 3L).toDF("k")
  private val right = Seq(1L, 1L, 2L, 4L).toDF("k")

  test("keyHistogram predicts the exact equi-join cardinality per key") {
    val out = keyMap()
    assert(out(1L) === ((3L, 2L, 6L)))
    assert(out(2L) === ((1L, 1L, 1L)))
    assert(out(3L) === ((1L, 0L, 0L))) // left-only → contributes 0
    assert(out(4L) === ((0L, 1L, 0L))) // right-only
    // the histogram's total equals the join actually run
    val predicted = out.values.map(_._3).sum
    val actual = left.join(right, Seq("k")).count()
    assert(predicted === actual)
  }

  private def keyMap(): Map[Long, (Long, Long, Long)] =
    JoinAudit.keyHistogram(left, right, Seq("k"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("summary folds the histogram to the one-row audit") {
    val r = JoinAudit.summary(left, right, Seq("k")).head()
    assert(r.getLong(0) === 7L)  // join_rows = 6 + 1
    assert(r.getLong(1) === 2L)  // matched keys: 1, 2
    assert(r.getLong(2) === 1L)  // left-only: 3
    assert(r.getLong(3) === 1L)  // right-only: 4
    assert(r.getLong(4) === 6L)  // hottest key
  }

  test("audit never executes the audited join (aggregate-only plan)") {
    val plan = JoinAudit.summary(left, right, Seq("k"))
      .queryExecution.optimizedPlan.toString
    // the only join in the plan is the tiny full-outer of two
    // HISTOGRAMS (one row per key), never a join of the inputs
    assert(plan.toLowerCase.contains("fullouter"))
    assert(plan.split("Join").length - 1 === 1)
  }
}
