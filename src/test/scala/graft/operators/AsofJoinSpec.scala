package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin picks the latest right row at-or-before each left ts") {
    val left = Seq((1L, "u1", 100L), (2L, "u1", 205L), (3L, "u2", 50L))
      .toDF("id", "k", "ts")
    val right = Seq(("u1", 90L, 9.0), ("u1", 200L, 20.0), ("u2", 60L, 6.0))
      .toDF("k", "ts", "px")
    val out = AsofJoin.asofJoin(left, right, Seq("k"), "ts", Seq("px"))
      .orderBy("id")
      .collect().map(r => (r.getAs[Long]("id"), Option(r.getAs[Any]("px")))).toSeq
    // id=1: px@90; id=2: px@200 (skips 90); id=3: no view <= 50 → null
    assert(out === Seq((1L, Some(9.0)), (2L, Some(20.0)), (3L, None)))
  }

  test("asofJoin is inclusive at equal timestamps") {
    val left = Seq((1L, "u1", 100L)).toDF("id", "k", "ts")
    val right = Seq(("u1", 100L, 1.5)).toDF("k", "ts", "px")
    val out = AsofJoin.asofJoin(left, right, Seq("k"), "ts", Seq("px"))
      .collect()
    assert(out.head.getAs[Double]("px") === 1.5)
  }

  test("asofJoinTolerance nulls matches older than the bound") {
    val left = Seq((1L, "u1", 100L), (2L, "u1", 500L), (3L, "u1", 210L))
      .toDF("id", "k", "ts")
    val right = Seq(("u1", 90L, 9.0), ("u1", 200L, 20.0))
      .toDF("k", "ts", "px")
    val out = AsofJoin.asofJoinTolerance(left, right, Seq("k"), "ts",
        Seq("px"), tolerance = lit(50L))
      .orderBy("id")
      .collect().map(r => (r.getAs[Long]("id"), Option(r.getAs[Any]("px")))).toSeq
    // id=1: 100-90=10 ≤ 50 → 9.0; id=2: 500-200=300 > 50 → null
    // (the LATEST row decides — the stale match is nulled, not skipped)
    // id=3: 210-200=10 ≤ 50 → 20.0
    assert(out === Seq((1L, Some(9.0)), (2L, None), (3L, Some(20.0))))
  }

  test("asofJoinTolerance checks staleness on the payload's own row") {
    // right payload can be null: the carry must not mix row 90's ts
    // with row 200's payload
    val left = Seq((1L, "u1", 210L)).toDF("id", "k", "ts")
    val right = Seq(("u1", 90L, Some(9.0)), ("u1", 200L, None: Option[Double]))
      .toDF("k", "ts", "px")
    val out = AsofJoin.asofJoinTolerance(left, right, Seq("k"), "ts",
        Seq("px"), tolerance = lit(50L))
      .collect()
    // latest row (ts=200) is fresh but its payload IS null → null,
    // never the stale 9.0 from ts=90
    assert(out.head.isNullAt(out.head.fieldIndex("px")))
  }

  test("asofJoin plans one shuffle on the key, no nested-loop join") {
    val left = Seq((1L, "u1", 100L)).toDF("id", "k", "ts")
    val right = Seq(("u1", 90L, 9.0)).toDF("k", "ts", "px")
    val plan = AsofJoin.asofJoin(left, right, Seq("k"), "ts", Seq("px"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("Window"))
  }
}
