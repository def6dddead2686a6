package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def snap = Seq(
    (1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")

  test("highest seq wins; delete tombstone removes; insert adds") {
    val changes = Seq(
      (1L, "a2", 1L, "U"),
      (1L, "a3", 2L, "U"),   // wins over a2
      (2L, null.asInstanceOf[String], 1L, "D"),
      (9L, "new", 1L, "I")).toDF("k", "v", "seq", "op")
    val out = Cdc.applyChangeLog(snap, changes, Seq("k"), "seq", "op")
      .orderBy("k").as[(Long, String)].collect()
    assert(out.toSeq == Seq((1L, "a3"), (3L, "c"), (9L, "new")))
  }

  test("re-insert after delete (higher seq I resurrects the key)") {
    val changes = Seq(
      (3L, null.asInstanceOf[String], 1L, "D"),
      (3L, "c2", 2L, "I")).toDF("k", "v", "seq", "op")
    val out = Cdc.applyChangeLog(snap, changes, Seq("k"), "seq", "op")
      .orderBy("k").as[(Long, String)].collect()
    assert(out.toSeq == Seq((1L, "a"), (2L, "b"), (3L, "c2")))
  }

  test("same-seq tie resolves to the delete (op DESC tiebreak)") {
    val changes = Seq(
      (2L, "b2", 5L, "U"),
      (2L, null.asInstanceOf[String], 5L, "D")).toDF("k", "v", "seq", "op")
    val out = Cdc.applyChangeLog(snap, changes, Seq("k"), "seq", "op")
      .orderBy("k").as[(Long, String)].collect()
    assert(out.toSeq == Seq((1L, "a"), (3L, "c")))
  }

  test("delete of a key absent from the snapshot is a no-op") {
    val changes = Seq(
      (42L, null.asInstanceOf[String], 1L, "D")).toDF("k", "v", "seq", "op")
    val out = Cdc.applyChangeLog(snap, changes, Seq("k"), "seq", "op")
    assert(out.count() == 3)
  }

  test("plan is union + one window — no join") {
    val changes = Seq((1L, "a2", 1L, "U")).toDF("k", "v", "seq", "op")
    val plan = Cdc.applyChangeLog(snap, changes, Seq("k"), "seq", "op")
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"), s"unexpected join in:\n$plan")
    assert(plan.contains("Window"))
  }
}
