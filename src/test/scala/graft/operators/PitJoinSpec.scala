package graft.operators

import graft.SparkSpec

class PitJoinSpec extends SparkSpec {
  import spark.implicits._

  // key 1: v1 [d01, d05), v2 [d05, open); key 2: one closed version
  private val dim = Seq(
    (1L, "v1", "2020-01-01", "2020-05-01"),
    (1L, "v2", "2020-05-01", null),
    (2L, "only", "2020-03-01", "2020-06-01"))
    .toDF("k", "attr", "vf", "vt")

  private def run(facts: Seq[(Long, Long, String)]) =
    PitJoin.pitJoin(facts.toDF("fid", "k", "ts"), dim, Seq("k"),
        "ts", "vf", "vt", Seq("attr"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(3))).toMap

  test("each fact gets the version valid at its timestamp") {
    val out = run(Seq(
      (10L, 1L, "2020-02-15"), // inside v1
      (11L, 1L, "2020-05-01"), // boundary: vf inclusive → v2
      (12L, 1L, "2020-12-31"), // open version
      (13L, 2L, "2020-04-01"))) // inside the closed version
    assert(out === Map(10L -> Some("v1"), 11L -> Some("v2"),
      12L -> Some("v2"), 13L -> Some("only")))
  }

  test("facts outside coverage keep their row with null attributes") {
    val out = run(Seq(
      (20L, 1L, "2019-12-31"), // before any version
      (21L, 2L, "2020-06-01"), // valid_to is EXCLUSIVE → expired
      (22L, 2L, "2020-08-01"), // after the closed version
      (23L, 3L, "2020-01-01"))) // key with no dimension rows at all
    assert(out === Map(20L -> None, 21L -> None, 22L -> None, 23L -> None))
  }

  test("a null attribute in the matched version stays null (no leak)") {
    val d = Seq(
      (1L, "old", "2020-01-01", "2020-05-01"),
      (1L, null.asInstanceOf[String], "2020-05-01", null))
      .toDF("k", "attr", "vf", "vt")
    val out = PitJoin.pitJoin(
        Seq((1L, 1L, "2020-07-01")).toDF("fid", "k", "ts"),
        d, Seq("k"), "ts", "vf", "vt", Seq("attr"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(3))).toMap
    // the union+window carry must not substitute "old" for the
    // current version's genuinely-null attr
    assert(out === Map(1L -> None))
  }

  test("plans one shuffle, never an inequality nested loop") {
    val facts = Seq((1L, 1L, "2020-02-02")).toDF("fid", "k", "ts")
    val plan = PitJoin.pitJoin(facts, dim, Seq("k"), "ts", "vf", "vt",
      Seq("attr")).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
  }
}
