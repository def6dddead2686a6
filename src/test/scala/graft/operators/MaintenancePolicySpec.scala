package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.graph.{KTruss, MaintenancePolicy}

/** The repair-vs-recompute planner: routing arithmetic, the
  * equivalence contract (both routes of each direction land on the
  * same truss), and the logged decision column. */
class MaintenancePolicySpec extends SparkSpec {

  import spark.implicits._

  test("decide routes by floor-ppm ratio against the per-direction " +
      "threshold") {
    val ins = MaintenancePolicy.decide("insert", 39, 100)
    assert(ins.ratioPpm === 390000L && ins.repair && ins.choice === "repair")
    val insBig = MaintenancePolicy.decide("insert", 41, 100)
    assert(!insBig.repair && insBig.choice === "recompute")
    val del = MaintenancePolicy.decide("delete", 4, 100)
    assert(del.ratioPpm === 40000L && del.repair)
    assert(!MaintenancePolicy.decide("delete", 6, 100).repair)
    // custom thresholds are honored
    assert(MaintenancePolicy.decide("delete", 6, 100,
      deleteRepairMaxPpm = 100000L).repair)
    // empty base graph has nothing to repair into
    assert(!MaintenancePolicy.decide("insert", 5, 0).repair)
    intercept[IllegalArgumentException] {
      MaintenancePolicy.decide("upsert", 1, 1)
    }
  }

  // two triangles sharing edge (2,3) plus a pendant edge: the
  // 3-truss is the two triangles; dropping (1,2) peels triangle 1
  private def fixture = Seq(
    (1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
    .toDF("p1", "p2")

  test("kTrussAuto insert: both routes equal the cold union truss, " +
      "and the batch ratio picks the route") {
    val base = fixture.where($"p1" =!= 1L)
    val batch = fixture.where($"p1" === 1L) // 2 of 4 base edges = 50%
    val saved = KTruss.kTruss(base, "p1", "p2", k = 3, maxRounds = 8)
    val cold = KTruss.kTruss(fixture, "p1", "p2", k = 3, maxRounds = 8)
      .orderBy("u", "v").as[(Long, Long)].collect().toSeq
    // 50% > 40% default window -> recompute
    val auto = MaintenancePolicy.kTrussAuto(base, batch, "p1", "p2",
      "insert", saved, k = 3, maxExpandRounds = 8, maxPeelRounds = 8)
    assert(auto.select("choice").distinct().as[String].collect().toSeq
      === Seq("recompute"))
    assert(auto.orderBy("u", "v").select("u", "v")
      .as[(Long, Long)].collect().toSeq === cold)
    // widening the window flips the route; the truss must not move
    val autoRepair = MaintenancePolicy.kTrussAuto(base, batch, "p1", "p2",
      "insert", saved, k = 3, maxExpandRounds = 8, maxPeelRounds = 8,
      insertRepairMaxPpm = 600000L)
    assert(autoRepair.select("choice").distinct().as[String]
      .collect().toSeq === Seq("repair"))
    assert(autoRepair.orderBy("u", "v").select("u", "v")
      .as[(Long, Long)].collect().toSeq === cold)
    spark.catalog.clearCache()
  }

  test("kTrussAuto delete: both routes equal the cold pruned truss") {
    val batch = Seq((1L, 2L)).toDF("p1", "p2") // 1 of 6 = 16.7%
    val saved = KTruss.kTruss(fixture, "p1", "p2", k = 3, maxRounds = 8)
    val cold = KTruss.kTruss(
        fixture.join(batch, Seq("p1", "p2"), "left_anti"),
        "p1", "p2", k = 3, maxRounds = 8)
      .orderBy("u", "v").as[(Long, Long)].collect().toSeq
    // 16.7% > 5% default window -> recompute
    val auto = MaintenancePolicy.kTrussAuto(fixture, batch, "p1", "p2",
      "delete", saved, k = 3, maxExpandRounds = 8, maxPeelRounds = 8)
    assert(auto.select("choice").distinct().as[String].collect().toSeq
      === Seq("recompute"))
    assert(auto.orderBy("u", "v").select("u", "v")
      .as[(Long, Long)].collect().toSeq === cold)
    // a trickle window routes to the saved-artifact repair — same truss
    val autoRepair = MaintenancePolicy.kTrussAuto(fixture, batch,
      "p1", "p2", "delete", saved, k = 3, maxExpandRounds = 8,
      maxPeelRounds = 8, deleteRepairMaxPpm = 200000L)
    assert(autoRepair.select("choice").distinct().as[String]
      .collect().toSeq === Seq("repair"))
    assert(autoRepair.orderBy("u", "v").select("u", "v")
      .as[(Long, Long)].collect().toSeq === cold)
    spark.catalog.clearCache()
  }
}
