package graft.operators

import graft.SparkSpec
import graft.sinks.CompactionPlan

class CompactionPlanSpec extends SparkSpec {
  import spark.implicits._

  // dir a: 60+60+60+40 at target 100 → starts 0,60,120,180 → groups
  // 0,0,1,1; dir b: one 250-byte file spans targets → group 0 alone,
  // the next file's start (250) lands in group 2
  private val files = Seq(
    ("a", "f1", 60L), ("a", "f2", 60L), ("a", "f3", 60L), ("a", "f4", 40L),
    ("b", "g1", 250L), ("b", "g2", 10L))
    .toDF("dir", "name", "bytes")

  test("next-fit by cumulative start offset, per directory") {
    val out = CompactionPlan.assignGroups(files, "dir", "name", "bytes", 100L)
      .collect().map(r => r.getString(1) -> r.getLong(3)).toMap
    assert(out === Map("f1" -> 0L, "f2" -> 0L, "f3" -> 1L, "f4" -> 1L,
      "g1" -> 0L, "g2" -> 2L))
  }

  test("manifest: files never split, groups near target") {
    val m = CompactionPlan.groupManifest(files, "dir", "name", "bytes", 100L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(m(("a", 0L)) === ((2L, 120L)))
    assert(m(("a", 1L)) === ((2L, 100L)))
    assert(m(("b", 0L)) === ((1L, 250L)))
    assert(m(("b", 2L)) === ((1L, 10L)))
    // conservation: manifest bytes == inventory bytes
    assert(m.values.map(_._2).sum === 480L)
  }
}
