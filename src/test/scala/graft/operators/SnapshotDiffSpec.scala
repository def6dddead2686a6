package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  test("diff tags inserts, updates, deletes and drops unchanged") {
    val before = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30))
      .toDF("id", "s", "n")
    val after = Seq((1L, "a", 10), (2L, "B", 20), (4L, "d", 40))
      .toDF("id", "s", "n")
    val out = SnapshotDiff.diff(before, after, Seq("id"), Seq("s", "n"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        Option(r.get(2)).orNull, Option(r.get(3)).orNull))
      .toSet
    assert(out === Set(
      (2L, "U", "b", "B"),
      (3L, "D", "c", null),
      (4L, "I", null, "d")
    ))
  }

  test("null tracked values compare null-safely") {
    val before = Seq((1L, null.asInstanceOf[String])).toDF("id", "s")
    val afterSame = Seq((1L, null.asInstanceOf[String])).toDF("id", "s")
    assert(SnapshotDiff.diff(before, afterSame, Seq("id"), Seq("s"))
      .count() === 0)
    val afterDiff = Seq((1L, "x")).toDF("id", "s")
    val u = SnapshotDiff.diff(before, afterDiff, Seq("id"), Seq("s")).collect()
    assert(u.length === 1 && u.head.getString(1) === "U")
  }

  test("diff applied to before reproduces after (CDC roundtrip)") {
    val before = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s")
    val after = Seq((2L, "B"), (3L, "c"), (4L, "d")).toDF("id", "s")
    val d = SnapshotDiff.diff(before, after, Seq("id"), Seq("s"))
    val applied = before.join(d.select($"id", $"op", $"new_s"), Seq("id"), "left")
      .where($"op".isNull || $"op" === "U")
      .select($"id", when($"op" === "U", $"new_s").otherwise($"s").as("s"))
      .unionByName(d.where($"op" === "I").select($"id", $"new_s".as("s")))
    assert(applied.exceptAll(after).count() === 0)
    assert(after.exceptAll(applied).count() === 0)
  }
}
