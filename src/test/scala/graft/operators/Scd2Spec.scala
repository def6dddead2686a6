package graft.operators

import graft.SparkSpec

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  // existing history: key 1 has a closed row + an open row; 2, 3 open
  private def existing = Seq(
    (1L, "A", "2019-01-01", "2020-01-01", false), // closed history
    (1L, "B", "2020-01-01", null, true),
    (2L, "X", "2020-01-01", null, true),
    (3L, "Y", "2020-01-01", null, true)
  ).toDF("id", "attr", "valid_from", "valid_to", "is_current")

  // incoming: 1 changed, 2 unchanged, 4 new; 3 absent
  private def incoming =
    Seq((1L, "C"), (2L, "X"), (4L, "Z")).toDF("id", "attr")

  test("scd2 closes changed, inserts new, keeps unchanged and history") {
    val out = Scd2.merge(existing, incoming, Seq("id"), Seq("attr"),
        effective = "2021-06-01")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        Option(r.getString(3)).orNull, r.getBoolean(4)))
      .toSet
    assert(out === Set(
      (1L, "A", "2019-01-01", "2020-01-01", false), // untouched history
      (1L, "B", "2020-01-01", "2021-06-01", false), // closed by change
      (1L, "C", "2021-06-01", null, true),          // new version
      (2L, "X", "2020-01-01", null, true),          // unchanged
      (3L, "Y", "2020-01-01", null, true),          // absent from delta
      (4L, "Z", "2021-06-01", null, true)           // brand-new key
    ))
  }

  test("assertUniqueKeys passes unique deltas and rejects duplicated keys") {
    Scd2.assertUniqueKeys(incoming, Seq("id")) // no throw
    val dup = incoming.union(Seq((1L, "D")).toDF("id", "attr"))
    val e = intercept[IllegalArgumentException] {
      Scd2.assertUniqueKeys(dup, Seq("id"))
    }
    assert(e.getMessage.contains("1 business key"))
  }

  test("scd2 change detection is null-safe on tracked columns") {
    val ex = Seq((1L, null.asInstanceOf[String], "2020-01-01",
      null.asInstanceOf[String], true))
      .toDF("id", "attr", "valid_from", "valid_to", "is_current")
    // null -> null is NOT a change; null -> value is
    val same = Scd2.merge(ex, Seq((1L, null.asInstanceOf[String])).toDF("id", "attr"),
      Seq("id"), Seq("attr"), "2021-01-01")
    assert(same.count() === 1)
    val diff = Scd2.merge(ex, Seq((1L, "v")).toDF("id", "attr"),
      Seq("id"), Seq("attr"), "2021-01-01")
    assert(diff.count() === 2)
    assert(diff.where("is_current AND attr = 'v'").count() === 1)
  }

  test("scd2 is idempotent: re-applying the same delta changes nothing") {
    val once = Scd2.merge(existing, incoming, Seq("id"), Seq("attr"), "2021-06-01")
    val twice = Scd2.merge(once, incoming, Seq("id"), Seq("attr"), "2021-07-01")
    assert(twice.exceptAll(once).count() === 0)
    assert(once.exceptAll(twice).count() === 0)
  }
}
