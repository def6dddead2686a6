package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Privacy
import graft.validate.Expectations
import graft.validate.Expectations._

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private def people = Seq(
    (1L, "alice", 30, "F"),
    (2L, "bob", -5, "M"),
    (3L, null.asInstanceOf[String], 40, "X"),
    (4L, "dora", 200, "F")
  ).toDF("id", "name", "age", "sex")

  test("audit counts violations per constraint in one pass") {
    val out = Expectations.audit(people, Seq(
        notNull("name"),
        inRange("age", 0, 150),
        oneOf("sex", Seq("F", "M")),
        matches("name", "^[a-z]+$")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toSet
    assert(out === Set(
      ("not_null(name)", 4L, 1L, false),
      ("in_range(age)", 4L, 2L, false),     // -5 and 200
      ("one_of(sex)", 4L, 1L, false),       // X
      ("matches(name)", 4L, 1L, false)))    // null fails the regex too
  }

  test("audit is a single aggregation: no join or generate of data rows") {
    val plan = Expectations.audit(people, Seq(notNull("name")))
      .queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("join"), plan)
  }

  test("audit rejects duplicate constraint names") {
    intercept[IllegalArgumentException] {
      Expectations.audit(people, Seq(notNull("name"), notNull("name")))
    }
  }

  test("uniqueness reports duplicate keys and rows") {
    val df = Seq(1L, 2L, 2L, 3L, 3L, 3L).toDF("k")
    val r = Expectations.uniqueness(df, Seq("k")).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((6L, 3L, 2L, 5L)))
  }

  test("profile reports nulls and distincts per column") {
    val out = Expectations.profile(people, Seq("name", "sex"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(out === Set(("name", 4L, 1L, 3L), ("sex", 4L, 0L, 3L)))
  }

  test("pseudonymize is deterministic, keyed, and null-preserving") {
    val out = people.select(Privacy.pseudonymize(col("name"), "k1").as("a"),
        Privacy.pseudonymize(col("name"), "k1").as("b"),
        Privacy.pseudonymize(col("name"), "k2").as("c"))
      .collect()
    out.foreach { r =>
      if (r.isNullAt(0)) { assert(r.isNullAt(1) && r.isNullAt(2)) }
      else {
        assert(r.getString(0) === r.getString(1)) // same key → same token
        assert(r.getString(0) !== r.getString(2)) // different key → different
        assert(r.getString(0).matches("[0-9a-f]{64}"))
      }
    }
  }

  test("maskKeepLast keeps short values unchanged and masks long ones") {
    val out = Seq("abcdef", "abc").toDF("s")
      .select(Privacy.maskKeepLast(col("s"), 4).as("m"))
      .as[String].collect().toSet
    assert(out === Set("**cdef", "abc"))
  }

  test("histogram clamps out-of-range values into edge bins") {
    val df = Seq(-5.0, 0.0, 9.9, 10.0, 25.0, 99.0).toDF("x")
    val out = Expectations.histogram(df, "x", 0.0, 30.0, 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      .toSeq
    assert(out === Seq((0L, 0.0, 3L), (1L, 10.0, 1L), (2L, 20.0, 2L)))
  }

  test("band coarsens to the lower band edge") {
    val out = Seq(-1500.0, 0.0, 999.99, 1000.0).toDF("x")
      .select(Privacy.band(col("x"), 1000.0).as("b"))
      .as[Double].collect().toSeq
    assert(out === Seq(-2000.0, 0.0, 0.0, 1000.0))
  }

  test("lDiversityViolations flags homogeneous classes only") {
    // class A: 3 rows, all sensitive=x (l=1) → violation at l=2
    // class B: 3 rows, sensitive {x, y} (l=2) → clean
    val rows = Seq(
      ("A", "x"), ("A", "x"), ("A", "x"),
      ("B", "x"), ("B", "y"), ("B", "x")).toDF("qid", "s")
    val out = Privacy.lDiversityViolations(rows, Seq("qid"), "s", l = 2)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("qid") == "A")
    assert(r.getAs[Long]("class_size") == 3L)
    assert(r.getAs[Long]("l_distinct") == 1L)
    assert(r.getAs[Long]("top_freq") == 3L)
  }

  test("lDiversityViolations is empty when every class is diverse") {
    val rows = Seq(("A", "x"), ("A", "y"), ("B", "x"), ("B", "z"))
      .toDF("qid", "s")
    assert(Privacy.lDiversityViolations(rows, Seq("qid"), "s", 2).isEmpty)
  }
}
