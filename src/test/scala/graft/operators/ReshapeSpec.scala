package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ReshapeSpec extends SparkSpec {
  import spark.implicits._

  private def long = Seq(
    ("a", "x", 1.0), ("a", "x", 2.0), ("a", "y", 10.0),
    ("b", "x", 5.0) // (b, y) absent → NULL cell after pivot
  ).toDF("k", "p", "v")

  test("pivotSum spreads values into prefixed columns") {
    val wide = Reshape.pivotSum(long, Seq("k"), "p", Seq("x", "y"),
      col("v"), prefix = "v")
    assert(wide.columns.toSeq === Seq("k", "v_x", "v_y"))
    val rows = wide.collect()
      .map(r => (r.getString(0), Option(r.get(1)).orNull,
        Option(r.get(2)).orNull)).toSet
    assert(rows === Set(("a", 3.0, 10.0), ("b", 5.0, null)))
  }

  test("unpivot(pivot) roundtrips, with NULL rows for absent combos") {
    val wide = Reshape.pivotSum(long, Seq("k"), "p", Seq("x", "y"),
      col("v"), prefix = "v")
    val back = Reshape.unpivot(wide, Seq("k"), Seq("v_x", "v_y"), "p", "v")
      .select($"k", regexp_replace($"p", "^v_", "").as("p"), $"v")
    val expected = long.groupBy($"k", $"p").agg(sum($"v").as("v"))
      .unionByName(Seq(("b", "y", null.asInstanceOf[java.lang.Double]))
        .toDF("k", "p", "v"))
    assert(back.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(back).count() === 0)
  }

  test("unpivot plans as Expand and adds no shuffle of its own") {
    val wide = Reshape.pivotSum(long, Seq("k"), "p", Seq("x", "y"),
      col("v"), prefix = "v")
    def exchanges(plan: String) = plan.split("Exchange").length - 1
    val widePlan = wide.queryExecution.executedPlan.toString
    val longPlan = Reshape.unpivot(wide, Seq("k"), Seq("v_x", "v_y"), "p", "v")
      .queryExecution.executedPlan.toString
    assert(longPlan.contains("Expand"))
    assert(exchanges(longPlan) === exchanges(widePlan), longPlan)
  }
}
