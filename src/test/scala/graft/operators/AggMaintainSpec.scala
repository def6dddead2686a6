package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class AggMaintainSpec extends AnyFunSuite with SparkSpec {

  private def rows(xs: (String, Double)*): DataFrame = {
    import spark.implicits._
    xs.toDF("g", "v")
  }

  private def collect(df: DataFrame) =
    df.select(col("g"), col("n"), col("sum_v").cast("double"),
        col("min_v"), col("max_v"))
      .orderBy("g").collect().map(_.toSeq).toSeq

  test("merge(state(base), state(delta)) == state(base ∪ delta)") {
    val base = rows(("a", 1.5), ("a", 2.5), ("b", 10.0))
    val delta = rows(("a", -1.0), ("c", 7.0))
    val incremental = AggMaintain.merge(
      AggMaintain.state(base, "g", "v"),
      AggMaintain.state(delta, "g", "v"))
    val full = AggMaintain.state(base.unionByName(delta), "g", "v")
    assert(collect(incremental) === collect(full))
  }

  test("folds chain: three delta batches, any grouping") {
    val batches = Seq(rows(("a", 1.0)), rows(("b", 2.0), ("a", 3.0)),
      rows(("b", -4.0)))
    val chained = batches.map(AggMaintain.state(_, "g", "v"))
      .reduce(AggMaintain.merge)
    val full = AggMaintain.state(batches.reduce(_ unionByName _), "g", "v")
    assert(collect(chained) === collect(full))
  }
}
