package graft.operators

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.plans.PlanLint

class PlanLintSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir = Files.createTempDirectory("lint").toString

  test("flags a cartesian / unconditioned nested-loop product") {
    val a = (1 to 10).toDF("x")
    val b = (1 to 10).toDF("y")
    val rules = PlanLint.lint(a.crossJoin(b)).map(_.rule).toSet
    assert(rules.contains("cartesian-product") ||
      rules.contains("unconditioned-nested-loop"), rules)
    intercept[IllegalArgumentException] {
      PlanLint.enforce(a.crossJoin(b))
    }
  }

  test("clean equi-join with pushed filter has no findings") {
    val p = s"$dir/t1"
    (1L to 100L).map(i => (i, s"v$i")).toDF("id", "v")
      .write.mode("overwrite").parquet(p)
    val t = spark.read.parquet(p)
    val q = t.where(col("id") > 50).join(t.select(col("id")), Seq("id"))
    assert(PlanLint.lint(q).isEmpty)
    PlanLint.enforce(q) // no throw
  }

  test("flags a scan whose filter could not be pushed down") {
    val p = s"$dir/t2"
    (1L to 100L).map(i => (i, s"v$i")).toDF("id", "v")
      .write.mode("overwrite").parquet(p)
    // wrapping the column in an expression defeats parquet pushdown
    val q = spark.read.parquet(p).where(length(col("v")) > 3)
    val rules = PlanLint.lint(q).map(_.rule)
    assert(rules.contains("scan-without-pushed-filters"), rules)
  }

  test("flags a single-partition exchange; smallSort is the known case") {
    val q = Spread.smallSort((1 to 100).toDF("x"), col("x"))
    assert(PlanLint.lint(q).map(_.rule)
      .contains("single-partition-exchange"))
  }

  test("installed listener observes lint findings on executed queries") {
    val buf = PlanLint.install(spark)
    val a = (1 to 5).toDF("x")
    a.crossJoin((1 to 5).toDF("y")).collect()
    // listener callbacks are async on the bus thread — poll briefly
    val deadline = System.currentTimeMillis() + 10000
    while (buf.isEmpty && System.currentTimeMillis() < deadline)
      Thread.sleep(50)
    val rules = buf.iterator().asScala.map(_.finding.rule).toSet
    assert(rules.contains("cartesian-product") ||
      rules.contains("unconditioned-nested-loop"), rules)
  }

  test("codegenCoverage is high for a simple agg and in [0,1]") {
    val c = PlanLint.codegenCoverage(
      (1 to 100).toDF("x").groupBy(col("x") % 10).count())
    assert(c >= 0.0 && c <= 1.0)
    assert(c > 0.5, s"coverage $c")
  }
}
