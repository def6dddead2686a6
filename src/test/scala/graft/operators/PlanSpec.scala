package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkSpec}

/** Physical-plan shape assertions: the optimizations the engine claims
  * (scan pushdown, broadcast dimension joins, codegen'd pair
  * verification, no accidental cross products) must be visible in the
  * executed plans, not just intended. */
class PlanSpec extends AnyFunSuite with SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q_filters predicates reach the parquet scan") {
    val p = plan("q_filters")
    assert(p.contains("PushedFilters: ["), p.take(500))
    assert(p.contains("In(l_returnflag"), p.take(500))
  }

  test("q_filters scan reads only referenced columns") {
    val p = plan("q_filters")
    // ReadSchema must not include unprojected wide columns
    assert(p.contains("ReadSchema"))
    assert(!p.contains("l_comment"))
  }

  test("q_join_inner broadcasts the nation dimension") {
    assert(plan("q_join_inner").contains("BroadcastHashJoin"))
  }

  test("q_dedup_ngram verifies pairs with the codegen'd intersect") {
    assert(plan("q_dedup_ngram").contains("sorted_intersect_size"))
  }

  test("q1_agg aggregates partially before the shuffle (map-side combine)") {
    assert(plan("q1_agg").contains("partial_sum"))
  }

  test("q_asof_join is a windowed union, not an inequality join") {
    val p = plan("q_asof_join")
    assert(p.contains("Window"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q_range_join equi-joins on the bin id, not a nested loop") {
    assert(!plan("q_range_join").contains("BroadcastNestedLoopJoin"))
  }

  test("no query plans a cartesian product") {
    // brute-force knn intentionally scores query x corpus, but via a
    // broadcast nested-loop join of the tiny query side — never a
    // shuffled cartesian product
    for ((name, fn) <- SparkEntry.queries) {
      val p = fn(spark, sf).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$name plans a cartesian product")
    }
  }

  test("dynamic partition pruning fires on a partitioned fact join") {
    // the 100-TB table layout: facts partitioned on the join/filter
    // key must let a selective dim filter prune fact partitions AT
    // RUNTIME — scanning all partitions to honor a 3-row dim filter
    // is the canonical large-table mistake
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-dpp")
    try {
      graft.Tables(spark, sf, "orders")
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
        .write.mode("overwrite").partitionBy("o_orderstatus")
        .parquet(dir.toString)
      val fact = spark.read.parquet(dir.toString)
      // the filter sits on a NON-join dim column: a literal filter on
      // the join key itself would be statically pushed through the
      // join by constraint propagation (no runtime pruning needed) —
      // here only DPP can avoid the full fact scan. The dim must be a
      // FILE scan: an in-memory dim gets its filter constant-folded
      // into the LocalRelation, leaving no selective predicate for
      // the DPP planner to see.
      import spark.implicits._
      Seq(("F", 1), ("O", 2), ("P", 3)).toDF("st", "pri")
        .write.mode("overwrite").parquet(s"$dir.dim")
      val dim = spark.read.parquet(s"$dir.dim").where(col("pri") === 1)
      val joined = fact.join(dim, col("o_orderstatus") === col("st"))
        .groupBy(col("o_orderstatus")).count()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("dynamicpruning"), p.take(800))
      assert(joined.count() === 1)
    } finally {
      import scala.jdk.CollectionConverters._
      Seq(dir, java.nio.file.Paths.get(s"$dir.dim"))
        .filter(java.nio.file.Files.exists(_))
        .foreach(d => java.nio.file.Files.walk(d).iterator().asScala.toSeq
          .reverse.foreach(java.nio.file.Files.deleteIfExists(_)))
    }
  }
}
