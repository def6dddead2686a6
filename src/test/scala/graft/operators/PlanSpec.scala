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

  test("runtime bloom-filter join pruning can be enabled for selective joins") {
    // row-level sibling of DPP: a bloom filter built from the
    // selective side prunes fact rows BEFORE the join shuffle. Off by
    // thresholds at test scale — lowering them proves the plan shape
    // the 100-TB config relies on.
    import org.apache.spark.sql.functions._
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> conf.get(k))
    try {
      conf.set(keys(0), "true")
      conf.set(keys(1), "10GB") // allow tiny creation side
      conf.set(keys(2), "0")    // allow tiny application side
      conf.set(keys(3), "-1")   // broadcast-able joins skip injection
      val fact = graft.Tables(spark, sf, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"))
      val dim = graft.Tables(spark, sf, "orders")
        .where(col("o_totalprice") > 200000)
        .select(col("o_orderkey"))
      val joined = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      val p = joined.queryExecution.optimizedPlan.toString
      assert(p.contains("bloom_filter") || p.contains("BloomFilter"),
        p.take(800))
      assert(joined.count() > 0)
    } finally saved.foreach { case (k, v) => conf.set(k, v) }
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
