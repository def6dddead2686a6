package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class GlobalRankSpec extends SparkSpec {
  import spark.implicits._

  test("distributed rank equals single-partition row_number") {
    val df = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey"), col("c_name"))
    val expected = df.withColumn("rn",
      row_number().over(Window.orderBy(col("c_name"), col("c_custkey")))
        .cast("long"))
      .select(col("c_custkey"), col("rn"))
    val got = GlobalRank.globalRowNumber(df,
      Seq(col("c_name"), col("c_custkey")), partitions = 7)
      .select(col("c_custkey"), col("rn"))
    assert(got.except(expected).isEmpty && expected.except(got).isEmpty)
  }

  test("rank is dense 1..n with no duplicates") {
    val df = spark.read.parquet(s"$sf/supplier.parquet")
    val n = df.count()
    val ranks = GlobalRank.globalRowNumber(df,
      Seq(col("s_name"), col("s_suppkey")), partitions = 5)
      .select(col("rn")).as[Long].collect().sorted
    assert(ranks.toSeq == (1L to n).toSeq)
  }

  test("sortedNeighborhood emits exactly the within-window pairs once") {
    val df = Seq((10L, "a"), (20L, "b"), (30L, "c"), (40L, "d"),
      (50L, "e")).toDF("id", "k")
    val pairs = GlobalRank.sortedNeighborhood(df, "id",
      Seq(col("k")), window = 2, partitions = 3)
      .as[(Long, Long, Long)].collect().toSet
    val expected = Set(
      (10L, 20L, 1L), (10L, 30L, 2L), (20L, 30L, 1L), (20L, 40L, 2L),
      (30L, 40L, 1L), (30L, 50L, 2L), (40L, 50L, 1L))
    assert(pairs == expected)
  }

  test("the corpus-side window is partitioned, not global") {
    val df = spark.read.parquet(s"$sf/customer.parquet")
    val plan = GlobalRank.globalRowNumber(df,
      Seq(col("c_name"), col("c_custkey")))
      .queryExecution.executedPlan.toString
    // the data-sized window must run per __pid partition; the only
    // unpartitioned window is the ≤`partitions`-row offsets frame
    assert(plan.contains("RangePartitioning") ||
      plan.contains("rangepartitioning"),
      s"expected a range exchange in:\n$plan")
    val globalWindows = plan.linesIterator
      .filter(l => l.contains("Window") && l.contains("row_number"))
      .filterNot(_.contains("__pid")).size
    assert(globalWindows == 0,
      s"data-sized window not keyed by __pid in:\n$plan")
  }
}
