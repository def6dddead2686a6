package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.functions.KthLargest

class FuzzyKthSpec extends AnyFunSuite with SparkSpec {

  test("FuzzyJoin.selfPairs equals the brute-force cross join") {
    import spark.implicits._
    val names = Seq((1L, "alpha"), (2L, "alphb"), (3L, "alphabet"),
      (4L, "beta"), (5L, "betas"), (6L, "zeta"), (7L, "al"),
      (8L, "") , (9L, "a")).toDF("id", "name")
    val got = FuzzyJoin.selfPairs(names, "id", "name", maxDist = 2)
      .orderBy("id_a", "id_b").as[(Long, Long, Int)].collect().toSeq
    val brute = names.alias("a").join(names.alias("b"),
        col("a.id") < col("b.id") &&
          levenshtein(col("a.name"), col("b.name")) <= 2)
      .select(col("a.id"), col("b.id"),
        levenshtein(col("a.name"), col("b.name")))
      .orderBy(col("a.id"), col("b.id")).as[(Long, Long, Int)].collect().toSeq
    assert(got === brute)
    assert(got.nonEmpty)
  }

  test("FuzzyJoin blocking catches pairs that straddle a bucket edge") {
    import spark.implicits._
    // lengths 3 and 5 with maxDist=2: buckets differ by exactly 1
    val df = Seq((1L, "abc"), (2L, "abcde")).toDF("id", "name")
    val got = FuzzyJoin.selfPairs(df, "id", "name", maxDist = 2)
      .as[(Long, Long, Int)].collect().toSeq
    assert(got === Seq((1L, 2L, 2)))
  }

  test("FuzzyJoin plans no cartesian product") {
    import spark.implicits._
    val df = Seq((1L, "abc"), (2L, "abd")).toDF("id", "name")
    val plan = FuzzyJoin.selfPairs(df, "id", "name", maxDist = 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }

  test("KthLargest matches full-sort ground truth, duplicates counted") {
    import spark.implicits._
    val vals = Seq(5.0, 3.0, 9.0, 9.0, 1.0, 7.0, 3.0, 8.0, 2.0, 6.0,
      4.0, 9.0)
    val df = vals.zipWithIndex.map { case (v, i) => (i % 2, v) }
      .toDF("grp", "v")
    val k = 3
    val got = df.groupBy($"grp").agg(KthLargest(k)($"v").as("kth"))
      .orderBy($"grp").as[(Int, Double)].collect().toMap
    val want = vals.zipWithIndex.groupBy(_._2 % 2).map { case (g, vs) =>
      val sorted = vs.map(_._1).sorted.reverse
      g -> sorted(math.min(k, sorted.size) - 1)
    }
    assert(got === want)
  }

  test("KthLargest on a group smaller than k returns the minimum") {
    import spark.implicits._
    val df = Seq((0, 5.0), (0, 2.0)).toDF("grp", "v").repartition(3)
    val got = df.groupBy($"grp").agg(KthLargest(10)($"v").as("kth"))
      .as[(Int, Double)].collect().toSeq
    assert(got === Seq((0, 2.0)))
  }

  test("KthLargest merge across many partitions is order-independent") {
    import spark.implicits._
    val df = spark.range(1000).select(lit(0).as("grp"),
      (pmod(col("id") * 2654435761L, lit(1000)).cast("double")).as("v"))
      .repartition(32)
    val got = df.groupBy($"grp").agg(KthLargest(10)($"v").as("kth"))
      .as[(Int, Double)].collect().head._2
    // v is a permutation of 0..999 → 10th largest = 990
    assert(got === 990.0)
  }

  test("KthLargest plans map-side partial aggregation (bounded state)") {
    import spark.implicits._
    val df = Seq((0, 1.0), (0, 2.0)).toDF("grp", "v").repartition(2)
    val plan = df.groupBy($"grp").agg(KthLargest(2)($"v").as("kth"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"))
    assert(plan.contains("partial_kthlargest") ||
      plan.toLowerCase.contains("partial"))
  }
}
