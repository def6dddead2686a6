package org.apache.spark.sql.execution

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Regression canary for the r16 checkpoint-stats bomb (requested by
  * the r16 advice): `sanitize` pattern-matches the EXACT LogicalRDD
  * shape Spark 4.1.2's localCheckpoint produces, so a Spark upgrade
  * that changes the plan shape (or the internal constructor) would
  * make it silently no-op and quietly reintroduce the per-round
  * BigInteger stats blowup. This spec self-validates in two halves:
  * the BARE chain proves the fixture is genuinely bomb-shaped (the
  * inherited estimate really does cross the cap), and the sanitized
  * chain proves the shim defuses it — if an upgrade breaks the
  * pattern match, the second half fails loudly. */
class GraftCheckpointStatsSpec extends AnyFunSuite with SparkSpec {

  private def base: DataFrame = {
    import spark.implicits._
    (1 to 40).map(i => (i.toLong % 7, i.toLong)).toDF("k", "v")
  }

  /** One multiplicative round: the previous checkpoint joined with
    * itself (size estimates MULTIPLY through joins), folded back to
    * 7 rows so the data stays trivial while the estimate explodes. */
  private def round(prev: DataFrame): DataFrame =
    prev.as("a").join(prev.as("b"), "k")
      .select(col("k"), (col("a.v") + col("b.v")).as("v"))
      .groupBy("k").agg(sum(col("v")).as("v"))

  test("a bare multiplicative checkpoint chain DOES cross the cap " +
      "(the fixture is bomb-shaped)") {
    var df = base
    for (_ <- 1 to 10)
      df = round(df).localCheckpoint()
    assert(df.queryExecution.analyzed.stats.sizeInBytes >
      GraftCheckpointStats.DefaultCap,
      "the bare chain no longer explodes the inherited estimate — " +
        "the regression fixture has gone stale (Spark stats change?)")
  }

  test("the sanitized chain stays bounded and keeps the RDD, " +
      "partitioning, and ordering") {
    var df = base
    for (r <- 1 to 10) {
      df = graft.operators.Converge
        .checkpointWithSig(round(df).repartition(3, col("k")), "k, v")._1
      val got = df.queryExecution.analyzed.stats.sizeInBytes
      assert(got <= GraftCheckpointStats.DefaultCap,
        s"round $r: inherited sizeInBytes $got escaped the sanitizer — " +
          "GraftCheckpointStats.sanitize is no-opping (plan shape or " +
          "LogicalRDD constructor changed under a Spark upgrade?)")
    }
    // the sanitized frame is still the pinned LogicalRDD shape with
    // the SAME underlying RDD, partitioning, and ordering — sanitize
    // must drop only the stats, never the exchange-reuse metadata
    val dirty = round(df).repartition(3, col("k")).localCheckpoint()
    val l = dirty.queryExecution.analyzed.asInstanceOf[LogicalRDD]
    val clean = GraftCheckpointStats.sanitize(dirty)
      .queryExecution.analyzed.asInstanceOf[LogicalRDD]
    assert(clean.rdd eq l.rdd)
    assert(clean.outputPartitioning === l.outputPartitioning)
    assert(clean.outputOrdering === l.outputOrdering)
    assert(clean.output === l.output)
    // and the data itself is untouched
    assert(GraftCheckpointStats.sanitize(dirty).orderBy("k").collect()
      === dirty.orderBy("k").collect())
  }
}
