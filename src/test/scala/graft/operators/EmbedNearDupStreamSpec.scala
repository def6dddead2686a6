package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dedup.SrpDedup

/** Streaming embedding near-dup == batch algebra: the foreachBatch
  * probe-then-add loop must emit exactly the batch-computed SRP pairs
  * whose sides fall in different `id % batches` batches, probe being
  * the strictly later one. Verified against `SrpDedup.srpBandedPairs`
  * (the self-join form) on a planted corpus — proves the incremental
  * path loses nothing and adds nothing vs the definition,
  * independent of the DuckDB oracle. */
class EmbedNearDupStreamSpec extends SparkSpec {

  import spark.implicits._

  private def randomCorpus(n: Int, dims: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, Array.fill(dims)(rnd.nextGaussian())))
  }

  private def perturb(v: Array[Double], eps: Double, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    v.map(x => x + eps * rnd.nextGaussian())
  }

  test("probe-then-add stream emits exactly the cross-batch pair set") {
    val batches = 3
    val dims = 32
    val base = randomCorpus(45, dims, seed = 31L)
    // copy ids ≡ original+1 (mod 3): every planted pair is cross-batch
    val rows = base ++ base.map { case (id, v) =>
      (id + 1000L, perturb(v, eps = 0.1, seed = id)) }
    val df = rows.toDF("id", "v")

    val got = graft.streaming.EventStream
      .embedNearDupStreamAvailableNow(spark, df, "id", "v",
        batches = batches, dims = dims, bands = 8, planesPerBand = 3,
        threshold = 0.9)
      .select(col("probe_id"), col("index_id"), col("cosine"))
      .as[(Long, Long, Double)].collect().toSet

    val expected = SrpDedup
      .srpBandedPairs(df, "id", "v", dims,
        threshold = 0.9, bands = 8, planesPerBand = 3)
      .where(col("id_a") % batches =!= col("id_b") % batches)
      .select(
        when(col("id_a") % batches > col("id_b") % batches, col("id_a"))
          .otherwise(col("id_b")).as("probe_id"),
        when(col("id_a") % batches > col("id_b") % batches, col("id_b"))
          .otherwise(col("id_a")).as("index_id"),
        col("cosine"))
      .as[(Long, Long, Double)].collect().toSet

    assert(expected.nonEmpty, "planted corpus produced no cross-batch pairs")
    assert(got === expected)
    spark.catalog.clearCache()
  }

  test("a single batch emits no pairs (nothing indexed before it)") {
    val df = randomCorpus(20, 16, seed = 5L).toDF("id", "v")
    val got = graft.streaming.EventStream
      .embedNearDupStreamAvailableNow(spark, df, "id", "v",
        batches = 1, dims = 16, bands = 4, planesPerBand = 2,
        threshold = 0.5)
    assert(got.count() === 0L)
    spark.catalog.clearCache()
  }
}
