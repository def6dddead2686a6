package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dedup.Dedup

/** Streaming near-dup == batch algebra: the foreachBatch probe-then-
  * add loop must emit exactly the batch-computed MinHash pairs whose
  * sides fall in different `doc_id % batches` batches, probe being the
  * strictly later one. Verifying against `Dedup.minHashPairs` (the
  * self-join form) proves the incremental path loses nothing and adds
  * nothing vs the definition — independent of the DuckDB oracle. */
class NearDupStreamSpec extends SparkSpec {

  import spark.implicits._

  test("probe-then-add stream emits exactly the cross-batch pair set") {
    val batches = 3
    val got = graft.streaming.EventStream
      .nearDupStreamAvailableNow(spark, sf, batches = batches)
      .select(col("probe_id"), col("index_id"), col("jaccard"))
      .as[(Long, Long, Double)].collect().toSet

    val docs = graft.Tables(spark, sf, "documents")
    val expected = Dedup
      .minHashPairs(docs, "doc_id", "text",
        shingleK = 3, numHashes = 32, bands = 8, threshold = 0.8)
      .where(col("id_a") % batches =!= col("id_b") % batches)
      .select(
        when(col("id_a") % batches > col("id_b") % batches, col("id_a"))
          .otherwise(col("id_b")).as("probe_id"),
        when(col("id_a") % batches > col("id_b") % batches, col("id_b"))
          .otherwise(col("id_a")).as("index_id"),
        col("jaccard"))
      .as[(Long, Long, Double)].collect().toSet

    assert(expected.nonEmpty, "fixture has no cross-batch near-dups")
    assert(got === expected)
    spark.catalog.clearCache()
  }

  test("a single batch emits no pairs (nothing indexed before it)") {
    val got = graft.streaming.EventStream
      .nearDupStreamAvailableNow(spark, sf, batches = 1)
    assert(got.count() === 0L)
    spark.catalog.clearCache()
  }
}
