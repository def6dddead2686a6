package graft.operators

import graft.SparkSpec
import graft.streaming.EventStream

/** The state-bound story behind the streaming-dedup pair, measured:
  * `dropDuplicates` keeps one state row per key forever (state =
  * distinct keys), `dropDuplicatesWithinWatermark` keeps only keys
  * whose event-time horizon is still ahead of the watermark — under
  * the split two-batch replay the fixture's 30-day span vs the 1-hour
  * delay makes eviction visible while output stays exactly-once for
  * both. The RocksDB provider changes memory residency, never counts.
  */
class StreamStateProbeSpec extends SparkSpec {

  private lazy val distinctIds =
    spark.read.parquet(s"$sf/events.parquet")
      .select("event_id").distinct().count()

  test("unbounded dedup retains every key; watermark bounds state to the horizon") {
    val (outU, stateU) = EventStream.dedupStateProbe(spark, sf,
      withinWatermark = false, rocksdb = false, queryName = "probe_spec_u")
    val (outW, stateW) = EventStream.dedupStateProbe(spark, sf,
      withinWatermark = true, rocksdb = false, queryName = "probe_spec_w")
    // both variants emit exactly-once per key
    assert(outU === distinctIds)
    assert(outW === distinctIds)
    // unbounded state = full key history
    assert(stateU === distinctIds)
    // bounded state: only keys within ~2x the delay of max event time
    // survive the batch-2 eviction (30-day span vs 1-hour delay)
    assert(stateW > 0L && stateW < stateU / 10,
      s"expected watermark eviction to bound state, got $stateW of $stateU")
  }

  test("TTL dedup: exactly-once output, eviction bounds state") {
    // the probe stages an UNBOUNDED-key-space replay: 8 key-disjoint
    // chunks, each holding its keys' both deliveries, one chunk per
    // micro-batch — so output is exactly-once for any TTL longer than
    // one batch, and final state shows the bound. Generous TTL:
    // nothing expires, state accumulates the full key history.
    val (outL, stateL) = EventStream.dedupTtlStateProbe(spark, sf,
      java.time.Duration.ofHours(1), queryName = "probe_spec_ttl_long")
    assert(outL === distinctIds)
    assert(stateL === distinctIds)
    // 1 ms TTL: each batch's keys expire before the next commits —
    // final state tracks the newest batch (~1/8 of the key space),
    // not the key history
    val (outS, stateS) = EventStream.dedupTtlStateProbe(spark, sf,
      java.time.Duration.ofMillis(1), queryName = "probe_spec_ttl_short")
    assert(outS === distinctIds)
    assert(stateS < distinctIds / 4,
      s"expected TTL eviction to bound state, got $stateS of $distinctIds")
  }

  test("TTL dedup single-batch gate shape is exactly-once") {
    val out = EventStream.dedupTtlProcessAll(spark, sf,
      queryName = "ttl_gate_spec")
    assert(out.count() === distinctIds)
    assert(out.select("event_id").distinct().count() === distinctIds)
  }

  test("drain refuses a non-positive expected-row count") {
    // expectedRows == 0 used to skip the poll loop and return null,
    // and callers dereference the returned progress — an empty staged
    // fixture must fail loudly, not NPE downstream
    val e = intercept[IllegalArgumentException] {
      EventStream.drainStagedRows(null, 0L)
    }
    assert(e.getMessage.contains("empty staged fixture"))
  }

  test("RocksDB provider reproduces the in-memory counts exactly") {
    val (outR, stateR) = EventStream.dedupStateProbe(spark, sf,
      withinWatermark = true, rocksdb = true, queryName = "probe_spec_r")
    val (outM, stateM) = EventStream.dedupStateProbe(spark, sf,
      withinWatermark = true, rocksdb = false, queryName = "probe_spec_m")
    assert(outR === outM)
    assert(stateR === stateM)
  }
}
