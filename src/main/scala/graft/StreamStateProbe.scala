package graft

import org.apache.spark.sql.SparkSession

/** State-size measurement for the streaming-dedup family (round-11
  * scale adjudication): runs [[streaming.EventStream.dedupStateProbe]]
  * over a given fixture dir for the four (unbounded|watermark-bounded)
  * × (in-memory|RocksDB) combinations and prints ONE JSON line with
  * output rows and final state rows per combo — the reproducible
  * source for the BASELINE.md state-bound adjudication.
  *
  * Usage: `runMain graft.StreamStateProbe <sfDir>` (default sf0.1;
  * point it at an amplified `target/scale/sf10` dir for the
  * 10M-event figure). Env: SPARK_GRAFT_CPUS.
  */
object StreamStateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val combos = Seq(
      ("unbounded_mem", false, false),
      ("unbounded_rocksdb", false, true),
      ("watermark_mem", true, false),
      ("watermark_rocksdb", true, true))
    val results = combos.map { case (label, wm, rdb) =>
      val t0 = System.nanoTime()
      val (out, state) = streaming.EventStream.dedupStateProbe(
        spark, sfDir, withinWatermark = wm, rocksdb = rdb,
        queryName = s"probe_$label")
      val secs = (System.nanoTime() - t0) / 1e9
      System.err.println(
        f"[state-probe] $label%-18s out=$out%d state=$state%d ($secs%.1f s)")
      s""""$label":{"output_rows":$out,"state_rows":$state,"secs":${f"$secs%.3f"}}"""
    }
    // the TTL'd shape (q_stream_dedup_ttl): processing-time bound —
    // a TTL shorter than the inter-batch gap evicts batch-1 keys
    // before batch 2 commits, so final state tracks the newest
    // batch's keys even under an unbounded key space
    val ttlResults = Seq(
      ("ttl_1ms", java.time.Duration.ofMillis(1)),
      ("ttl_1h", java.time.Duration.ofHours(1))).map { case (label, ttl) =>
      val t0 = System.nanoTime()
      val (out, state) = streaming.EventStream.dedupTtlStateProbe(
        spark, sfDir, ttl, queryName = s"probe_$label")
      val secs = (System.nanoTime() - t0) / 1e9
      System.err.println(
        f"[state-probe] $label%-18s out=$out%d state=$state%d ($secs%.1f s)")
      s""""$label":{"output_rows":$out,"state_rows":$state,"secs":${f"$secs%.3f"}}"""
    }
    println(s"""{"sf":"$sfDir",${(results ++ ttlResults).mkString(",")}}""")
    spark.stop()
  }
}
