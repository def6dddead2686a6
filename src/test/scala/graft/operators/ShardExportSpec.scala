package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sinks.Sinks

class ShardExportSpec extends SparkSpec {

  test("shardedExport writes one directory per shard plus a matching manifest") {
    val docs = graft.Tables(spark, sf, "documents").select(col("doc_id"))
    val out = Files.createTempDirectory("shards").toString + "/out"
    val manifest = Sinks.shardedExport(docs, "doc_id", out, shards = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(manifest.values.sum === docs.count())
    // shard dirs on disk match the manifest exactly
    val back = spark.read.parquet(out)
    val onDisk = back.groupBy(col("shard_id")).count()
      .collect().map(r => r.getAs[Number]("shard_id").longValue ->
        r.getLong(1)).toMap
    assert(onDisk === manifest)
    // determinism: re-deriving the assignment moves no row
    val again = Sinks.shardAssignment(docs, "doc_id", 4)
      .groupBy(col("shard_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again === manifest)
  }

  test("jsonlExport round-trips gzip JSONL shards with a manifest") {
    val docs = graft.Tables(spark, sf, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
    val out = Files.createTempDirectory("jsonl").toString + "/out"
    val manifest = Sinks.jsonlExport(docs, "doc_id", out, shards = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(manifest.values.sum === docs.count())
    // the JSONL shards round-trip: same rows, same shard split
    val back = spark.read.json(out)
    assert(back.count() === docs.count())
    val onDisk = back.groupBy(col("shard_id")).count()
      .collect().map(r => r.getAs[Number]("shard_id").longValue ->
        r.getLong(1)).toMap
    assert(onDisk === manifest)
    // content survives the trip (ids + text join back 1:1)
    val joined = back.select(col("doc_id"), col("text").as("t2"))
      .join(docs, Seq("doc_id"))
      .where(col("t2") === col("text"))
    assert(joined.count() === docs.count())
    // gzip actually applied (ignore Hadoop .crc sidecars)
    val files = new java.io.File(out).listFiles().filter(_.isDirectory)
      .flatMap(_.listFiles()).map(_.getName)
      .filter(n => n.startsWith("part-") && !n.endsWith(".crc"))
    assert(files.nonEmpty && files.forall(_.endsWith(".json.gz")))
  }
}
