package graft.operators

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.SparkSpec
import graft.streaming.EventStream

class Scd2StreamSpec extends SparkSpec {
  import spark.implicits._

  private def writeBatch(rows: Seq[(Long, String, String)], stage: Path,
                         name: String, mtime: Long): Unit = {
    val tmp = Files.createTempDirectory("scd2s-one")
    rows.toDF("id", "attr", "event_date").coalesce(1)
      .write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).iterator().asScala
      .find(_.toString.endsWith(".parquet")).get
    val dest = stage.resolve(name)
    Files.copy(part, dest)
    assert(dest.toFile.setLastModified(mtime))
  }

  test("foreachBatch stream merges CDC batches into SCD2 history") {
    val stage = Files.createTempDirectory("scd2s-stage")
    val hist = Files.createTempDirectory("scd2s-hist")
      .resolve("history").toString
    val ckpt = Files.createTempDirectory("scd2s-ckpt").toString
    // batch 1: keys 1, 2 appear (key 1 twice — latest wins in-batch)
    writeBatch(Seq((1L, "stale", "2021-01-01"), (1L, "A", "2021-01-02"),
      (2L, "X", "2021-01-02")), stage, "b1.parquet", 100000)
    // batch 2: key 1 changes, key 2 unchanged, key 3 new
    writeBatch(Seq((1L, "B", "2021-02-01"), (2L, "X", "2021-02-01"),
      (3L, "Z", "2021-02-01")), stage, "b2.parquet", 200000)
    val schema = new StructType().add("id", LongType)
      .add("attr", StringType).add("event_date", StringType)

    EventStream.scd2Sink(spark, stage.toString, schema, hist, ckpt,
      keys = Seq("id"), tracked = Seq("attr"),
      orderCol = "event_date", effectiveCol = "event_date")

    val out = spark.read.parquet(hist).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        Option(r.getString(3)).orNull, r.getBoolean(4))).toSet
    assert(out === Set(
      (1L, "A", "2021-01-02", "2021-02-01", false), // closed by change
      (1L, "B", "2021-02-01", null, true),
      (2L, "X", "2021-01-02", null, true),          // unchanged
      (3L, "Z", "2021-02-01", null, true)))

    // replaying the SAME source with a fresh checkpoint is idempotent:
    // unchanged attrs keep rows, the changed key's history is stable
    val ckpt2 = Files.createTempDirectory("scd2s-ckpt2").toString
    EventStream.scd2Sink(spark, stage.toString, schema, hist, ckpt2,
      keys = Seq("id"), tracked = Seq("attr"),
      orderCol = "event_date", effectiveCol = "event_date")
    val replay = spark.read.parquet(hist).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        Option(r.getString(3)).orNull, r.getBoolean(4))).toSet
    assert(replay === out)
  }
}
