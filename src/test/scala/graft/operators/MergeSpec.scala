package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def ex = Seq(
    (1L, "old-a", 10.0), (2L, "old-b", 20.0), (3L, "old-c", 30.0)
  ).toDF("k", "status", "price")

  test("upsert: matched rows take incoming values, unmatched survive, new insert") {
    val in = Seq((2L, "NEW", 99.0), (9L, "INS", 1.0)).toDF("k", "status", "price")
    val out = Merge.upsert(ex, in, Seq("k")).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(out == Seq((1L, "old-a", 10.0), (2L, "NEW", 99.0),
      (3L, "old-c", 30.0), (9L, "INS", 1.0)))
  }

  test("upsert: incoming NULL keeps existing unless column is a refreshCol") {
    val in = Seq((2L, null.asInstanceOf[String], 99.0)).toDF("k", "status", "price")
    val keep = Merge.upsert(ex, in, Seq("k")).where($"k" === 2)
      .collect().head.getString(1)
    assert(keep == "old-b") // coalesce: old survives a NULL
    val refreshed = Merge.upsert(ex, in, Seq("k"), refreshCols = Set("status"))
      .where($"k" === 2).collect().head
    assert(refreshed.isNullAt(1)) // null-refresh: incoming NULL wins
  }

  test("upsert broadcastIncoming plans a broadcast join") {
    val in = Seq((2L, "NEW", 99.0)).toDF("k", "status", "price")
    val plan = Merge.upsert(ex, in, Seq("k"), broadcastIncoming = true)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"))
  }

  test("newerThanWatermark filters strictly-newer, passes all when target empty") {
    val src = Seq((1L, 100L), (2L, 200L), (3L, 300L)).toDF("id", "ts")
    val tgt = Seq((0L, 200L)).toDF("id", "ts")
    val got = Merge.newerThanWatermark(src, tgt, "ts")
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == Seq(3L))
    val empty = tgt.where(lit(false))
    val all = Merge.newerThanWatermark(src, empty, "ts")
      .select("id").as[Long].collect().sorted.toSeq
    assert(all == Seq(1L, 2L, 3L))
  }

  test("upsert treats NULL keys null-safely in both join strategies") {
    val ex = Seq((Some(1L), "e1"), (None, "eN")).toDF("k", "v")
    val nw = Seq((Some(1L), "n1"), (None, "nN")).toDF("k", "v")
    for (bcast <- Seq(false, true)) {
      val out = Merge.upsert(ex, nw, Seq("k"), broadcastIncoming = bcast)
        .collect().map(r => (Option(r.get(0)), r.getString(1))).toSeq.sortBy(_._2)
      // NULL key matches NULL key: updated once, never duplicated
      assert(out === Seq((Some(1L), "n1"), (None, "nN")),
        s"broadcastIncoming=$bcast")
    }
  }

  test("upsertPartitionScoped rewrites only touched partitions") {
    val dir = java.nio.file.Files.createTempDirectory("psc").toString + "/t"
    Seq((1L, "2024-01", "a"), (2L, "2024-01", "b"), (3L, "2024-02", "c"))
      .toDF("k", "dt", "v")
      .write.partitionBy("dt").parquet(dir)
    def filesOf(part: String) = {
      val d = new java.io.File(s"$dir/dt=$part")
      d.listFiles().filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    }
    val before01 = filesOf("2024-01")
    // incoming touches 2024-02 (update) and 2024-03 (new partition)
    val incoming = Seq((3L, "2024-02", "C2"), (9L, "2024-03", "z"))
      .toDF("k", "dt", "v")
    Merge.upsertPartitionScoped(spark, dir, incoming, Seq("k"), "dt")
    // untouched partition keeps its exact files (no rewrite)
    assert(filesOf("2024-01") === before01)
    val out = spark.read.parquet(dir)
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("v"))).toSet
    assert(out === Set((1L, "a"), (2L, "b"), (3L, "C2"), (9L, "z")))
  }

  test("promoteStaging replaces keyed rows and appends new") {
    val tgt = Seq((1L, "t1"), (2L, "t2")).toDF("k", "v")
    val stg = Seq((2L, "s2"), (3L, "s3")).toDF("k", "v")
    val out = Merge.promoteStaging(tgt, stg, Seq("k")).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq((1L, "t1"), (2L, "s2"), (3L, "s3")))
  }
}
