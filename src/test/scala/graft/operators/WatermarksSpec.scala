package graft.operators

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.control.Watermarks

class WatermarksSpec extends SparkSpec {
  import spark.implicits._

  test("incrementalRun loads only rows above the stored watermark and advances it") {
    val dir = java.nio.file.Files.createTempDirectory("wm").toString
    val wmPath = s"$dir/wm"
    val tgt = s"$dir/tgt"
    def run(rows: Seq[(Long, Long)]): Long =
      Watermarks.incrementalRun(spark, wmPath, jobId = 7L,
        rows.toDF("id", "ts"), "ts") { batch =>
        batch.write.mode(SaveMode.Append).parquet(tgt)
      }
    // first run: everything
    assert(run(Seq((1L, 100L), (2L, 200L))) === 2)
    assert(Watermarks.load(spark, wmPath, 7L) === Some(200L))
    // second run: only ts > 200 extracted; 150 and 200 are skipped
    assert(run(Seq((2L, 200L), (3L, 150L), (4L, 300L))) === 1)
    assert(Watermarks.load(spark, wmPath, 7L) === Some(300L))
    assert(spark.read.parquet(tgt).select("id").as[Long].collect().sorted
      === Array(1L, 2L, 4L))
    // empty increment: nothing loaded, watermark unchanged
    assert(run(Seq((5L, 250L))) === 0)
    assert(Watermarks.load(spark, wmPath, 7L) === Some(300L))
  }

  test("watermarks are independent per job") {
    val dir = java.nio.file.Files.createTempDirectory("wm2").toString + "/wm"
    Watermarks.save(spark, dir, 1L, 10L)
    Watermarks.save(spark, dir, 2L, 20L)
    Watermarks.save(spark, dir, 1L, 15L)
    assert(Watermarks.load(spark, dir, 1L) === Some(15L))
    assert(Watermarks.load(spark, dir, 2L) === Some(20L))
    assert(Watermarks.load(spark, dir, 3L) === None)
  }
}
