package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZOrderSpec extends SparkSpec {

  import spark.implicits._

  test("interleave2 places bits correctly on known values") {
    // x=3 (0b11), y=1 (0b01) → z = x bits at even, y at odd:
    // bit0(x)=1→pos0, bit1(x)=1→pos2, bit0(y)=1→pos1 ⇒ 0b111 = 7
    val z = Seq((3L, 1L)).toDF("x", "y")
      .select(ZOrder.interleave2(col("x"), col("y"), 4).as("z"))
      .first().getLong(0)
    assert(z === 7L)
    // full range: interleave is a bijection on the grid
    val n = 16
    val grid = (for { x <- 0 until n; y <- 0 until n } yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val codes = grid.select(ZOrder.interleave2(col("x"), col("y"), 4).as("z"))
    assert(codes.distinct().count() === (n * n).toLong)
    assert(codes.agg(max(col("z"))).first().getLong(0) === (n * n - 1).toLong)
  }

  test("z-order layout prunes on BOTH dimensions; linear sort only on one") {
    val n = 64
    val grid = (for { x <- 0 until n; y <- 0 until n } yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val zDir = java.nio.file.Files.createTempDirectory("graft-zord").toString
    val xDir = java.nio.file.Files.createTempDirectory("graft-xsort").toString
    ZOrder.zorderWrite(grid, "x", "y", bits = 6, numFiles = 16, zDir)
    grid.repartitionByRange(16, col("x"), col("y"))
      .sortWithinPartitions(col("x"), col("y"))
      .write.mode("overwrite").parquet(xDir)

    // per-file bounding boxes from the data (same ranges the parquet
    // footers carry — what a scan's row-group pruning consults)
    def filesContaining(dir: String, colName: String, v: Long): Int =
      spark.read.parquet(dir).inputFiles.count { f =>
        val r = spark.read.parquet(f)
          .agg(min(col(colName)).as("lo"), max(col(colName)).as("hi"))
          .first()
        r.getLong(0) <= v && v <= r.getLong(1)
      }

    // filter y=40: x-sorted files all span the full y range → zero
    // skipping; z-ordered files are ~quadrants → most are skipped
    val ySorted = filesContaining(xDir, "y", 40)
    val yZorder = filesContaining(zDir, "y", 40)
    assert(ySorted === 16, s"x-sorted layout should not prune on y, got $ySorted")
    assert(yZorder <= 8, s"z-order should prune most files on y, got $yZorder")
    // filter x=40: both layouts prune
    assert(filesContaining(xDir, "x", 40) <= 4)
    assert(filesContaining(zDir, "x", 40) <= 8)
  }
}
