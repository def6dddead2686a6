package graft.control

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Per-job high-watermark persistence (SURVEY §2.12) — the engine form
  * of the reference's job-queue last-run timestamp: each INC run reads
  * the stored watermark, extracts only strictly-newer rows, loads
  * them, and advances the watermark to the batch's max
  * (`dataSource bp/Tables.scala:52-99` stored-proc bookkeeping;
  * `bp-unstructured-netapp-ingestion` control-table pattern).
  *
  * Semantics: the watermark advances AFTER a successful load, so a
  * crash between load and save re-extracts the last batch —
  * at-least-once, the same contract as the reference. Pair with a
  * keyed upsert (`Merge.upsert`) for effective exactly-once.
  */
object Watermarks {

  private val schema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("jobId",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("wm",
      org.apache.spark.sql.types.LongType)))

  /** Stored watermark for a job, if any. */
  def load(spark: SparkSession, path: String, jobId: Long): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else spark.read.parquet(path)
      .where(col("jobId") === jobId)
      .agg(max(col("wm"))).collect().headOption
      .flatMap(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
  }

  /** Record `wm` as the job's new watermark (keyed upsert, then atomic
    * stage+rename — the watermark table is control-plane-sized). */
  def save(spark: SparkSession, path: String, jobId: Long, wm: Long): Unit = {
    import spark.implicits._
    val incoming = Seq((jobId, wm)).toDF("jobId", "wm")
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val merged =
      if (!fs.exists(p)) incoming
      else graft.operators.Merge.upsert(
        spark.read.parquet(path), incoming, Seq("jobId"))
    val tmp = path.stripSuffix("/") + "__stage"
    merged.write.mode(SaveMode.Overwrite).parquet(tmp)
    fs.delete(p, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), p)
  }

  /** One INC run: extract rows with `tsCol` strictly above the stored
    * watermark (everything on the first run), hand them to `loadBatch`,
    * then advance the watermark to the batch max. Returns rows loaded. */
  def incrementalRun(spark: SparkSession, wmPath: String, jobId: Long,
                     source: org.apache.spark.sql.DataFrame, tsCol: String)
                    (loadBatch: org.apache.spark.sql.DataFrame => Unit): Long = {
    val wm = load(spark, wmPath, jobId)
    val fresh = wm.fold(source)(w => source.where(col(tsCol) > w))
      .persist() // consumed by loadBatch AND the max/count pass
    val stats = fresh.agg(max(col(tsCol)), count(lit(1))).collect().head
    val n = stats.getLong(1)
    if (n > 0) {
      loadBatch(fresh)
      save(spark, wmPath, jobId, stats.getLong(0))
    }
    fresh.unpersist()
    n
  }
}
