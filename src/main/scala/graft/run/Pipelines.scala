package graft.run

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.classify.Classifier
import graft.control.Control.{JobResult, JobSpec, RunLog, RunLogEntry}
import graft.operators.{Flatten, Merge, SchemaOps}
import graft.sources.{PagedSource, Sources}
import graft.operators.Converge.SanitizedCheckpoint

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
      writeByLoadType(spark, spec, typed, targetPath)
      val nOut = spark.read.parquet(targetPath).count()
      log("S", nIn, s"loaded $nOut")
      JobResult(spec.jobId, "S", nIn, s"loaded $nOut rows")
    } catch {
      case e: Throwable =>
        log("F", 0, String.valueOf(e.getMessage))
        JobResult(spec.jobId, "F", 0, String.valueOf(e.getMessage))
    }
  }

  /** Paginated variant of apiIngest (SURVEY §2.1 S10): drives
    * `PagedSource.pagedSource` over a fetch callback, quarantines
    * schema-drifted pages into a failures table (SNP overwrite per
    * run, like the reference's FAILURES_TABLE), and loads the
    * accumulated good pages by `spec.loadType`. */
  def apiIngestPaged(spark: SparkSession, spec: JobSpec,
                     target: org.apache.spark.sql.types.StructType,
                     fetchPage: (Int, Option[String]) => PagedSource.PageResponse,
                     refreshAuth: () => Unit,
                     castSpecs: Seq[String], targetPath: String,
                     failuresPath: String, runLog: RunLog): JobResult = {
    val runId = java.util.UUID.randomUUID().toString
    def log(status: String, n: Long, msg: String): Unit =
      runLog.append(RunLogEntry(runId, spec.jobId, status, n, n, 0, msg,
        new Timestamp(0L)))
    try {
      val res = PagedSource.pagedSource(spark, target, fetchPage, refreshAuth)
      res.failures.toDF().write.mode(SaveMode.Overwrite).parquet(failuresPath)
      val nQuarantined = res.failures.count()
      val typed = SchemaOps.castBySpec(res.data, castSpecs)
      val nIn = typed.count()
      writeByLoadType(spark, spec, typed, targetPath)
      val nOut = spark.read.parquet(targetPath).count()
      log("S", nIn, s"loaded $nOut, quarantined $nQuarantined pages")
      JobResult(spec.jobId, "S", nIn,
        s"loaded $nOut rows, quarantined $nQuarantined pages")
    } catch {
      case e: Throwable =>
        log("F", 0, String.valueOf(e.getMessage))
        JobResult(spec.jobId, "F", 0, String.valueOf(e.getMessage))
    }
  }

  /** SNP = overwrite, APPEND = append, INC = key-upsert into the
    * existing target then atomic stage+rename swap. */
  private def writeByLoadType(spark: SparkSession, spec: JobSpec,
                              typed: DataFrame, targetPath: String): Unit =
    spec.loadType match {
      case "SNP" =>
        typed.write.mode(SaveMode.Overwrite).parquet(targetPath)
      case "APPEND" =>
        typed.write.mode(SaveMode.Append).parquet(targetPath)
      case "INC" =>
        val keys = spec.keyCols.split(";").toSeq.filter(_.nonEmpty)
        val tgt = new org.apache.hadoop.fs.Path(targetPath)
        val fs = tgt.getFileSystem(spark.sparkContext.hadoopConfiguration)
        // existence probe, NOT a catch-all around the read: a transient
        // FS/permission error must fail the run, or the swap below
        // would silently replace the target with incoming-only data
        val merged = if (!fs.exists(tgt)) typed
          else Merge.upsert(spark.read.parquet(targetPath), typed, keys)
        val tmp = targetPath.stripSuffix("/") + "__stage"
        merged.write.mode(SaveMode.Overwrite).parquet(tmp)
        fs.delete(tgt, true)
        fs.rename(new org.apache.hadoop.fs.Path(tmp), tgt)
      case other => throw new IllegalArgumentException(s"loadType $other")
    }

  /** §3.2: the NetApp-style 3-step file ingestion as one pipeline —
    * recursive listing → control-table upsert (outer-join+COALESCE,
    * preserving copy status, deriving isAtSource) → rule
    * classification → copy of pending files → status upsert → run log.
    *
    * Scale notes vs the reference: the listing upsert is the K5
    * COALESCE merge (no Delta needed); classification is native
    * Columns (not collect()+Python dicts); and the copy itself runs
    * executor-side in mapPartitions — the reference copies on the
    * driver across 20 notebooks, which caps throughput at one VM.
    * INC semantics: re-copy when modifiedMs advanced past the recorded
    * copy timestamp (`ModuleFunctions.py:633-636`). `nowMs` is
    * injectable so runs are deterministic under test. */
  def fileIngest(spark: SparkSession, spec: JobSpec, sourceRoot: String,
                 targetRoot: String, controlPath: String,
                 rules: Classifier.Rules, runLog: RunLog,
                 nowMs: Long): JobResult = {
    import spark.implicits._
    val runId = java.util.UUID.randomUUID().toString
    def log(status: String, n: Long, msg: String): Unit =
      runLog.append(RunLogEntry(runId, spec.jobId, status, n, n, 0, msg,
        new Timestamp(0L)))
    try {
      // 1. listing rows for this (jobGroup, jobOrder)
      val listing = Sources.listFiles(spark, sourceRoot).toDF()
        .where(!col("isDir"))
        .select(col("path"), col("name"), col("ext"), col("sizeBytes"),
          col("modifiedMs"),
          lit(spec.jobGroup).as("jobGroup"), lit(spec.jobOrder).as("jobOrder"),
          lit(null).cast("string").as("copyStatus"),
          lit(null).cast("long").as("copyStatusMs"))
      val nListed = listing.count()

      // 2. upsert into the control table: listing metadata wins, copy
      //    status survives from the previous run (COALESCE merge)
      // existence probe, not a catch-all: a transient read error must
      // fail the run, not silently reset the control table
      val ctlPath = new org.apache.hadoop.fs.Path(controlPath)
      val ctlFs = ctlPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val existing =
        if (ctlFs.exists(ctlPath)) spark.read.parquet(controlPath) else null
      val keys = Seq("path", "jobGroup", "jobOrder")
      val merged0 =
        if (existing == null) listing
        else {
          // new metadata must win: upsert coalesces incoming first, but
          // a NULL incoming copyStatus falls back to the stored one —
          // exactly the reference's null-refresh trick (Step 1:184-186)
          Merge.upsert(existing.drop("isAtSource", "isExcluded",
            "exclusionReason"), listing, keys)
        }
      // 3. isAtSource = still present in this listing; then classify
      val atSrc = listing.select(col("path").as("__p")).distinct()
      val merged = merged0
        .join(atSrc, merged0("path") === atSrc("__p"), "left")
        .withColumn("isAtSource", when(col("__p").isNotNull, "Y").otherwise("N"))
        .drop("__p")
      val classified = Classifier.classify(merged, rules)

      // 4. pending = at-source, not excluded, never copied or modified
      //    since the last copy (INC)
      val pending = classified.where(col("isAtSource") === "Y" &&
        !col("isExcluded") &&
        (col("copyStatus").isNull || col("modifiedMs") > col("copyStatusMs")))
        .select(col("path"), col("name"))

      // 5. executor-side copy (local/Hadoop FS); one task per partition
      val copied = pending.as[(String, String)].mapPartitions { it =>
        val conf = new org.apache.hadoop.conf.Configuration()
        it.map { case (p, name) =>
          val src = new org.apache.hadoop.fs.Path(p)
          val dst = new org.apache.hadoop.fs.Path(targetRoot, name)
          val fs = src.getFileSystem(conf)
          org.apache.hadoop.fs.FileUtil.copy(fs, src, dst.getFileSystem(conf),
            dst, false, true, conf)
          p
        }
      }.toDF("path")
        .withColumn("copyStatus", lit("C"))
        .withColumn("copyStatusMs", lit(nowMs))
        // eager materialization: the copy is a side effect and must run
        // exactly once — without this the status join below would
        // re-execute every copy a second time (copies stay idempotent
        // via overwrite=true for task retries/speculation)
        .sanitizedCheckpoint()
      val nCopied = copied.count()

      // 6. status upsert + overwrite the control table (stage+rename)
      val statusCols = classified
        .join(copied.select(col("path").as("__p"), col("copyStatus").as("__s"),
          col("copyStatusMs").as("__ts")), classified("path") === col("__p"), "left")
        .withColumn("copyStatus", coalesce(col("__s"), col("copyStatus")))
        .withColumn("copyStatusMs", coalesce(col("__ts"), col("copyStatusMs")))
        .drop("__p", "__s", "__ts")
      val stage = controlPath.stripSuffix("/") + "__stage"
      statusCols.write.mode(SaveMode.Overwrite).parquet(stage)
      val fs = new org.apache.hadoop.fs.Path(controlPath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(controlPath), true)
      fs.rename(new org.apache.hadoop.fs.Path(stage),
        new org.apache.hadoop.fs.Path(controlPath))

      log("S", nListed, s"copied $nCopied")
      JobResult(spec.jobId, "S", nCopied, s"listed $nListed copied $nCopied")
    } catch {
      case e: Throwable =>
        log("F", 0, String.valueOf(e.getMessage))
        JobResult(spec.jobId, "F", 0, String.valueOf(e.getMessage))
    }
  }
}
