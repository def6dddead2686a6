package graft.control

import java.sql.Timestamp
import java.util.concurrent.Executors

import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Control plane (SURVEY §2.13): job specs, run log, bounded parallel
  * fan-out, and retry — the engine-native form of the reference's
  * job-queue + notebook orchestration
  * (`dataSource bp/Concurrent.scala`, `parallel-notebooks.scala`,
  * run-log stored procs `dataSource bp/Tables.scala:52-99`).
  *
  * Jobs are plain functions, not notebooks; results are typed rows,
  * not JSON exit strings.
  */
object Control {

  /** ≈ audit.tblJobQueue + Extn essentials (SNP/APPEND/INC). */
  case class JobSpec(jobId: Long, jobGroup: Int, jobOrder: Int,
                     sourceKind: String, sourcePath: String,
                     targetTable: String, loadType: String,
                     watermarkCol: String = "", keyCols: String = "",
                     isActive: Boolean = true)

  /** ≈ runlog_unified (`bp-unstructured-netapp-ingestion/README.md:167-185`). */
  case class RunLogEntry(runId: String, jobId: Long, status: String,
                         recInSource: Long, recProcessed: Long, recFailed: Long,
                         message: String, ts: Timestamp)

  case class JobResult(jobId: Long, status: String, records: Long, message: String)

  /** Append run-log entries to a parquet table (JDBC optional via
    * Sinks.jdbcAppend).
    *
    * Granularity note: `append` writes one file per entry — fine at
    * run level (a handful of entries per pipeline run), a small-files
    * antipattern if called per row/item. Batch item-level logging
    * through `appendAll`, or point the log at JDBC. */
  class RunLog(spark: SparkSession, path: String) {
    import spark.implicits._
    def append(e: RunLogEntry): Unit = appendAll(Seq(e))
    def appendAll(es: Seq[RunLogEntry]): Unit =
      es.toDS().toDF().coalesce(1).write.mode(SaveMode.Append).parquet(path)
    def read(): DataFrame = spark.read.parquet(path)
  }

  /** C1/C2: bounded parallel fan-out (the reference's 7-notebook /
    * 20-thread pools). Jobs run as Futures on a fixed pool; each
    * failure is captured as a JobResult("F"), never thrown. */
  def runParallel[A](specs: Seq[A], parallelism: Int, timeout: Duration = Duration.Inf)
                    (run: A => JobResult): Seq[JobResult] = {
    val pool = Executors.newFixedThreadPool(parallelism)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val futs = specs.map(spec => Future(Try(run(spec))))
      val done = Await.result(Future.sequence(futs), timeout)
      done.zip(specs).map {
        case (Success(r), _) => r
        case (Failure(e), spec) =>
          JobResult(-1L, "F", 0L, s"$spec failed: ${e.getMessage}")
      }
    } finally pool.shutdown()
  }

  /** C5: retry cascade — re-run failed jobs up to `maxRetries` times
    * (the reference's 3-pass failures-table loop,
    * `Well Logs .../Tables.scala:262-289`). `backoffMs` between passes. */
  def runWithRetries[A](specs: Seq[A], parallelism: Int, maxRetries: Int = 3,
                        backoffMs: Long = 0)
                       (run: A => JobResult): Seq[JobResult] = {
    var results = runParallel(specs, parallelism)(run)
    var byIdx = specs.zip(results)
    var attempt = 0
    while (attempt < maxRetries && byIdx.exists(_._2.status == "F")) {
      if (backoffMs > 0) Thread.sleep(backoffMs)
      val (failed, ok) = byIdx.partition(_._2.status == "F")
      val retried = runParallel(failed.map(_._1), parallelism)(run)
      byIdx = ok ++ failed.map(_._1).zip(retried)
      attempt += 1
    }
    byIdx.map(_._2)
  }

  /** Aggregate child statuses like the parent notebook does
    * (`Concurrent.scala:173-228`): overall S only if no failures. */
  def summarize(results: Seq[JobResult]): (String, Long, Long) = {
    val s = results.count(_.status == "S")
    val f = results.size - s
    (if (f == 0) "S" else "F", s.toLong, f.toLong)
  }

  /** C6 notification hook (ref `bp-unstructured-sharepoint-ingestion/
    * ModuleFunctions.py:706-729`, the illegal-folder email; run-status
    * mails in `Concurrent.scala`). The engine-native form is a RECORD,
    * not a side effect: derive the pending notifications from run-log
    * state — failures ("F" → severity `error`) and partial successes
    * (recFailed > 0 → `warn`) — routed to per-job recipients (default
    * `ops` when a job has no routing row). A delivery adapter (SMTP /
    * webhook) consumes this frame downstream; keeping the hook
    * declarative makes it idempotent, replayable, and testable — and
    * the pass is a filter + broadcast join over the run log, never a
    * driver-side loop.
    *
    * `recipients`: (jobId, recipient). Returns (runId, jobId,
    * severity, recipient, subject, body, ts). */
  def pendingNotifications(runLog: DataFrame,
                           recipients: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    runLog
      .where(col("status") === "F" || col("recFailed") > 0)
      .withColumn("severity",
        when(col("status") === "F", "error").otherwise("warn"))
      .join(broadcast(recipients), Seq("jobId"), "left")
      .select(col("runId"), col("jobId"), col("severity"),
        coalesce(col("recipient"), lit("ops")).as("recipient"),
        concat(lit("["), col("severity"), lit("] job "), col("jobId"),
          lit(" run "), col("runId")).as("subject"),
        concat(col("message"), lit(" (failed="), col("recFailed"),
          lit(" of "), col("recInSource"), lit(")")).as("body"),
        col("ts"))
  }
}
