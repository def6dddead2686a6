package graft.run

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.classify.Classifier
import graft.control.Control
import graft.control.Control.{JobSpec, RunLog}
import graft.sources.PagedSource.{PageAuthExpired, PageData, PageEnd, PageResponse}

/** Round-9 verdict item 6 — end-to-end fault injection for the
  * control plane: the reference's whole reason for existing is
  * surviving flaky endpoints (`Well Logs .../Tables.scala:262-289`),
  * so this spec walks real pipelines through injected transport and
  * infrastructure faults and asserts the retry cascade (C5), the
  * schema-drift quarantine, the 401-refresh, the run-log transcript
  * (C6), and the notification hook all COMPOSE — each is covered
  * solo elsewhere; chaos is about their interaction. */
class ChaosPipelineSpec extends SparkSpec {

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("chaos").toString

  test("paged ingest: 3 transport faults -> retries -> success, " +
    "with auth refresh + quarantine composing; exact transcript") {
    import spark.implicits._
    val dir = tmpDir()
    val runLog = new RunLog(spark, s"$dir/runlog")
    val spec = JobSpec(11L, 1, 1, "api", "fixture://chaos", "t", "SNP")
    val target = StructType(Seq(
      StructField("k", LongType), StructField("v", StringType)))

    // the flaky transport: page 2 throws while the fault budget
    // lasts (3 whole-job failures), the very first fetch of the run
    // serves a credential expiry (handled IN-attempt, not a failure),
    // and page 3 drifts (quarantined, not a failure)
    def doc(k: Int) = s"""{"k": $k, "v": "p$k"}"""
    val faultsLeft = new AtomicInteger(3)
    val authServed = new AtomicInteger(0)
    val refreshes = new AtomicInteger(0)
    def fetch(i: Int, token: Option[String]): PageResponse = i match {
      case 0 if authServed.getAndIncrement() == 0 => PageAuthExpired
      case 0 => PageData(Seq(doc(1), doc(2)).toDS())
      case 1 => PageData(Seq(doc(3), doc(4)).toDS())
      case 2 if faultsLeft.get() > 0 =>
        faultsLeft.decrementAndGet()
        throw new RuntimeException("injected transport fault")
      case 2 => PageData(Seq(doc(5), doc(6)).toDS())
      case 3 => PageData(Seq("""{"k": 9, "wrong_field": true}""").toDS())
      case _ => PageEnd
    }

    val results = Control.runWithRetries(Seq(spec), parallelism = 1,
      maxRetries = 3) { s =>
      Pipelines.apiIngestPaged(spark, s, target, fetch,
        () => refreshes.incrementAndGet(), Seq("k:long", "v:string"),
        s"$dir/target", s"$dir/failures", runLog)
    }

    // C5: the cascade drove 3 failing attempts to eventual success
    assert(Control.summarize(results) === (("S", 1L, 0L)))
    assert(faultsLeft.get() === 0)
    // 401-refresh fired exactly once and did NOT consume a retry
    assert(refreshes.get() === 1)

    // the data landed complete: pages 0-2 (drift page 3 quarantined)
    val loaded = spark.read.parquet(s"$dir/target")
    assert(loaded.count() === 6)
    assert(loaded.agg(sum("k")).collect()(0).getLong(0) === 21L)
    val quarantined = spark.read.parquet(s"$dir/failures").collect()
    assert(quarantined.length === 1)
    assert(quarantined(0).getAs[String]("reason")
      .contains("unexpected: wrong_field"))

    // C6: exact run-log transcript — 3 F attempts naming the injected
    // fault, then 1 S carrying load + quarantine counts
    val log = runLog.read().orderBy("status").collect()
    assert(log.length === 4)
    val (fs_, ss) = log.partition(_.getAs[String]("status") == "F")
    assert(fs_.length === 3 && ss.length === 1)
    assert(fs_.forall(_.getAs[String]("message")
      .contains("injected transport fault")))
    assert(ss(0).getAs[String]("message")
      === "loaded 6, quarantined 1 pages")
    assert(ss(0).getAs[Long]("recInSource") === 6L)
    // each attempt is its own run (distinct runIds)
    assert(log.map(_.getAs[String]("runId")).distinct.length === 4)

    // notification hook: the 3 failures route to the on-call
    // recipient as errors; the success produces nothing
    val notes = Control.pendingNotifications(runLog.read(),
      Seq((11L, "oncall")).toDF("jobId", "recipient")).collect()
    assert(notes.length === 3)
    assert(notes.forall(n => n.getAs[String]("severity") == "error" &&
      n.getAs[String]("recipient") == "oncall" &&
      n.getAs[String]("subject").startsWith("[error] job 11 run ") &&
      n.getAs[String]("body").contains("injected transport fault")))
  }

  test("file ingest: source root missing for 2 attempts -> retries " +
    "heal; control table never corrupted by failed attempts") {
    import spark.implicits._
    val src = tmpDir(); val tgt = tmpDir(); val dir = tmpDir()
    def put(p: String, body: String): Unit = {
      val w = new java.io.PrintWriter(p); w.write(body); w.close()
    }
    put(s"$src/a.dat", "alpha"); put(s"$src/b.dat", "bravo")
    val runLog = new RunLog(spark, s"$dir/runlog")
    val spec = JobSpec(12L, 3, 1, "file", src, "ctl", "INC")
    val rules = Classifier.Rules(excludedExtensions = Seq("tmp"))
    val nowMs = System.currentTimeMillis()

    // infra flake: the mount is absent for the first two attempts
    val attempt = new AtomicInteger(0)
    val results = Control.runWithRetries(Seq(spec), parallelism = 1,
      maxRetries = 3) { s =>
      val root = if (attempt.incrementAndGet() <= 2) s"$src-unmounted"
                 else src
      Pipelines.fileIngest(spark, s, root, tgt, s"$dir/control",
        rules, runLog, nowMs)
    }
    assert(Control.summarize(results) === (("S", 1L, 0L)))
    assert(results.head.records === 2)
    assert(attempt.get() === 3)

    // both files copied; control table reflects exactly one clean run
    assert(new java.io.File(s"$tgt/a.dat").exists())
    assert(new java.io.File(s"$tgt/b.dat").exists())
    val ctl = spark.read.parquet(s"$dir/control")
    assert(ctl.count() === 2)
    assert(ctl.where(col("copyStatus") === "C").count() === 2)

    // transcript: 2 F (missing mount) + 1 S; failures surfaced to
    // notifications, and the failed attempts left NO control table
    // (the stage+rename swap never ran for them)
    val log = runLog.read().collect()
    assert(log.count(_.getAs[String]("status") == "F") === 2)
    assert(log.count(_.getAs[String]("status") == "S") === 1)
    val notes = Control.pendingNotifications(runLog.read(),
      Seq.empty[(Long, String)].toDF("jobId", "recipient")).collect()
    assert(notes.length === 2) // default-routed to ops
    assert(notes.forall(_.getAs[String]("recipient") == "ops"))
  }
}
