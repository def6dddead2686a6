package graft

import org.apache.spark.sql.SparkSession

/** Per-query wall-clock guard for the gate runners (round-13
  * post-mortem): `graft.Verify` and `graft.Bench` iterate EVERY
  * SparkEntry query in one JVM, so a single query that never returns
  * (r13: a streaming drain that could not terminate) used to zero the
  * whole round's correctness AND bench record. Running each query's
  * body on a guarded thread bounds the damage to one `err` row.
  *
  * On timeout the guard (a) cancels the query's job group with task
  * interruption, killing any running batch stages, and (b) interrupts
  * the worker thread — which unblocks a stuck streaming drain
  * (`processAllAvailable`, progress polls, `Thread.sleep`) and lets
  * the runner's own `finally q.stop()` shut the stream down, so a
  * hung stream does not keep burning cores under later queries. The
  * guard then throws [[QueryGuard.QueryTimeout]] into the caller's
  * normal per-query error path.
  *
  * Job-group scoping is thread-local, so only jobs submitted from the
  * worker thread are cancelled — concurrent queries (none today; the
  * runners are sequential) would be untouched. Streaming micro-batch
  * jobs run on the stream's own thread and are NOT in the group;
  * they are covered by the interrupt→stop path instead.
  */
object QueryGuard {

  final class QueryTimeout(name: String, seconds: Long)
    extends RuntimeException(
      s"timeout: $name still running after $seconds s (guard killed it)")

  /** Daemon threads: a worker wedged beyond even interruption must
    * not block JVM exit (the cached pool replaces it for the next
    * query). */
  private lazy val pool = java.util.concurrent.Executors.newCachedThreadPool(
    (r: Runnable) => {
      val t = new Thread(r, "graft-query-guard")
      t.setDaemon(true)
      t
    })

  /** Gate-runner timeout: generous — the slowest green query at the
    * driver's sf0.1 is ~10 s, so 600 s only ever fires on a genuine
    * hang, never on a slow box. Parsed ONCE and defensively: a
    * malformed env value must degrade to the default, not throw
    * outside the guarded path and zero the whole gate run. */
  lazy val defaultTimeout: java.time.Duration = java.time.Duration.ofSeconds(
    sys.env.get("SPARK_GRAFT_QUERY_TIMEOUT_SEC") match {
      case None => 600L
      case Some(v) => scala.util.Try(v.trim.toLong).filter(_ > 0).getOrElse {
        System.err.println(
          s"[QueryGuard] ignoring malformed SPARK_GRAFT_QUERY_TIMEOUT_SEC='$v'; using 600")
        600L
      }
    })

  private val invocation = new java.util.concurrent.atomic.AtomicLong()

  def run[T](spark: SparkSession, name: String,
             timeout: java.time.Duration = defaultTimeout)(body: => T): T = {
    // unique per invocation: cancelJobGroupAndFutureJobs blacklists
    // the group id for the SparkContext's lifetime, and Bench re-runs
    // a failed query on later passes (flaky recovery) — those retries
    // must start with a clean slate
    val group = s"graft-guard-$name-${invocation.incrementAndGet()}"
    // Counted down in the worker's OWN finally, after the body's
    // finally blocks unwound: a timed-out body that restores shared
    // session conf on the way out (e.g. a state-store providerClass
    // toggle) must not race that restore against the NEXT guarded
    // query's run. fut.isDone is true the moment cancel() returns,
    // so it cannot serve as the unwind signal.
    val unwound = new java.util.concurrent.CountDownLatch(1)
    val fut = pool.submit(new java.util.concurrent.Callable[T] {
      def call(): T = {
        // the pool thread lacks the caller's thread-locals: restore
        // the active session for code paths using SparkSession.active
        SparkSession.setActiveSession(spark)
        spark.sparkContext.setJobGroup(group, s"guarded query $name",
          interruptOnCancel = true)
        try body finally {
          spark.sparkContext.clearJobGroup()
          unwound.countDown()
        }
      }
    })
    try fut.get(timeout.toMillis, java.util.concurrent.TimeUnit.MILLISECONDS)
    catch {
      case _: java.util.concurrent.TimeoutException =>
        fut.cancel(true) // interrupt → streaming runners' finally-stop
        // ...AndFutureJobs, not plain cancelJobGroup: the worker may
        // be wedged BEFORE job submission (planning, codegen, a stuck
        // source), and an interrupt swallowed there would let the job
        // launch right after a plain cancel — its tasks then hold the
        // cores under every later query (seen live in this guard's
        // own spec: a 0.5 s timeout fired before the sleep-job was
        // submitted and the follow-up query starved for minutes)
        spark.sparkContext.cancelJobGroupAndFutureJobs(group)
        // Brief grace for the worker's finally blocks (conf restores,
        // stream stops) to complete before the caller moves on; a
        // worker wedged beyond interruption just forfeits the grace —
        // the guard still returns and the daemon pool replaces it.
        unwound.await(10, java.util.concurrent.TimeUnit.SECONDS)
        throw new QueryTimeout(name, timeout.toSeconds)
      case e: java.util.concurrent.ExecutionException =>
        // surface the body's own failure as-is for the caller's
        // error-row message
        throw e.getCause
    }
  }
}
