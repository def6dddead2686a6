package graft.operators

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.streaming.EventStream

/** Streaming observability: a run-log listener in the spirit of the
  * reference's stored-proc run logging — per-batch row counts and
  * progress captured via StreamingQueryListener, the hook a
  * production deployment wires to its metrics store. */
class StreamObservabilitySpec extends AnyFunSuite with SparkSpec {

  test("StreamingQueryListener observes rows flowing through AvailableNow") {
    val seen = new java.util.concurrent.atomic.AtomicLong(0)
    val done = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
        e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
        e: StreamingQueryListener.QueryProgressEvent): Unit =
        seen.addAndGet(e.progress.numInputRows)
      override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        done.incrementAndGet()
    }
    spark.streams.addListener(listener)
    try {
      val out = EventStream.streamStaticEnrichAvailableNow(spark, sf,
        queryName = "obs_test")
      assert(out.count() > 0)
      // listener events are delivered asynchronously
      val deadline = System.nanoTime() + 10e9.toLong
      while (done.get() == 0 && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(done.get() >= 1, "termination event not delivered")
      assert(seen.get() > 0, "no input rows observed by the listener")
    } finally spark.streams.removeListener(listener)
  }
}
