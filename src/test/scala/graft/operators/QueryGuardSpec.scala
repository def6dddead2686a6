package graft.operators

import graft.{QueryGuard, SparkSpec}

/** The round-13 regression contract: a deliberately-hanging query must
  * yield an error row (a thrown, catchable [[QueryGuard.QueryTimeout]])
  * — never wedge the gate JVM — and must not poison later queries. */
class QueryGuardSpec extends SparkSpec {

  test("normal body returns its value and original failures surface as-is") {
    assert(QueryGuard.run(spark, "g_ok",
      java.time.Duration.ofSeconds(30)) { 41 + 1 } === 42)
    val boom = intercept[IllegalArgumentException] {
      QueryGuard.run(spark, "g_boom", java.time.Duration.ofSeconds(30)) {
        throw new IllegalArgumentException("original message")
      }
    }
    assert(boom.getMessage === "original message")
  }

  test("a hanging body times out into QueryTimeout, not a hung JVM") {
    val t0 = System.nanoTime()
    val e = intercept[QueryGuard.QueryTimeout] {
      QueryGuard.run(spark, "g_hang", java.time.Duration.ofMillis(300)) {
        // the r13 shape: a drain loop that never observes completion
        while (true) Thread.sleep(25)
      }
    }
    val sec = (System.nanoTime() - t0) / 1e9
    assert(e.getMessage.contains("g_hang"))
    assert(sec < 10.0, s"guard took $sec s to fire a 0.3 s timeout")
  }

  test("a hung SPARK JOB is cancelled and the session stays usable") {
    intercept[QueryGuard.QueryTimeout] {
      QueryGuard.run(spark, "g_hang_job", java.time.Duration.ofMillis(500)) {
        spark.range(0, 4, 1, 4).rdd
          .map { i => Thread.sleep(3600L * 1000); i }.count()
      }
    }
    // the cancelled group's tasks must not starve the next query
    val t0 = System.nanoTime()
    assert(QueryGuard.run(spark, "g_after",
      java.time.Duration.ofSeconds(60)) {
      spark.range(1000).selectExpr("sum(id) AS s").collect()(0).getLong(0)
    } === 499500L)
    assert((System.nanoTime() - t0) / 1e9 < 30.0)
  }
}
