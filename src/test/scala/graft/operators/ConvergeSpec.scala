package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The fused (observe-during-checkpoint) signature must be
  * bit-identical to the two-job form it replaced, and the returned
  * frame must be the materialized data. */
class ConvergeSpec extends SparkSpec {

  private def twoJobSig(df: org.apache.spark.sql.DataFrame,
                        cols: String): (Long, Long) = {
    val r = df.agg(count(lit(1)).as("n"),
      coalesce(expr(s"bit_xor(xxhash64($cols))"), lit(0L)).as("h")).head()
    (r.getLong(0), r.getLong(1))
  }

  test("fused signature equals the separate-aggregate signature") {
    import spark.implicits._
    val df = (1 to 500).map(i => (i.toLong, (i % 7).toLong)).toDF("a", "b")
    val (ck, sig) = Converge.checkpointWithSig(df, "a, b")
    assert(sig === twoJobSig(df, "a, b"))
    assert(ck.count() === 500L)
    // the checkpointed frame carries the same rows
    assert(ck.agg(sum(col("a"))).head().getLong(0) === 500L * 501L / 2L)
  }

  test("empty frame signs as (0, 0) and stays usable") {
    import spark.implicits._
    val df = Seq.empty[(Long, Long)].toDF("a", "b").where(col("a") > 0)
    val (ck, sig) = Converge.checkpointWithSig(df, "a")
    assert(sig === ((0L, 0L)))
    assert(ck.isEmpty)
  }

  test("withSig honors a caller-chosen materialization") {
    import spark.implicits._
    var called = false
    val df = (1 to 10).toDF("a")
    val (ck, sig) = Converge.withSig(df.select(col("a").cast("long").as("a")),
      "a") { d => called = true; d.localCheckpoint() }
    assert(called && sig._1 === 10L)
    assert(ck.count() === 10L)
  }

  test("withSig fails loudly when materialize never runs an action") {
    import spark.implicits._
    val df = (1 to 10).toDF("a").select(col("a").cast("long").as("a"))
    val e = intercept[IllegalStateException] {
      // identity "materialization": the observed frame is returned
      // lazily, no action fires, the observation can never complete —
      // the guard must fail with the contract named, not hang
      Converge.withSig(df, "a",
        scala.concurrent.duration.Duration(2, "s"))(identity)
    }
    assert(e.getMessage.contains("action on the OBSERVED frame"))
  }

  test("sameExact confirms equality and catches a real difference") {
    import spark.implicits._
    val a = Seq((1L, 2L), (3L, 4L)).toDF("x", "y").localCheckpoint()
    val b = Seq((3L, 4L), (1L, 2L)).toDF("x", "y").localCheckpoint()
    val c = Seq((1L, 2L), (3L, 5L)).toDF("x", "y").localCheckpoint()
    assert(Converge.sameExact(a, b))
    assert(!Converge.sameExact(a, c))
  }

  test("sameExact is self-contained: a proper sub-multiset is NOT equal") {
    import spark.implicits._
    val a = Seq((1L, 2L)).toDF("x", "y").localCheckpoint()
    val b = Seq((1L, 2L), (1L, 2L), (3L, 4L)).toDF("x", "y").localCheckpoint()
    // a \ b = 0 rows — the one-directional form answered true here,
    // silently relying on the caller having matched counts first
    assert(!Converge.sameExact(a, b))
    assert(!Converge.sameExact(b, a))
  }
}
