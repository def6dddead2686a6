package graft.operators

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.types.{LongType, StructType}

import graft.SparkSpec
import graft.streaming.EventStream

class StreamTimersSpec extends SparkSpec {
  import spark.implicits._

  private val S = 1000000000L // ns per second

  /** Write one parquet file into the staged dir with a controlled
    * modification time so the file source's batch ORDER is fixed. */
  private def writeBatch(rows: Seq[(Long, Long)], stage: Path,
                         name: String, mtime: Long): Unit = {
    val tmp = Files.createTempDirectory("sessw-one")
    rows.toDF("user_id", "ts").coalesce(1)
      .write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).iterator().asScala
      .find(_.toString.endsWith(".parquet")).get
    val dest = stage.resolve(name)
    Files.copy(part, dest)
    assert(dest.toFile.setLastModified(mtime))
  }

  test("timers close idle sessions once the watermark passes last+gap") {
    val stage = Files.createTempDirectory("sessw-stage")
    // base offset: events AT epoch 0 equal the initial watermark and
    // are dropped as late — real timelines never start at 1970
    val B0 = 100000L
    def sec(s: Long): Long = (B0 + s) * S
    def us(s: Long): Long = (B0 + s) * 1000000L
    // batch A: user 1 two events (0s, 10s); user 2 one event (0s);
    //          user 3 at 1000s pushes the watermark to 995s
    writeBatch(Seq((1L, sec(0)), (1L, sec(10)), (2L, sec(0)),
      (3L, sec(1000))), stage, "a.parquet", mtime = 100000)
    // batch B: far-future events — user 1 returns (new session),
    //          user 4 brand new; both stay OPEN at stream end
    writeBatch(Seq((1L, sec(10000)), (4L, sec(10000))),
      stage, "b.parquet", mtime = 200000)
    val schema = new StructType()
      .add("user_id", LongType).add("ts", LongType)

    val out = EventStream.sessionsWithTimers(spark, stage.toString,
      schema, gapSeconds = 60, delay = "5 seconds")
    val rows = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .toSet

    // batch-A sessions of users 1 and 2 were idle past the gap when
    // batch B moved the watermark to 995s — their timers fired and
    // emitted exactly one session each (the stale-timer guard stops
    // user 1's old timer from closing the NEW 10000s session)
    assert(rows.contains((1L, us(0), us(10), 2)), rows)
    assert(rows.contains((2L, us(0), us(0), 1)), rows)
    // still-open far-future sessions are state, not output
    assert(!rows.exists(_._1 == 4L), rows)
    assert(!rows.exists(_._2 == us(10000)), rows)
    // nothing emitted twice
    assert(rows.size === out.count())
  }
}
