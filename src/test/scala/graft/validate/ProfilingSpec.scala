package graft.validate

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Vocab
import graft.sketch.Sketches

class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  test("keySkewReport ranks heavy keys with exact integer shares") {
    // 10×a, 6×b, 3×c, 1×d — total 20
    val df = (Seq.fill(10)("a") ++ Seq.fill(6)("b") ++ Seq.fill(3)("c") ++
      Seq("d")).toDF("k")
    val rep = Skew.keySkewReport(df, "k", topK = 3).orderBy("rk")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rep.toSeq == Seq(
      (1L, "a", 10L, 500L, 500L, 4L, 20L),
      (2L, "b", 6L, 300L, 800L, 4L, 20L),
      (3L, "c", 3L, 150L, 950L, 4L, 20L)))
  }

  test("keySkewReport limit ties break on the key string deterministically") {
    val df = Seq("x", "x", "y", "y", "z", "z").toDF("k")
    val keys = Skew.keySkewReport(df, "k", topK = 2).orderBy("rk")
      .select("key").as[String].collect().toSeq
    assert(keys == Seq("x", "y")) // equal counts → ascending key
  }

  test("cmsJoinSizeEstimate is exact without collisions, never under") {
    val left = Seq("a", "a", "a", "b", "c").toDF("k")   // n: a=3 b=1 c=1
    val right = Seq("a", "b", "b", "d").toDF("k")       // n: a=1 b=2 d=1
    // exact |L ⋈ R| = 3·1 + 1·2 = 5; 4 distinct keys in 1024 buckets
    // per row — a cross-key collision in EVERY row is implausible, and
    // the bound guarantees est >= exact regardless
    val est = Sketches.cmsJoinSizeEstimate(left, "k", right, "k")
      .head().getLong(0)
    assert(est == 5L, s"expected exact 5 (no collisions), got $est")
  }

  test("vocab ids are dense, count-descending, token-tie-broken") {
    val docs = Seq("b b b a a c", "a c x").toDF("text")
    // counts: a=3 b=3 c=2 x=1; minCount=2 drops x
    val v = Vocab.build(docs, "text", minCount = 2).orderBy("tok_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(v.toSeq == Seq(("a", 3L, 0L), ("b", 3L, 1L), ("c", 2L, 2L)))
  }

  test("vocab extend keeps old ids stable and appends new tokens by rank") {
    val base = Vocab.build(Seq("b b b a a c c").toDF("text"), "text",
      minCount = 2) // a=2 b=3 c=2 → b:0 a:1 c:2
    val out = Vocab.extend(base, Seq("a z z z y y q").toDF("text"),
        "text", minCount = 2)
      .orderBy("tok_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // existing ids untouched, counts updated (a +1); z(3) then y(2)
    // append after max id 2; q below floor dropped
    assert(out.toSeq == Seq(("b", 3L, 0L), ("a", 3L, 1L), ("c", 2L, 2L),
      ("z", 3L, 3L), ("y", 2L, 4L)))
  }

  test("skipgram pairs are directed, windowed, and never cross documents") {
    val docs = Seq((1L, "a b c"), (2L, "c a")).toDF("doc_id", "text")
    val pairs = Vocab.skipgramCounts(docs, "doc_id", "text", window = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    // doc 1: (a,b) (b,c) at d=1, (a,c) at d=2; doc 2: (c,a) at d=1 —
    // no (c,a) from doc 1's end to doc 2's start, no reversed pairs
    assert(pairs == Set(("a", "b", 1L), ("b", "c", 1L), ("a", "c", 1L),
      ("c", "a", 1L)))
  }

  test("streaming CMS top-k agrees with the batch per-hour exact top-k") {
    // at 4×256 cells vs the fixture's tiny per-hour user sets,
    // collisions are overwhelmingly unlikely — the CMS estimate should
    // reproduce the exact (count desc, user asc) top-5 per hour
    import graft.streaming.EventStream
    val streamed = EventStream.hourlyTopUsersAvailableNow(spark, sf,
        queryName = "spec_stream_topk")
      .select("hour", "rk", "user_id", "est_n")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val exact = graft.Tables(spark, sf, "events")
      .select(date_format(timestamp_micros(graft.Tables.eventTsUs),
        "yyyy-MM-dd HH").as("hour"), col("user_id"))
      .groupBy("hour", "user_id").agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("hour"))
          .orderBy(col("n").desc, col("user_id"))).cast("long"))
      .where(col("rk") <= 5)
      .collect().map(r => (r.getString(0), r.getLong(3), r.getLong(1),
        r.getLong(2))).toSet
    assert(streamed.nonEmpty && streamed == exact)
  }
}
