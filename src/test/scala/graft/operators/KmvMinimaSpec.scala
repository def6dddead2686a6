package graft.operators

import graft.SparkSpec
import graft.sketch.{KmvMinima, Sketches}
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

class KmvMinimaSpec extends SparkSpec {
  import spark.implicits._

  test("aggregator keeps the k smallest distinct hashes, sorted") {
    val a = new KmvMinima(3)
    val buf = Seq(50L, 10L, 30L, 10L, 20L, 40L).foldLeft(a.zero)(a.reduce)
    assert(buf.toSeq === Seq(10L, 20L, 30L))
  }

  test("merge is a bounded sorted-distinct union (order-independent)") {
    val a = new KmvMinima(3)
    val x = Seq(10L, 30L, 50L).foldLeft(a.zero)(a.reduce)
    val y = Seq(20L, 30L, 60L).foldLeft(a.zero)(a.reduce)
    assert(a.merge(x, y).toSeq === Seq(10L, 20L, 30L))
    assert(a.merge(y, x).toSeq === a.merge(x, y).toSeq)
  }

  test("bounded-state aggregate matches the window-phrasing batch sketch") {
    val df = graft.Tables(spark, sf, "lineitem")
      .select(col("l_returnflag"), col("l_partkey"))
    val viaWindow = Sketches.kmvDistinctByKey(df, "l_returnflag",
        "l_partkey", k = 64)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val kmv = KmvMinima(64)
    val viaAgg = df.groupBy(col("l_returnflag").as("key"))
      .agg(kmv(TextFunctions.hash64(col("l_partkey").cast("string")))
        .as("minima"))
      .select(col("key"),
        Sketches.estimateFromMinima(col("minima"), 64).as("est"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(viaAgg === viaWindow)
  }

  test("the aggregate runs as ObjectHashAggregate with map-side partials") {
    val kmv = KmvMinima(8)
    val plan = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .groupBy(col("k"))
      .agg(kmv(TextFunctions.hash64(col("v"))).as("m"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"))
  }
}
