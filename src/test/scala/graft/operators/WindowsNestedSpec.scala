package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WindowsNestedSpec extends SparkSpec {
  import spark.implicits._

  test("planChunks assigns dense global row numbers and chunk ids") {
    val df = (1 to 10).map(i => (i, s"f$i")).toDF("id", "path")
    val out = Windows.planChunks(df, 3, col("id")).orderBy("rn")
      .select("id", "rn", "chunk_id").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq
    assert(out.map(_._2) == (1 to 10))
    assert(out.map(_._3).distinct == Seq(0L, 1L, 2L, 3L))
  }

  test("chunkSlice returns the half-open rn range") {
    val df = (1 to 10).map(i => Tuple1(i)).toDF("id")
    val got = Windows.chunkSlice(df, 3, 6, col("id")).select("id")
      .as[Int].collect().sorted.toSeq
    assert(got == Seq(4, 5, 6))
  }

  test("keepLatest keeps newest per key; staleRows is the complement") {
    val df = Seq((1, 10L, "a"), (1, 20L, "b"), (2, 5L, "c"))
      .toDF("k", "ts", "v")
    val latest = Windows.keepLatest(df, Seq(col("k")), col("ts"))
      .select("v").as[String].collect().sorted.toSeq
    assert(latest == Seq("b", "c"))
    val stale = Windows.staleRows(df, Seq(col("k")), col("ts"))
      .select("v").as[String].collect().toSeq
    assert(stale == Seq("a"))
  }

  test("dropNested drops struct-in-struct and array-of-struct fields") {
    val js = Seq("""{"id":1,"m":{"keep":"k","del":{"x":1,"y":2}},"arr":[{"a":1,"b":2}]}""")
    val df = spark.read.json(js.toDS)
    val out = NestedColumns.dropAll(df, Seq("m.del.x", "arr.b"))
    val schema = out.schema.treeString
    assert(!schema.contains("x:") && schema.contains("y:"))
    assert(!schema.contains("b:") && schema.contains("a:"))
  }
}
