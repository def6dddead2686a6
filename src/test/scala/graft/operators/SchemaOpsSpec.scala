package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.types._

class SchemaOpsSpec extends SparkSpec {
  import spark.implicits._

  test("castBySpec casts, renames, and parses formatted timestamps") {
    val df = Seq(("1", "2.5", "2024/01/31 10:00")).toDF("a", "b", "ts")
    val out = SchemaOps.castBySpec(df,
      Seq("a:int", "b:double:bb", "ts:timestamp:ts2:yyyy/MM/dd HH:mm"))
    assert(out.schema.map(f => (f.name, f.dataType)) == Seq(
      ("a", IntegerType), ("bb", DoubleType), ("ts2", TimestampType)))
    val r = out.collect().head
    assert(r.getInt(0) == 1 && r.getDouble(1) == 2.5)
    assert(r.getTimestamp(2).toInstant.toString == "2024-01-31T10:00:00Z")
  }

  test("allToString coerces every column") {
    val out = SchemaOps.allToString(Seq((1, 2.0, true)).toDF("a", "b", "c"))
    assert(out.schema.forall(_.dataType == StringType))
  }

  test("normalizeNames strips/adds prefixes and fixes separators") {
    val df = Seq((1, 2, 3)).toDF("raw col", "tmp-name", "tmp-other")
    val out = SchemaOps.normalizeNames(df, stripPrefix = "tmp_", addPrefix = "x_")
    assert(out.columns.toSeq == Seq("x_raw_col", "x_name", "x_other"))
  }

  test("alignTo adds typed nulls for missing and drops extras") {
    val target = StructType(Seq(
      StructField("a", IntegerType), StructField("z", StringType)))
    val out = SchemaOps.alignTo(Seq((1, "junk")).toDF("a", "extra"), target)
    assert(out.columns.toSeq == Seq("a", "z"))
    val r = out.collect().head
    assert(r.getInt(0) == 1 && r.isNullAt(1))
  }
}
