package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class FlattenSpec extends SparkSpec {
  import spark.implicits._

  test("flatten expands structs with underscore aliases") {
    val df = Seq((1, ("a", 2.0)), (2, ("b", 3.0))).toDF("id", "s")
    val flat = Flatten.flatten(df)
    assert(flat.columns.toSeq == Seq("id", "s__1", "s__2"))
    assert(flat.count() == 2)
  }

  test("flatten explodes arrays keeping empty/null parents") {
    val df = Seq(
      (1, Seq("x", "y")),
      (2, Seq.empty[String]),
      (3, null.asInstanceOf[Seq[String]])).toDF("id", "arr")
    val flat = Flatten.flatten(df)
    val rows = flat.orderBy("id", "arr").collect().map(r => (r.getInt(0), r.getString(1)))
    assert(rows.toSeq == Seq((1, "x"), (1, "y"), (2, null), (3, null)))
  }

  test("flatten handles struct-in-array-in-struct to full depth") {
    val js = Seq(
      """{"id":1,"meta":{"tags":[{"k":"a","v":1},{"k":"b","v":2}],"src":"s1"}}""",
      """{"id":2,"meta":{"tags":[],"src":"s2"}}""")
    val df = spark.read.json(js.toDS)
    val flat = Flatten.flatten(df)
    assert(!flat.schema.fields.exists(f =>
      f.dataType.isInstanceOf[StructType] || f.dataType.isInstanceOf[ArrayType]))
    assert(flat.columns.toSet ==
      Set("id", "meta_src", "meta_tags_k", "meta_tags_v"))
    assert(flat.count() == 3) // 2 tags + 1 empty-array parent row
  }

  test("explodeCorrelated zips sibling arrays positionally (no cross join)") {
    val df = Seq(
      (1, Seq(10, 20), Seq("a", "b")),
      (2, Seq(30), Seq("c", "d"))). // unequal lengths → null pad
      toDF("id", "xs", "ys")
    val out = Flatten.explodeCorrelated(df, Seq("xs", "ys"))
      .orderBy("id", "ys").collect()
      .map(r => (r.getInt(0), Option(r.get(1)), r.getString(2))).toSeq
    assert(out == Seq((1, Some(10), "a"), (1, Some(20), "b"),
      (2, Some(30), "c"), (2, None, "d")))
    // 3 rows would become 4 via zip; a cross join would give 2*2+1*2=6
  }

  test("posExplode exposes the element index") {
    val df = Seq((1, Seq("a", "b", "c"))).toDF("id", "arr")
    val out = Flatten.posExplode(df, "arr").orderBy("pos")
      .collect().map(r => (r.getInt(1), r.getString(2))).toSeq
    assert(out == Seq((0, "a"), (1, "b"), (2, "c")))
  }

  // per-table rename variants from the reference: well_cpr strips the
  // literal "Data_" prefix and coerces to string; time_depth strips
  // every parent segment
  private def nestedFixture = {
    val js = Seq("""{"rid":7,"Data":{"Depth":12.5,"Crew":{"Lead":"ann"}}}""")
    spark.read.json(js.toDS)
  }

  test("flattenFor strips Data_ only and coerces to string (well_cpr variant)") {
    val rules = Map[String, String => String](
      "well_cpr" -> Flatten.Rename.stripPrefix("Data_"),
      "time_depth" -> Flatten.Rename.stripAllParents())
    val out = Flatten.flattenFor(nestedFixture, "well_cpr", rules,
      toStringTables = Set("well_cpr"))
    assert(out.columns.toSet === Set("rid", "Depth", "Crew_Lead"))
    assert(out.schema.fields.forall(_.dataType ==
      org.apache.spark.sql.types.StringType))
    val r = out.collect().head
    assert(r.getAs[String]("Depth") === "12.5")
    assert(r.getAs[String]("Crew_Lead") === "ann")
  }

  test("flattenFor strips all parents, keeps types (time_depth variant)") {
    val rules = Map[String, String => String](
      "time_depth" -> Flatten.Rename.stripAllParents())
    val out = Flatten.flattenFor(nestedFixture, "time_depth", rules)
    assert(out.columns.toSet === Set("rid", "Depth", "Lead"))
    assert(out.schema("Depth").dataType ===
      org.apache.spark.sql.types.DoubleType)
  }

  test("flattenFor leaves unknown tables on default names and rejects collisions") {
    val rules = Map[String, String => String](
      "bad" -> Flatten.Rename.stripAllParents())
    val default = Flatten.flattenFor(nestedFixture, "other", rules)
    assert(default.columns.toSet === Set("rid", "Data_Depth", "Data_Crew_Lead"))
    // two leaves named the same after stripping parents → must fail fast
    val collide = spark.read.json(
      Seq("""{"a":{"x":1},"b":{"x":2}}""").toDS)
    intercept[IllegalArgumentException] {
      Flatten.flattenFor(collide, "bad", rules)
    }
  }
}
