package graft.operators

import graft.SparkSpec
import graft.functions.Repetition
import org.apache.spark.sql.functions.col

class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  test("dupLineRatio: repeated lines counted, blanks ignored, no-lines → 0") {
    val df = Seq(
      ("a", "x\n\n x \ny\nx"),       // lines x,x,y,x → 4 total, 2 distinct
      ("b", "one\ntwo\nthree"),
      ("c", "\n  \n")
    ).toDF("id", "t").select($"id", Repetition.dupLineRatio($"t").as("r"))
    val m = df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("a") == 0.5)
    assert(m("b") == 0.0)
    assert(m("c") == 0.0)
  }

  test("wordRepetitionStats: counts, ratios, and empty-doc exclusion") {
    val docs = Seq(
      (1L, "spam spam spam eggs"),   // 4 words, 2 distinct, top=3/4
      (2L, "all words differ here"),
      (3L, "...")                    // no word tokens → no row
    ).toDF("doc_id", "text")
    val out = Repetition.wordRepetitionStats(docs, "doc_id", "text")
      .orderBy(col("id")).collect()
    assert(out.length == 2)
    val r1 = out(0)
    assert((r1.getLong(1), r1.getLong(2)) == ((4L, 2L)))
    assert(r1.getDouble(3) == 0.5 && r1.getDouble(4) == 0.75)
    val r2 = out(1)
    assert(r2.getDouble(3) == 0.0 && r2.getDouble(4) == 0.25)
  }
}
