package graft.operators

import graft.SparkSpec
import graft.dedup.Boilerplate

class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  test("docStats flags grams shared by >= minDf distinct docs per group") {
    val docs = Seq(
      // "a b c" recurs in 3 distinct docs of source s1 → boilerplate
      (1L, "a b c x", "s1"),
      (2L, "a b c y", "s1"),
      (3L, "z a b c", "s1"),
      // same gram in s2 only twice → NOT boilerplate there
      (4L, "a b c q", "s2"),
      (5L, "a b c r", "s2")).toDF("doc_id", "text", "source")
    val out = Boilerplate.docStats(docs, "doc_id", "text", "source",
        n = 3, minDf = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // 4 words → two 3-grams each
    assert(out(1L) === (2L, 1L)) // "a b c" flagged, "b c x" not
    assert(out(2L) === (2L, 1L))
    assert(out(3L) === (2L, 1L)) // "z a b" not, "a b c" flagged
    assert(out(4L) === (2L, 0L)) // s2 is below the df threshold
    assert(out(5L) === (2L, 0L))
  }

  test("within-doc repeats count once toward df but fully in n_boiler") {
    // doc 1 repeats the gram: df must stay 1 per doc (distinct before
    // the df count), but its own n_boiler counts every occurrence
    val docs = Seq(
      (1L, "a b a b a b", "s"), // grams: ab,ba,ab,ba,ab → "a b"×3, "b a"×2
      (2L, "a b x", "s"),
      (3L, "a b y", "s")).toDF("doc_id", "text", "source")
    val out = Boilerplate.docStats(docs, "doc_id", "text", "source",
        n = 2, minDf = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) === (5L, 3L)) // only "a b" is in 3 docs; appears 3×
    assert(out(2L) === (2L, 1L))
    assert(out(3L) === (2L, 1L))
  }

  test("documents shorter than n words report zero grams") {
    val docs = Seq((1L, "a b", "s"), (2L, "a b c d e f", "s"))
      .toDF("doc_id", "text", "source")
    val out = Boilerplate.docStats(docs, "doc_id", "text", "source",
        n = 5, minDf = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!out.contains(1L)) // no grams → no row (nothing to curate)
    assert(out(2L) === 2L)
  }
}
