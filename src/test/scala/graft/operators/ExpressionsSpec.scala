package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.expressions.GraftFunctions

/** The custom codegen'd expressions must agree exactly with the
  * built-in (slow) formulations they replace — including on empty
  * arrays, disjoint sets, and zero vectors. */
class ExpressionsSpec extends AnyFunSuite with SparkSpec {

  test("sorted_intersect_size matches array_intersect size") {
    GraftFunctions.register(spark)
    val df = spark.range(200).select(
      col("id"),
      array_sort(array_distinct(transform(sequence(lit(0), (col("id") % 17).cast("int")),
        i => pmod(hash(concat(col("id"), i)), lit(50)).cast("long")))).as("a"),
      array_sort(array_distinct(transform(sequence(lit(0), (col("id") % 23).cast("int")),
        i => pmod(hash(concat(i, col("id"))), lit(50)).cast("long")))).as("b"))
    val mismatches = df.select(
        call_function(GraftFunctions.IntersectSizeSorted, col("a"), col("b"))
          .as("fast"),
        size(array_intersect(col("a"), col("b"))).as("slow"))
      .where(col("fast") =!= col("slow")).count()
    assert(mismatches === 0)
  }

  test("sorted_intersect_size edge cases") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      (Seq.empty[Long], Seq(1L, 2L)),     // empty left
      (Seq(1L, 2L), Seq.empty[Long]),     // empty right
      (Seq(1L, 3L, 5L), Seq(2L, 4L, 6L)), // disjoint
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L))  // identical
    ).toDF("a", "b")
    val got = df.select(
      call_function(GraftFunctions.IntersectSizeSorted, col("a"), col("b")))
      .as[Int].collect().toSeq
    assert(got === Seq(0, 0, 0, 3))
  }

  test("graft_cosine matches the zip_with/aggregate formulation") {
    GraftFunctions.register(spark)
    val df = spark.range(100).select(
      transform(sequence(lit(1), lit(16)),
        i => (pmod(hash(concat(col("id"), i)), lit(1000)) / 500.0 - 1.0))
        .as("a"),
      transform(sequence(lit(1), lit(16)),
        i => (pmod(hash(concat(i, col("id"))), lit(1000)) / 500.0 - 1.0))
        .as("b"))
    val mismatches = df.select(
        call_function(GraftFunctions.Cosine, col("a"), col("b")).as("fast"),
        graft.similarity.Similarity.cosine(col("a"), col("b")).as("slow"))
      .where(col("fast") =!= col("slow")).count()
    assert(mismatches === 0)
  }

  test("graft_simhash matches the aggregate-fold formulation") {
    GraftFunctions.register(spark)
    val df = spark.range(100).select(
      transform(sequence(lit(1), (col("id") % 30 + 1).cast("int")),
        i => abs(hash(concat(col("id"), i)).cast("long"))).as("h"))
    val mismatches = df.select(
        call_function(GraftFunctions.SimHash, col("h")).as("fast"),
        graft.functions.TextFunctions.simhashFromHashes(col("h")).as("slow"))
      .where(col("fast") =!= col("slow")).count()
    assert(mismatches === 0)
  }

  test("graft_cosine zero vector yields 0.0") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq((Seq(0.0, 0.0), Seq(1.0, 2.0))).toDF("a", "b")
    val got = df.select(
      call_function(GraftFunctions.Cosine, col("a"), col("b")))
      .as[Double].collect()
    assert(got === Array(0.0))
  }

  test("minhash_signature_fused matches the n-pass HOF formulation") {
    GraftFunctions.register(spark)
    val docs = graft.Tables(spark, sf, "documents").limit(50)
    val base = docs.select(col("doc_id"),
        graft.functions.TextFunctions.words(col("text")).as("w"))
      .select(col("doc_id"),
        graft.functions.TextFunctions.shinglesFromWords(col("w"), 3).as("sh"))
      .select(col("doc_id"),
        graft.functions.TextFunctions.minHashBaseHashes(col("sh")).as("bh"))
    val mismatches = base.select(
        call_function(GraftFunctions.MinHashSig, col("bh"), lit(32)).as("fast"),
        graft.functions.TextFunctions
          .minHashSignatureFromHashes(col("bh"), 32).as("slow"))
      .where(col("fast") =!= col("slow")).count()
    assert(mismatches === 0)
  }

  test("text_normalize: case, diacritics, NFC/NFD forms, whitespace, nulls") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val rows = Seq(
      ("  Cr\u00e8me  BR\u00dbL\u00c9E  ", "creme brulee"),
      ("ni\u00f1o", "nino"),          // composed
      ("nin\u0303o", "nino"),         // decomposed composes then strips
      ("a\tb\n c", "a b c"),
      ("", "")
    ).toDF("txt", "want")
    val bad = rows.select(
        call_function(GraftFunctions.Normalize, col("txt")).as("got"),
        col("want"))
      .where(col("got") =!= col("want")).count()
    assert(bad === 0)
    // null-safe + idempotent
    val n = Seq(Option.empty[String]).toDF("txt")
      .select(call_function(GraftFunctions.Normalize, col("txt"))).first()
    assert(n.isNullAt(0))
    val once = rows.select(
      call_function(GraftFunctions.Normalize, col("txt")).as("x"))
    val twice = once.select(
      call_function(GraftFunctions.Normalize, col("x")).as("x"))
    assert(once.exceptAll(twice).count() === 0)
  }
}
