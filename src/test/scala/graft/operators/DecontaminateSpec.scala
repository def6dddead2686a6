package graft.operators

import graft.SparkSpec
import graft.dedup.Decontaminate

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  // benchmark: one eval question; docs: a verbatim leak, a partial
  // overlap (shares a 5-word run), and a clean doc
  private def bench = Seq(
    (100L, "what is the capital of france paris is the capital")
  ).toDF("bid", "btext")

  private def docs = Seq(
    (1L, "what is the capital of france paris is the capital"),
    (2L, "question what is the capital of france asked the tutor"),
    (3L, "completely unrelated text about spark shuffle partitions")
  ).toDF("doc_id", "text")

  test("bloom-prefiltered scores equal the exact path at any fpp") {
    val exact = Decontaminate
      .contaminationScores(docs, bench, "doc_id", "text", "btext", k = 5)
    // sloppy filter (high fpp) → more candidates shuffle, same answer
    for (fpp <- Seq(0.5, 0.01)) {
      val bloom = Decontaminate.contaminationScoresBloom(
        docs, bench, "doc_id", "text", "btext", k = 5, fpp = fpp)
      assert(bloom.exceptAll(exact).count() === 0, s"fpp=$fpp extra rows")
      assert(exact.exceptAll(bloom).count() === 0, s"fpp=$fpp missing rows")
    }
  }

  test("contaminationScores flags the leak fully and the overlap partially") {
    val out = Decontaminate
      .contaminationScores(docs, bench, "doc_id", "text", "btext", k = 5)
      .orderBy($"id").collect()
      .map(r => (r.getLong(0), r.getDouble(3))).toMap
    assert(out(1L) == 1.0)
    assert(out(2L) > 0 && out(2L) < 1.0)
    assert(!out.contains(3L))
  }

  test("contaminationPairs attributes the overlap to the benchmark doc") {
    val pairs = Decontaminate.contaminationPairs(docs, bench,
      "doc_id", "text", "bid", "btext", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs.map(p => (p._1, p._2)) == Set((1L, 100L), (2L, 100L)))
  }

  test("decontaminate drops docs above the threshold, keeps the rest") {
    val kept = Decontaminate.decontaminate(docs, bench, "doc_id", "text",
      "btext", k = 5, maxContamination = 0.5)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L))
  }

  test("benchmark side is broadcast (no corpus shuffle before the probe)") {
    val plan = Decontaminate
      .contaminationScores(docs, bench, "doc_id", "text", "btext", k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"))
  }

  test("semanticContamination flags cosine hits; decontaminate drops them") {
    import org.apache.spark.sql.functions.col
    val corpus = Seq(
      (10L, Array(1.0, 0.0)),   // identical direction to bench 1
      (11L, Array(0.9, 0.1)),   // close
      (12L, Array(-1.0, 0.0))   // opposite
    ).toDF("doc_id", "vec")
    val evalSet = Seq((1L, Array(1.0, 0.0))).toDF("bid", "bvec")
    val hits = Decontaminate.semanticContamination(corpus, evalSet,
        "doc_id", "vec", "bid", "bvec", threshold = 0.9)
      .select(col("id")).as[Long].collect().toSet
    assert(hits === Set(10L, 11L))
    val kept = Decontaminate.semanticDecontaminate(corpus, evalSet,
        "doc_id", "vec", "bid", "bvec", threshold = 0.9)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(kept === Set(12L))
    // the bench side broadcasts: corpus vectors never shuffle
    val plan = Decontaminate.semanticContamination(corpus, evalSet,
        "doc_id", "vec", "bid", "bvec", threshold = 0.9)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan)
  }
}
