package graft.operators

import graft.SparkSpec
import graft.similarity.Quantize

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, Seq(0.0, 10.0, 5.0)),
    (2L, Seq(1.0, 20.0, 5.0)),   // dim 2 is constant across the corpus
    (3L, Seq(0.5, 15.0, 5.0)))
    .toDF("vec_id", "embedding")

  test("codes hit the range endpoints and split interiors by floor(t*(L-1)+0.5)") {
    val codes = Quantize.encode(corpus, "vec_id", "embedding", levels = 256)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(3)).toMap
    // dim 0 range [0,1]: 0→0, 1→255, 0.5→floor(127.5+0.5)=128
    assert(codes((1L, 0)) === 0L)
    assert(codes((2L, 0)) === 255L)
    assert(codes((3L, 0)) === 128L)
    // dim 1 range [10,20]: 15 → exactly halfway → 128 again
    assert(codes((3L, 1)) === 128L)
  }

  test("constant dimensions encode as 0 with zero reconstruction error") {
    val out = Quantize.auditStats(corpus, "vec_id", "embedding", 256)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    assert(out.keySet === Set(1L, 2L, 3L))
    assert(out(1L)._1 === 3L)
    // endpoints + constants reconstruct exactly; only the interior
    // point can carry error, bounded by half a cell
    assert(out(1L)._2 === 0.0)
    assert(out(2L)._2 === 0.0)
    // max_err is rounded to 6dp in auditStats — allow the half-ulp
    assert(out(3L)._2 <= 0.5 / 255 * 10.0 + 5e-7)
  }

  test("error bound holds corpus-wide at sf0.001: max_err <= cell/2 per dim") {
    val e = graft.Tables(spark, sf, "embeddings")
    val enc = Quantize.encode(e, "vec_id", "embedding", 256)
    val bad = enc.where(
      org.apache.spark.sql.functions.abs($"val" - ($"lo" + $"code" *
        ($"hi" - $"lo") / 255)) > ($"hi" - $"lo") / 255 / 2 + 1e-12)
    assert(bad.isEmpty)
  }

  test("encode is one pass: no shuffle of vector rows, ranges broadcast") {
    val plan = Quantize.encode(corpus, "vec_id", "embedding", 256)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"))
    assert(!plan.contains("SortMergeJoin"))
  }
}
