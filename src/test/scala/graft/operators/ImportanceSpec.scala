package graft.operators

import graft.SparkSpec
import graft.sample.Importance
import org.apache.spark.sql.functions._

class ImportanceSpec extends SparkSpec {
  import spark.implicits._

  test("target-vocabulary documents outweigh off-domain ones") {
    // target docs speak 'alpha beta'; raw-only docs speak 'gamma delta'
    val docs = Seq(
      (1L, "alpha beta alpha beta", true),
      (2L, "alpha beta beta alpha", true),
      (3L, "gamma delta gamma delta", false),
      (4L, "alpha beta gamma delta", false)).toDF("id", "text", "tgt")
    val w = Importance.bitWeights(docs, "id", "text", col("tgt"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("weight_bits"))
      .toMap
    // pure target vocab must strictly outweigh pure off-domain vocab
    assert(w(1L) > w(3L))
    // the mixed doc sits between
    assert(w(4L) > w(3L) && w(4L) < w(1L))
    // identical docs get identical weights
    assert(w(1L) == w(2L))
  }

  test("n_tokens counts every token, weight is per-document total") {
    val docs = Seq(
      (1L, "x x x", true),
      (2L, "x", false)).toDF("id", "text", "tgt")
    val out = Importance.bitWeights(docs, "id", "text", col("tgt"))
      .orderBy("id").collect()
    assert(out.map(_.getAs[Long]("n_tokens")).toSeq == Seq(3L, 1L))
    // same term everywhere → per-token bits identical; doc 1 = 3× doc 2
    assert(out(0).getAs[Long]("weight_bits") ==
      3 * out(1).getAs[Long]("weight_bits"))
  }

  test("empty-token documents are absent (no 0-token rows)") {
    val docs = Seq((1L, "real words here", true), (2L, "!!!", false))
      .toDF("id", "text", "tgt")
    val out = Importance.bitWeights(docs, "id", "text", col("tgt"))
    assert(out.count() == 1)
  }
}
