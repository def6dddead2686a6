package graft.operators

import graft.SparkSpec
import graft.functions.Bm25
import org.apache.spark.sql.functions._

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  // corpus: 4 docs; "rare" appears only in doc 1, "common" in all
  private def corpus = Seq(
    (1L, "rare common alpha beta"),
    (2L, "common alpha alpha alpha"),
    (3L, "common beta beta"),
    (4L, "common gamma delta epsilon zeta")).toDF("id", "text")

  test("hand-computed integer BM25 score for a single-term query") {
    val q = Seq((10L, "rare")).toDF("qid", "qt")
    val out = Bm25.topK(corpus, "id", "text", q, "qid", "qt", k = 3)
      .collect()
    // only doc 1 contains "rare"
    assert(out.length == 1)
    val row = out.head
    assert(row.getAs[Long]("doc_id") == 1L)
    // N=4 docs, df=1 → idf2 = bitlen(4) = 3
    // dl=4, L=17, tf=1:
    //   dlNorm = (750*4*4) div 17 = 705
    //   denom  = 1*1000 + 1200*(1000-750+705) = 1000 + 1146000 = 1147000
    //   tfPart = (1*2200*1000) div 1147000 = 1
    // score = 3 * 1 = 3
    assert(row.getAs[Long]("score") == 3L)
    assert(row.getAs[Int]("rank") == 1)
  }

  test("tf saturation: repeated term ranks higher but sublinearly") {
    val q = Seq((1L, "alpha")).toDF("qid", "qt")
    val out = Bm25.topK(corpus, "id", "text", q, "qid", "qt", k = 5)
      .orderBy(col("rank")).collect()
    // docs 1 and 2 contain alpha; doc 2 has tf=3 → must rank first
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(2L, 1L))
    val s2 = out(0).getAs[Long]("score")
    val s1 = out(1).getAs[Long]("score")
    assert(s2 > s1)
    // saturation: tfPart is bounded by (k1pm+1000) = 2200 scaled —
    // idf2 here is bitlen(4 div 2) = 2, so score < 2*2200 however
    // large tf grows (the integer grain makes exact ratios floor-y)
    assert(s2 < 2 * 2200)
  }

  test("ties broken by doc id; k truncates per query independently") {
    val q = Seq((1L, "common"), (2L, "beta")).toDF("qid", "qt")
    val out = Bm25.topK(corpus, "id", "text", q, "qid", "qt", k = 2)
    val byQ = out.collect().groupBy(_.getAs[Long]("query_id"))
    assert(byQ(1L).length == 2 && byQ(2L).length == 2)
    // query 2: beta in docs 1 (tf=1, dl=4) and 3 (tf=2, dl=3) → doc 3 first
    assert(byQ(2L).sortBy(_.getAs[Int]("rank"))
      .map(_.getAs[Long]("doc_id")).toSeq == Seq(3L, 1L))
  }

  test("query terms reach the postings side as a broadcast join") {
    val q = Seq((1L, "alpha")).toDF("qid", "qt")
    val plan = Bm25.topK(corpus, "id", "text", q, "qid", "qt", k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast query-term join in:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"unexpected cartesian in:\n$plan")
  }
}
