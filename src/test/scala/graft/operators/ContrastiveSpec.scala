package graft.operators

import graft.SparkSpec
import graft.similarity.Similarity

class ContrastiveSpec extends SparkSpec {
  import spark.implicits._

  // orthogonal unit axes + one diagonal make the extrema unambiguous
  private val corpus = Seq(
    (1L, Seq(1.0, 0.0, 0.0), 10),
    (2L, Seq(0.9, 0.1, 0.0), 10),  // near 1, same label
    (3L, Seq(0.8, 0.2, 0.0), 20),  // nearer 1 than 2? cos(1,3)<cos(1,2)
    (4L, Seq(0.0, 1.0, 0.0), 20),
    (5L, Seq(0.0, 0.0, 1.0), 30))  // label 30 has a single member
    .toDF("vec_id", "embedding", "label")

  test("pos/neg extrema and margin per query") {
    val out = Similarity.contrastiveMargins(corpus, corpus, "vec_id",
        "embedding", "label")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), Option(r.get(2)), Option(r.get(3)), Option(r.get(4))))
      .toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val r6 = (v: Double) => BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val v = Map(1L -> Seq(1.0, 0.0, 0.0), 2L -> Seq(0.9, 0.1, 0.0),
      3L -> Seq(0.8, 0.2, 0.0), 4L -> Seq(0.0, 1.0, 0.0),
      5L -> Seq(0.0, 0.0, 1.0))
    // query 1: best positive is 2, best negative is 3
    val (lab1, pos1, neg1, m1) = out(1L)
    assert(lab1 === 10)
    assert(pos1.get === r6(cos(v(1L), v(2L))))
    assert(neg1.get === r6(cos(v(1L), v(3L))))
    assert(m1.get === r6(r6(cos(v(1L), v(2L))) - r6(cos(v(1L), v(3L)))))
  }

  test("a query whose label has no other member reports null pos/margin") {
    val (lab5, pos5, neg5, m5) = Similarity
      .contrastiveMargins(corpus, corpus.where($"vec_id" === 5L),
        "vec_id", "embedding", "label")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), Option(r.get(2)), Option(r.get(3)), Option(r.get(4))))
      .toMap.apply(5L)
    assert(lab5 === 30)
    assert(pos5.isEmpty && m5.isEmpty)
    assert(neg5.nonEmpty) // orthogonal to everything → best impostor 0.0
  }

  test("one corpus pass: a single aggregate, no window exchange") {
    val plan = Similarity.contrastiveMargins(corpus, corpus, "vec_id",
      "embedding", "label").queryExecution.executedPlan.toString
    assert(!plan.contains("Window"))
  }
}
