package graft.operators

import graft.SparkSpec
import graft.similarity.Coreset

/** Engine greedy k-center == a serial replay with the same 6-decimal
  * cosine rounding and ppm floor; plus the structural farthest-point
  * contracts. */
class CoresetSpec extends SparkSpec {

  private def cos6(a: Array[Double], b: Array[Double]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    val na = math.sqrt(a.map(x => x * x).sum)
    val nb = math.sqrt(b.map(x => x * x).sum)
    BigDecimal(dot / (na * nb))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }
  private def distPpm(a: Array[Double], b: Array[Double]): Long =
    math.round((1.0 - cos6(a, b)) * 1000000.0)

  private def serial(rows: Seq[(Long, Array[Double])],
                     k: Int): Seq[(Int, Long, Option[Long])] = {
    val byId = rows.toMap
    val seed = rows.map(_._1).min
    var chosen = List(seed)
    var mind = rows.map { case (id, v) => id -> distPpm(v, byId(seed)) }.toMap
    var out = List[(Int, Long, Option[Long])]((1, seed, None))
    for (i <- 2 to k) {
      val (cid, r) = mind.toSeq.maxBy { case (id, d) => (d, -id) }
      chosen ::= cid
      out ::= ((i, cid, Some(r)))
      mind = mind.map { case (id, d) =>
        id -> math.min(d, distPpm(byId(id), byId(cid))) }
    }
    out.reverse
  }

  test("random corpus: engine equals the serial greedy replay") {
    import spark.implicits._
    val rnd = new scala.util.Random(43L)
    val rows = (0 until 30).map(i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian())))
    val got = Coreset.kCenterGreedy(rows.toDF("id", "v"), "id", "v", k = 5)
      .collect().map(r => (r.getInt(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSeq
      .sortBy(_._1)
    assert(got === serial(rows, k = 5))
    // farthest-point property: the radius curve never increases
    val radii = got.flatMap(_._3)
    assert(radii === radii.sorted.reverse)
    spark.catalog.clearCache()
  }

  test("k = 1 returns only the lowest-id seed with NULL radius") {
    import spark.implicits._
    val rows = Seq((7L, Array(1.0, 0.0)), (3L, Array(0.0, 1.0)))
    val got = Coreset.kCenterGreedy(rows.toDF("id", "v"), "id", "v", k = 1)
      .collect()
    assert(got.length === 1)
    assert(got(0).getLong(1) === 3L && got(0).isNullAt(2))
    spark.catalog.clearCache()
  }

  test("k beyond the corpus stops at full coverage instead of " +
       "re-emitting covered points with radius 0") {
    import spark.implicits._
    // 3 distinct directions, one exact duplicate of id 1: coverage is
    // complete after the 3 distinct vectors are chosen, so k = 10
    // returns exactly 3 rows (the duplicate's min-distance is 0 and
    // must never be selected)
    val rows = Seq((1L, Array(1.0, 0.0)), (2L, Array(0.0, 1.0)),
      (3L, Array(-1.0, 0.5)), (4L, Array(1.0, 0.0)))
    val got = Coreset.kCenterGreedy(rows.toDF("id", "v"), "id", "v", k = 10)
      .collect().sortBy(_.getInt(0))
    assert(got.length === 3, got.mkString(","))
    assert(got.map(_.getLong(1)).toSet.subsetOf(Set(1L, 2L, 3L)))
    assert(got.forall(r => r.isNullAt(2) || r.getLong(2) > 0L))
    spark.catalog.clearCache()
  }
}
