package graft.operators

import graft.SparkSpec
import graft.sample.Preference

class PreferenceSpec extends SparkSpec {

  import spark.implicits._

  /** Serial reference: the exact integer MM update of bradleyTerry. */
  private def brute(games: Seq[(Long, Long)], iters: Int)
      : Map[Long, (Long, Long, Long)] = {
    val items = (games.map(_._1) ++ games.map(_._2)).distinct
    val nIj = scala.collection.mutable.Map[(Long, Long), Long]()
      .withDefaultValue(0L)
    val wIj = scala.collection.mutable.Map[(Long, Long), Long]()
      .withDefaultValue(0L)
    games.foreach { case (w, l) =>
      nIj((w, l)) += 1; nIj((l, w)) += 1; wIj((w, l)) += 1
    }
    val wins = items.map(i => i -> items.filter(_ != i).map(j => wIj((i, j))).sum).toMap
    val nGames = items.map(i => i -> items.filter(_ != i).map(j => nIj((i, j))).sum).toMap
    var s = items.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      s = items.map { i =>
        val denom = items.filter(j => j != i && nIj((i, j)) > 0)
          .map(j => (nIj((i, j)) * 1000000000000L) / (s(i) + s(j))).sum
        i -> (if (denom == 0) 0L else (wins(i) * 1000000000000L) / denom)
      }.toMap
    }
    items.map(i => i -> ((nGames(i), wins(i), s(i)))).toMap
  }

  test("matches the serial integer MM reference") {
    // 1 dominates 2, 2 dominates 3, plus some upsets
    val games = Seq[(Long, Long)](
      (1L, 2L), (1L, 2L), (1L, 2L), (2L, 1L),
      (2L, 3L), (2L, 3L), (3L, 2L),
      (1L, 3L), (1L, 3L), (1L, 3L), (1L, 3L))
    for (iters <- 1 to 3) {
      val got = Preference.bradleyTerry(games.toDF("w", "l"), "w", "l", iters)
        .as[(Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(got === brute(games, iters), s"iters=$iters")
    }
  }

  test("transitive dominance orders the strengths") {
    val games = Seq[(Long, Long)](
      (1L, 2L), (1L, 2L), (1L, 2L), (2L, 1L),
      (2L, 3L), (2L, 3L), (2L, 3L), (3L, 2L),
      (1L, 3L), (1L, 3L), (1L, 3L), (3L, 1L))
    val got = Preference.bradleyTerry(games.toDF("w", "l"), "w", "l", 3)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(got(1L) > got(2L) && got(2L) > got(3L))
  }

  test("Wilson lower bound ranks certain records above lucky streaks") {
    // 2/2 (perfect but tiny) must NOT outrank 90/100
    val games = (1 to 90).map(_ => (10L, 99L)) ++ (1 to 10).map(_ => (99L, 10L)) ++
      Seq((20L, 98L), (20L, 98L))
    val got = Preference.winRates(games.toDF("w", "l"), "w", "l")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(10L)._1 === 100L && got(10L)._2 === 90L)
    assert(got(20L)._1 === 2L && got(20L)._2 === 2L)
    assert(got(10L)._3 > got(20L)._3) // 90/100 beats 2/2
    // serial check of the exact formula for 90/100
    val phat = 90.0 / 100
    val n = 100.0
    val want = BigDecimal((phat + 1.96 * 1.96 / (2 * n) - 1.96 *
      math.sqrt(phat * (1 - phat) / n + 1.96 * 1.96 / (4 * n * n))) /
      (1 + 1.96 * 1.96 / n))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(10L)._3 === want)
    // an all-losses item reports a 0 rate with a 0 bound
    assert(got(98L) === ((2L, 0L, 0.0)))
  }

  test("an all-losses item pins to zero and never divides by zero") {
    val games = Seq[(Long, Long)]((1L, 2L), (1L, 2L), (3L, 2L))
    val got = Preference.bradleyTerry(games.toDF("w", "l"), "w", "l", 2)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(2L)._3 === 0L)
    assert(got(2L)._1 === 3L && got(2L)._2 === 0L)
    assert(got === brute(games, 2))
  }
}
