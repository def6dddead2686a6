package graft.operators

import graft.SparkSpec

/** Hand-computed exact ppm values on a 4-basket fixture, plus the
  * structural contracts (threshold, both directions, duplicate
  * tolerance). Items: 1=A, 2=B, 3=C. */
class AssocRulesSpec extends SparkSpec {

  import spark.implicits._

  // baskets: 10:(A,B,C) 11:(A,B) 12:(A,B) 13:(B,C); a duplicate
  // (10, A) row proves the distinct guard
  private lazy val baskets = Seq(
    (10L, 1L), (10L, 1L), (10L, 2L), (10L, 3L),
    (11L, 1L), (11L, 2L),
    (12L, 1L), (12L, 2L),
    (13L, 2L), (13L, 3L)).toDF("ok", "pk")

  test("supports, confidence, and lift are the hand-computed exact ppm") {
    val got = AssocRules.rules(baskets, "ok", "pk", minSupport = 2L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    // supp: A=3 B=4 C=2, N=4; pairs: (A,B)=3, (B,C)=2; (A,C)=1 dropped
    assert(got.keySet === Set((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)))
    // A→B: conf 3e6/3 = 1e6, lift 3·4e6/(3·4) = 1e6
    assert(got((1L, 2L)) === ((3L, 3L, 4L, 1000000L, 1000000L)))
    // B→A: conf 3e6 div 4 = 750000
    assert(got((2L, 1L)) === ((3L, 4L, 3L, 750000L, 1000000L)))
    // B→C: conf 2e6 div 4 = 500000, lift 2·4e6/(4·2) = 1e6
    assert(got((2L, 3L)) === ((2L, 4L, 2L, 500000L, 1000000L)))
    // C→B: conf 2e6 div 2 = 1e6
    assert(got((3L, 2L)) === ((2L, 2L, 4L, 1000000L, 1000000L)))
    spark.catalog.clearCache()
  }

  test("minSupport 4 leaves nothing; minSupport 1 admits the (A,C) pair") {
    assert(AssocRules.rules(baskets, "ok", "pk", 4L).count() === 0L)
    val loose = AssocRules.rules(baskets, "ok", "pk", 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(loose.contains((1L, 3L)) && loose.contains((3L, 1L)))
    spark.catalog.clearCache()
  }

  test("a planted mega-basket is quarantined, not mined") {
    // plant a 200-item basket next to the 4-basket fixture; cap at 50
    val mega = (1L to 200L).map(i => (99L, 1000L + i)).toDF("ok", "pk")
    val (rules, quarantine) = AssocRules.rulesWithQuarantine(
      baskets.unionByName(mega), "ok", "pk",
      minSupport = 2L, maxBasketSize = 50L)
    // exactly one quarantine row, naming the basket, its size, why
    val q = quarantine.collect()
    assert(q.length === 1)
    assert(q.head.getLong(0) === 99L)
    assert(q.head.getLong(1) === 200L)
    assert(q.head.getString(2) === "basket_exceeds_max_size")
    // the mined rules are EXACTLY the capped-free result: none of the
    // mega-basket's C(200,2)=19900 pairs reached the pair stage, and
    // supports/N saw only the 4 clean baskets
    val clean = AssocRules.rules(baskets, "ok", "pk", 2L)
      .collect().map(_.toSeq).toSet
    assert(rules.collect().map(_.toSeq).toSet === clean)
    spark.catalog.clearCache()
  }

  test("capped-free data: identical rules, empty quarantine") {
    val (rules, quarantine) = AssocRules.rulesWithQuarantine(
      baskets, "ok", "pk", minSupport = 2L, maxBasketSize = 50L)
    assert(quarantine.isEmpty)
    val direct = AssocRules.rules(baskets, "ok", "pk", 2L)
      .collect().map(_.toSeq).toSet
    assert(rules.collect().map(_.toSeq).toSet === direct)
    spark.catalog.clearCache()
  }

  test("a basket exactly AT the cap is kept") {
    val atCap = (1L to 5L).map(i => (50L, 2000L + i)).toDF("ok", "pk")
    val (rules, quarantine) = AssocRules.rulesWithQuarantine(
      baskets.unionByName(atCap), "ok", "pk",
      minSupport = 1L, maxBasketSize = 5L)
    assert(quarantine.isEmpty)
    // the at-cap basket's pairs were mined (any (2000+i, 2000+j) rule)
    val antes = rules.collect().map(_.getLong(0)).toSet
    assert(antes.exists(_ > 2000L))
    spark.catalog.clearCache()
  }
}
