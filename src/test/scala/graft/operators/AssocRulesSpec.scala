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
}
