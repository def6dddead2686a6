package graft.operators

import graft.SparkSpec
import graft.functions.NgramLm
import org.apache.spark.sql.functions._

/** Cross-domain LM matrix + mixture weights
  * ([[NgramLm.crossDomainNll]] / [[NgramLm.domainMixWeights]]).
  *
  * The oracle gate (q_domain_xent / q_domain_mix) proves engine ≡
  * SQL replay; these specs pin the SEMANTICS: the matrix diagonal is
  * the single-corpus LM scored on itself (equivalence with
  * [[NgramLm.bigramNll]]), distinct domains produce positive
  * reweighting margins, and identical domains collapse to the uniform
  * fallback.
  */
class CrossDomainLmSpec extends SparkSpec {
  import spark.implicits._

  test("single-domain diagonal equals interpolatedNll totals") {
    val docs = Seq(
      (1L, "en", "the cat sat on the mat"),
      (2L, "en", "the dog sat on the cat"),
      (3L, "en", "mats and dogs and cats"),
      (4L, "en", "one"),
      (5L, "en", "")).toDF("id", "dom", "text")
    val m = NgramLm.crossDomainNll(docs, "dom", "text").collect()
    assert(m.length == 1)
    val row = m.head
    assert(row.getAs[String]("train_domain") == "en")
    assert(row.getAs[Long]("n_docs") == 5L)
    // the matrix prices with the interpolated estimator (λ=0.9), so
    // the one-domain diagonal is exactly the within-corpus
    // interpolated NLL — not the add-one bigramNll
    val per = NgramLm.interpolatedNll(docs, "id", "text")
      .agg(sum("n_bigrams"), sum("nll_micro")).head()
    assert(row.getAs[Long]("n_bigrams") == per.getLong(0))
    assert(row.getAs[Long]("nll_micro") == per.getLong(1))
  }

  test("disjoint-vocabulary domains: self fits better than cross, " +
      "margins positive, weights proportional") {
    val docs = (
      (1 to 8).map(i => (i.toLong, "a", "alpha beta gamma delta alpha beta")) ++
      (1 to 8).map(i => (100L + i, "b", "uno dos tres cuatro uno dos"))
    ).toDF("id", "dom", "text")
    val m = NgramLm.crossDomainNll(docs, "dom", "text")
    val byPair = m.collect().map(r => ((r.getAs[String]("train_domain"),
      r.getAs[String]("eval_domain")),
      r.getAs[Long]("nll_micro").toDouble / r.getAs[Long]("n_bigrams"))).toMap
    assert(byPair.size == 4)
    assert(byPair(("a", "a")) < byPair(("b", "a")))
    assert(byPair(("b", "b")) < byPair(("a", "b")))
    val w = NgramLm.domainMixWeights(m).collect()
      .map(r => r.getAs[String]("domain") ->
        (r.getAs[Long]("margin_micro"), r.getAs[Long]("weight_ppm"))).toMap
    assert(w("a")._1 > 0 && w("b")._1 > 0)
    val total = w.values.map(_._2).sum
    assert(total <= 1000000L && total > 999900L,
      s"floor weights must sum to ~1e6, got $total")
  }

  test("identical domains collapse to the uniform fallback") {
    val text = "same words in every domain here"
    val docs = Seq((1L, "x", text), (2L, "y", text)).toDF("id", "dom", "text")
    val w = NgramLm.domainMixWeights(
      NgramLm.crossDomainNll(docs, "dom", "text")).collect()
    assert(w.forall(_.getAs[Long]("margin_micro") == 0L))
    assert(w.forall(_.getAs[Long]("weight_ppm") == 500000L))
  }

  test("domainMixWeights arithmetic on a handcrafted matrix") {
    // domain p: self 1.0, best cross 3.0 → margin 2_000_000 µn
    // domain q: self 2.0, best cross 2.5 → margin   500_000 µn
    // weights: floor(2e6*1e6/2.5e6)=800_000, floor(.5e6*1e6/2.5e6)=200_000
    val m = Seq(
      ("p", "p", 10L, 1000000L), ("q", "p", 10L, 3000000L),
      ("q", "q", 10L, 2000000L), ("p", "q", 10L, 2500000L))
      .toDF("train_domain", "eval_domain", "n_bigrams", "nll_micro")
    val w = NgramLm.domainMixWeights(m).collect()
      .map(r => r.getAs[String]("domain") -> r).toMap
    assert(w("p").getAs[Long]("self_micro") == 100000L)
    assert(w("p").getAs[Long]("cross_micro") == 300000L)
    assert(w("p").getAs[Long]("margin_micro") == 200000L)
    assert(w("q").getAs[Long]("margin_micro") == 50000L)
    assert(w("p").getAs[Long]("weight_ppm") == 800000L)
    assert(w("q").getAs[Long]("weight_ppm") == 200000L)
  }
}
