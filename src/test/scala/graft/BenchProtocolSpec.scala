package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench repeat protocol's flaky-recovery contract (round-9
  * verdict item 7): a forced one-pass flake still yields a timing plus
  * a nonzero failure annotation, and only an all-passes failure
  * reports as an error. */
class BenchProtocolSpec extends AnyFunSuite {

  test("min over successful passes survives an interleaved failure") {
    // pass 1 ok (2.0 s), pass 2 FAILS, pass 3 ok (1.5 s)
    val m = Seq(Some(2.0), None, Some(1.5))
      .foldLeft(Option.empty[Double])(BenchProtocol.mergeMin)
    assert(m === Some(1.5))
    assert(BenchProtocol.classify(m, failures = 1) === ((false, true)))
  }

  test("failure-first then success recovers the timing") {
    val m = Seq(None, Some(3.25), Some(4.0))
      .foldLeft(Option.empty[Double])(BenchProtocol.mergeMin)
    assert(m === Some(3.25))
    assert(BenchProtocol.classify(m, failures = 1) === ((false, true)))
  }

  test("all passes failing is an error, not flaky") {
    val m = Seq(None, None, None)
      .foldLeft(Option.empty[Double])(BenchProtocol.mergeMin)
    assert(m === None)
    assert(BenchProtocol.classify(m, failures = 3) === ((true, false)))
  }

  test("clean runs are neither error nor flaky") {
    val m = Seq(Some(1.0), Some(0.9), Some(1.1))
      .foldLeft(Option.empty[Double])(BenchProtocol.mergeMin)
    assert(m === Some(0.9))
    assert(BenchProtocol.classify(m, failures = 0) === ((false, false)))
  }
}
