package graft.validate

import org.scalatest.funsuite.AnyFunSuite

class TuningSpec extends AnyFunSuite {

  test("partitions sized to bytes, floored at cores, capped at max") {
    // 10 GiB at 128 MiB target → 80 partitions
    val a = Tuning.shuffleAdvice(10L << 30, 1000000L, 0L, cores = 32)
    assert(a.shufflePartitions === 80)
    // tiny input still fills the cores
    val b = Tuning.shuffleAdvice(1L << 20, 1000L, 0L, cores = 32)
    assert(b.shufflePartitions === 32)
    // 100 TB at 128 MiB would be 800k partitions → capped
    val c = Tuning.shuffleAdvice(100L << 40, 1L << 40, 0L, cores = 1000)
    assert(c.shufflePartitions === Tuning.MaxPartitions)
  }

  test("salting triggers only past 2x the average partition load") {
    // 80 partitions, 1M rows → 12500 avg; top key at 20k is within 2×
    val quiet = Tuning.shuffleAdvice(10L << 30, 1000000L, 20000L, 32)
    assert(quiet.saltsForTopKey === 1)
    // top key at 100k rows → 8 salts (100000 / 12500)
    val skewed = Tuning.shuffleAdvice(10L << 30, 1000000L, 100000L, 32)
    assert(skewed.saltsForTopKey === 8)
    // a key that IS the table salts to at most the partition count
    val degenerate = Tuning.shuffleAdvice(10L << 30, 1000000L, 1000000L, 32)
    assert(degenerate.saltsForTopKey === 80)
  }

  test("broadcast advice follows the measured small side") {
    val yes = Tuning.shuffleAdvice(10L << 30, 1000L, 0L, 32,
      smallSideBytes = 10L << 20)
    assert(yes.broadcastSmallSide)
    val no = Tuning.shuffleAdvice(10L << 30, 1000L, 0L, 32,
      smallSideBytes = 1L << 30)
    assert(!no.broadcastSmallSide)
  }
}
