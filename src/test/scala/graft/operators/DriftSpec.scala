package graft.operators

import graft.SparkSpec
import graft.validate.Drift

class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def run(a: Seq[Double], b: Seq[Double]) =
    Drift.histogramDrift(a.toDF("v"), b.toDF("v"), "v",
      lo = 0L, binWidth = 10L, bins = 4)

  private def tvdPpm(a: Seq[Double], b: Seq[Double]): Long =
    run(a, b).where($"bin" === -1L).head().getLong(4)

  test("identical distributions score 0, disjoint score 1e6") {
    val x = Seq(1.0, 5.0, 15.0, 25.0)
    assert(tvdPpm(x, x) === 0L)
    assert(tvdPpm(Seq(1.0, 5.0), Seq(25.0, 35.0)) === 1000000L)
  }

  test("a known half-moved distribution scores 500000 ppm") {
    // base: all 4 in bin 0; cur: 2 in bin 0, 2 in bin 2 → TVD = 0.5
    assert(tvdPpm(Seq(1.0, 2.0, 3.0, 4.0),
      Seq(1.0, 2.0, 21.0, 22.0)) === 500000L)
  }

  test("per-bin rows conserve counts; out-of-range values clamp") {
    val out = run(Seq(-5.0, 99.0), Seq(5.0)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(0L) === ((1L, 1L))) // -5 clamps into bin 0
    assert(out(3L) === ((1L, 0L))) // 99 clamps into the last bin
    assert(out(-1L) === ((2L, 1L))) // TOTAL row carries corpus counts
  }

  test("unequal corpus sizes normalize: same shape scores 0") {
    assert(tvdPpm(Seq(1.0, 15.0), Seq(1.0, 1.0, 15.0, 15.0)) === 0L)
  }
}
