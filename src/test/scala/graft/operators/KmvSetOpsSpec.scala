package graft.operators

import graft.SparkSpec
import graft.sketch.Sketches

class KmvSetOpsSpec extends SparkSpec {
  import spark.implicits._

  test("below-k inputs give exact set algebra") {
    // disjoint-ish small sets: every hash fits in the sketch, so the
    // estimates ARE the exact distinct counts
    val a = (1 to 30).map(_.toString).toDF("v")
    val b = (21 to 40).map(_.toString).toDF("v")
    val r = Sketches.kmvSetOps(a, "v", b, "v", k = 64).head()
    assert(r.getDouble(0) === 30.0) // |A|
    assert(r.getDouble(1) === 20.0) // |B|
    assert(r.getDouble(2) === 40.0) // |A∪B|
    assert(r.getDouble(3) === 0.25) // 10/40
    assert(r.getDouble(4) === 10.0) // |A∩B|
  }

  test("above-k estimates land near truth on a 50% overlap") {
    val a = (1 to 2000).map(_.toString).toDF("v")
    val b = (1001 to 3000).map(_.toString).toDF("v")
    val r = Sketches.kmvSetOps(a, "v", b, "v", k = 64).head()
    // KMV standard error ≈ 1/√62 ≈ 13%; assert within ~3σ
    assert(math.abs(r.getDouble(2) - 3000.0) / 3000.0 < 0.4) // union
    assert(r.getDouble(3) > 0.1 && r.getDouble(3) < 0.6)     // jaccard ~1/3
  }

  test("identical inputs give jaccard 1 and intersection == union") {
    val a = (1 to 500).map(_.toString).toDF("v")
    val r = Sketches.kmvSetOps(a, "v", a, "v", k = 32).head()
    assert(r.getDouble(3) === 1.0)
    assert(r.getDouble(4) === r.getDouble(2))
  }
}
