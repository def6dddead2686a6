package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dedup.SrpDedup

class SrpDedupSpec extends SparkSpec {

  private def randomCorpus(n: Int, dims: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i =>
      (i.toLong, Array.fill(dims)(rnd.nextGaussian())))
  }

  /** Perturbed copy at cosine ≈ 1 − eps²/2: unit-scale additive
    * noise of magnitude `eps` per component. */
  private def perturb(v: Array[Double], eps: Double, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    v.map(x => x + eps * rnd.nextGaussian())
  }

  test("autoPlanesPerBand arithmetic: log2(n/target), floored at 2") {
    assert(SrpDedup.autoPlanesPerBand(1000, 32) === 5)
    assert(SrpDedup.autoPlanesPerBand(4000, 32) === 7)
    assert(SrpDedup.autoPlanesPerBand(400000, 32) === 14)
    assert(SrpDedup.autoPlanesPerBand(10, 32) === 2)   // floor
    assert(SrpDedup.autoPlanesPerBand(64, 32) === 2)   // exact power
    assert(SrpDedup.autoPlanesPerBand(200000, 250) === 10)
  }

  test("planted near-dups: full recall at cos≈0.995, exact-precision pairs") {
    import spark.implicits._
    val dims = 32
    val base = randomCorpus(60, dims, seed = 7L)
    // 60 originals + a close copy of each (eps=0.1 → cos ≈ 0.995 on
    // gaussian vectors of norm ~√32)
    val rows = base ++ base.map { case (id, v) =>
      (id + 1000L, perturb(v, eps = 0.1, seed = id)) }
    val df = rows.toDF("id", "v")
    val pairs = SrpDedup.srpBandedPairs(df, "id", "v", dims,
      threshold = 0.9, bands = 8, planesPerBand = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every planted (i, i+1000) pair recovered: at cos ≥ 0.99 the
    // per-band collision prob is ≥ 0.97^4 ≈ 0.89, so 8 bands miss
    // with prob ≤ 1.6e-8 per pair — a flake here means a real bug
    base.foreach { case (id, _) =>
      assert(pairs.contains((id, id + 1000L)), s"missed planted pair $id")
    }
    // precision is exact by construction (verified cosine): every
    // returned pair must also appear in the brute-force pair set
    graft.expressions.GraftFunctions.register(spark)
    val brute = df.alias("a").join(df.alias("b"), col("a.id") < col("b.id"))
      .where(round(call_function(graft.expressions.GraftFunctions.Cosine,
        col("a.v"), col("b.v")), 6) >= 0.9)
      .select(col("a.id"), col("b.id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.subsetOf(brute), s"non-near-dup pairs returned: ${pairs -- brute}")
  }

  test("cosine column matches the brute-force value on every returned pair") {
    import spark.implicits._
    val dims = 16
    val base = randomCorpus(40, dims, seed = 11L)
    val rows = base ++ base.map { case (id, v) =>
      (id + 500L, perturb(v, eps = 0.05, seed = id + 99)) }
    val df = rows.toDF("id", "v")
    graft.expressions.GraftFunctions.register(spark)
    val got = SrpDedup.srpBandedPairs(df, "id", "v", dims,
      threshold = 0.95, bands = 8, planesPerBand = 3)
    val recomputed = got.alias("g")
      .join(df.select(col("id").as("id_a"), col("v").as("va")), Seq("id_a"))
      .join(df.select(col("id").as("id_b"), col("v").as("vb")), Seq("id_b"))
      .where(round(call_function(graft.expressions.GraftFunctions.Cosine,
        col("va"), col("vb")), 6) =!= col("cosine"))
    assert(recomputed.count() === 0L)
  }

  test("index probe: planted recall, equivalent to the self-join path") {
    import spark.implicits._
    val dims = 32
    val base = randomCorpus(60, dims, seed = 21L)
    val batch = base.map { case (id, v) =>
      (id + 1000L, perturb(v, eps = 0.1, seed = id)) }
    val index = SrpDedup.srpIndex(base.toDF("id", "v"), "id", "v",
      dims, bands = 8, planesPerBand = 4)
    val probe = SrpDedup.srpIndex(batch.toDF("id", "v"), "id", "v",
      dims, bands = 8, planesPerBand = 4)
    val got = SrpDedup.srpPairsAgainstIndex(probe, index, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // every planted (probe, original) pair recovered
    base.foreach { case (id, _) =>
      assert(got.exists(p => p._1 == id + 1000L && p._2 == id),
        s"missed planted probe pair $id")
    }
    // exactly the cross-side subset of the self-join over the union:
    // srpBandedPairs orders id_a < id_b, so cross pairs come out as
    // (original, probe) — flip and compare
    val self = SrpDedup.srpBandedPairs(
      (base ++ batch).toDF("id", "v"), "id", "v", dims,
      threshold = 0.9, bands = 8, planesPerBand = 4)
      .where(col("id_a") < 1000L && col("id_b") >= 1000L)
      .collect().map(r => (r.getLong(1), r.getLong(0), r.getDouble(2))).toSet
    assert(got === self)
  }

  test("auto variant picks the plane count from the corpus size") {
    import spark.implicits._
    val dims = 16
    val rows = randomCorpus(128, dims, seed = 3L)
    val df = rows.toDF("id", "v")
    // n=128, target=32 → 2 planes/band; same call with explicit r=2
    // must agree row-for-row (determinism of the whole pipeline)
    val auto = SrpDedup.srpBandedPairsAuto(df, "id", "v", dims,
      threshold = 0.5, bands = 4, targetBucket = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val explicit = SrpDedup.srpBandedPairs(df, "id", "v", dims,
      threshold = 0.5, bands = 4, planesPerBand = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(auto === explicit)
  }
}
