package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.similarity.{KMeans, MixtureEmbeddings, Quantize}

/** Structural invariants of the clusterable-embedding fixture —
  * the properties that make it the regime where the residual-
  * quantization argument is testable: planted coarse centers with
  * exactly-zero residuals, a shared within-cell atom vocabulary,
  * and binary-exact constants (the cross-engine determinism the
  * q_pq_ivfadc_mix oracle hash rests on is gated by the driver;
  * here we pin the Spark-side structure). */
class MixtureEmbeddingsSpec extends SparkSpec {

  import spark.implicits._

  private def base(n: Int) = {
    val rnd = new scala.util.Random(7)
    (0 until n).map { i =>
      (i.toLong, Array.fill(MixtureEmbeddings.Dims)(rnd.nextGaussian()).toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("rows 0..Clusters-1 are the exact planted centers") {
    val mix = MixtureEmbeddings.table(base(40), "vec_id", "embedding")
    val got = mix.where(col("vec_id") < MixtureEmbeddings.Clusters)
      .orderBy("vec_id")
      .as[(Long, Seq[Double])].collect()
    got.foreach { case (id, v) =>
      val want = (0 until MixtureEmbeddings.Dims)
        .map(d => MixtureEmbeddings.centerValue(id.toInt, d))
      assert(v === want, s"row $id is not its planted center")
    }
  }

  test("coarse residuals of the planted centers are exactly zero and " +
      "non-center residuals are atom + noise (bounded)") {
    val mix = MixtureEmbeddings.table(base(64), "vec_id", "embedding")
    val centroids = KMeans.initCentroids(mix, "vec_id", "embedding",
      k = MixtureEmbeddings.Clusters)
    val cells = KMeans.assign(mix, centroids, "vec_id", "embedding")
      .select(col("id"), col("cluster_id").as("cell"))
    // every vector lands in its planted cluster: the centers are the
    // k lowest ids, so cell(i) must equal i mod Clusters when the
    // center separation dominates atom + noise (it does: center
    // coords span [-1, 1) vs atom 0.5 + noise 1/16 per dim)
    val wrong = cells.where(col("cell") =!=
      pmod(col("id"), lit(MixtureEmbeddings.Clusters))).count()
    assert(wrong === 0, s"$wrong vectors landed outside their planted cell")
    val res = Quantize.residuals(mix, "vec_id", "embedding", cells, centroids)
    val zeroRes = res.where(col("id") < MixtureEmbeddings.Clusters)
      .select(expr("max(aggregate(rv, 0.0D, (a, x) -> a + abs(x)))"))
      .head().getDouble(0)
    assert(zeroRes === 0.0, "planted centers must have exactly-zero residual")
  }

  test("the atom layer is a shared vocabulary: at most Atoms distinct " +
      "noise-free residual patterns per subspace") {
    // strip the noise by zeroing the base vectors: residual = atom
    val zeroBase = (0 until 80).map { i =>
      (i.toLong, Seq.fill(MixtureEmbeddings.Dims)(0.0))
    }.toDF("vec_id", "embedding")
    val mix = MixtureEmbeddings.table(zeroBase, "vec_id", "embedding")
    val centroids = KMeans.initCentroids(mix, "vec_id", "embedding",
      k = MixtureEmbeddings.Clusters)
    val cells = KMeans.assign(mix, centroids, "vec_id", "embedding")
      .select(col("id"), col("cluster_id").as("cell"))
    val res = Quantize.residuals(mix, "vec_id", "embedding", cells, centroids)
      .where(col("id") >= MixtureEmbeddings.Clusters)
    val sub = MixtureEmbeddings.SubDims
    val distinct = res.select(explode(expr(
        s"transform(sequence(0, ${MixtureEmbeddings.Dims / sub - 1}), " +
          s"s -> struct(s AS sub, slice(rv, s * $sub + 1, $sub) AS sv))"))
        .as("e"))
      .select(col("e.sub"), col("e.sv"))
      .groupBy(col("sub"))
      .agg(countDistinct(col("sv")).as("n"))
      .agg(max(col("n"))).head().getLong(0)
    assert(distinct <= MixtureEmbeddings.Atoms,
      s"a subspace carries $distinct > ${MixtureEmbeddings.Atoms} " +
        "distinct noise-free residuals — the atom vocabulary leaked")
  }

  test("the projection is deterministic across evaluations") {
    val b = base(50)
    val a1 = MixtureEmbeddings.table(b, "vec_id", "embedding")
      .orderBy("vec_id").as[(Long, Seq[Double])].collect()
    val a2 = MixtureEmbeddings.table(b, "vec_id", "embedding")
      .orderBy("vec_id").as[(Long, Seq[Double])].collect()
    assert(a1 === a2)
  }
}
