package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dedup.SemDedup

class SemDedupSpec extends SparkSpec {

  private lazy val emb =
    spark.read.parquet(s"$sf/embeddings.parquet")

  test("verdicts cover every point exactly once") {
    val v = SemDedup.semDedupVerdicts(emb, "vec_id", "embedding",
      k = 4, threshold = 0.4)
    assert(v.count() === emb.count())
    assert(v.groupBy(col("id")).count().where(col("count") > 1).count() === 0L)
  }

  test("a dropped point has a lower-id near-dup in its cluster; a kept one has none") {
    val v = SemDedup.semDedupVerdicts(emb, "vec_id", "embedding",
      k = 4, threshold = 0.4).persist()
    val byCluster = v.alias("x")
      .join(emb.select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("ev")), Seq("id"))
    // recompute the domination predicate independently (plain
    // cross-pair check, no salting) and compare verdicts
    graft.expressions.GraftFunctions.register(spark)
    val dominated = byCluster.alias("a")
      .join(byCluster.alias("b"),
        col("a.cluster_id") === col("b.cluster_id") &&
          col("b.id") < col("a.id") &&
          round(call_function(graft.expressions.GraftFunctions.Cosine,
            col("a.ev"), col("b.ev")), 6) >= 0.4)
      .select(col("a.id")).distinct().collect().map(_.getLong(0)).toSet
    val verdicts = v.collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Boolean]("keep")).toMap
    verdicts.foreach { case (id, keep) =>
      assert(keep === !dominated.contains(id),
        s"id=$id keep=$keep dominated=${dominated.contains(id)}")
    }
    v.unpersist()
  }

  test("autoK arithmetic: ceil(sqrt(n/2)) floored at kMin") {
    assert(SemDedup.autoK(500) === 16)
    assert(SemDedup.autoK(2000) === 32)
    assert(SemDedup.autoK(200000) === 317)
    assert(SemDedup.autoK(100) === 8)   // kMin floor
    assert(SemDedup.autoK(100, kMin = 4) === 8)  // ceil(sqrt(50))=8
  }

  test("auto verdicts equal fixed-k verdicts at the derived k") {
    val n = emb.count()
    val auto = SemDedup.semDedupVerdictsAuto(emb, "vec_id", "embedding",
      threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2))).toSet
    val fixed = SemDedup.semDedupVerdicts(emb, "vec_id", "embedding",
      k = SemDedup.autoK(n), threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2))).toSet
    assert(auto === fixed)
  }

  test("hier assignment at coarseK = k degenerates to the flat argmax") {
    // with every fine centroid also coarse, the coarse stage IS the
    // flat argmax and self-routing keeps the winner in its own cell —
    // so the two assignments must agree row-for-row
    val k = 12
    val cents = graft.similarity.KMeans.initCentroids(
      emb, "vec_id", "embedding", k)
    val flat = graft.similarity.KMeans.assign(emb, cents, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val hier = graft.similarity.KMeans.assignHier(
      emb, cents, "vec_id", "embedding", coarseK = k)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(hier === flat)
  }

  test("hier verdicts: one row per point, clusters in range, and " +
       "coarseK = k equals the flat verdicts") {
    val n = emb.count()
    val hier = SemDedup.semDedupVerdictsHier(emb, "vec_id", "embedding",
      k = 16, threshold = 0.4, coarseK = 4)
    assert(hier.count() === n)
    assert(hier.select(col("id")).distinct().count() === n)
    assert(hier.where(col("cluster_id") < 0 || col("cluster_id") >= 16)
      .count() === 0L)
    val degen = SemDedup.semDedupVerdictsHier(emb, "vec_id", "embedding",
      k = 16, threshold = 0.4, coarseK = 16)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2))).toSet
    val flat = SemDedup.semDedupVerdicts(emb, "vec_id", "embedding",
      k = 16, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2))).toSet
    assert(degen === flat)
  }

  test("batch verdicts: corpus near-dups drop, novel points keep, " +
       "in-batch keep-first applies") {
    import spark.implicits._
    val dims = 32
    val rnd = new scala.util.Random(17L)
    def vec() = Array.fill(dims)(rnd.nextGaussian())
    def perturb(v: Array[Double], seed: Long) = {
      val r = new scala.util.Random(seed)
      v.map(x => x + 0.02 * r.nextGaussian())
    }
    val corpus = (0 until 40).map(i => (i.toLong, vec()))
    val corpusDf = corpus.toDF("id", "v")
    val k = 8
    val centroids = graft.similarity.KMeans.initCentroids(
      corpusDf, "id", "v", k)
    val index = SemDedup.semDedupIndex(corpusDf, "id", "v", k)
    val fresh = (0 until 10).map(i => (1010L + i, vec()))
    val twin = vec()
    val batch = (
      corpus.take(10).map { case (id, v) => (1000L + id, perturb(v, id)) }
        ++ fresh
        ++ Seq((1020L, twin), (1021L, perturb(twin, 99L)))
      ).toDF("id", "v")
    val got = SemDedup.semDedupBatchVerdicts(batch, index, centroids,
        "id", "v", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).toMap
    assert(got.size === 22)
    // copies of corpus vectors: dominated by the corpus
    (0 until 10).foreach { i =>
      assert(!got(1000L + i), s"corpus copy ${1000 + i} should drop")
    }
    // novel vectors: nothing within cos 0.9 anywhere
    (0 until 10).foreach { i =>
      assert(got(1010L + i), s"novel point ${1010 + i} should keep")
    }
    // in-batch twins: keep-first — the lower id survives
    assert(got(1020L), "first twin should keep")
    assert(!got(1021L), "second twin should drop to its lower-id near-dup")
    spark.catalog.clearCache()
  }

  test("semDedup keeps exactly the keep=true rows, schema preserved") {
    val kept = SemDedup.semDedup(emb, "vec_id", "embedding",
      k = 4, threshold = 0.4)
    val keepIds = SemDedup.semDedupVerdicts(emb, "vec_id", "embedding",
      k = 4, threshold = 0.4)
      .where(col("keep")).select(col("id")).collect().map(_.getLong(0)).toSet
    assert(kept.columns.toSeq === emb.columns.toSeq)
    assert(kept.select(col("vec_id")).collect().map(_.getLong(0)).toSet
      === keepIds)
  }
}
