package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.similarity.KMeans

class KMeansSpec extends SparkSpec {

  private lazy val emb =
    spark.read.parquet(s"$sf/embeddings.parquet")

  test("initCentroids is the k lowest ids with dense 0-based labels") {
    val c = KMeans.initCentroids(emb, "vec_id", "embedding", k = 4)
      .orderBy(col("cluster_id")).collect()
    assert(c.map(_.getAs[Int]("cluster_id")).toSeq == Seq(0, 1, 2, 3))
    assert(c.forall(_.getAs[Seq[Double]]("centroid").nonEmpty))
  }

  test("assign gives every point exactly one cluster, seeds map to themselves") {
    val c = KMeans.initCentroids(emb, "vec_id", "embedding", k = 4)
    val a = KMeans.assign(emb, c, "vec_id", "embedding")
    assert(a.count() === emb.count())
    assert(a.groupBy(col("id")).count().where(col("count") > 1).count() === 0L)
    // a seed vector has cosine 1.0 with its own centroid
    val seedIds = emb.orderBy(col("vec_id")).limit(4)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val selfScores = a.where(col("id").isin(seedIds.toSeq: _*))
      .select(col("score")).collect().map(_.getDouble(0))
    assert(selfScores.forall(_ == 1.0))
  }

  test("fit runs Lloyd rounds and returns k centroids of input dim") {
    val dim = emb.select(size(col("embedding"))).first().getInt(0)
    val c = KMeans.fit(emb, "vec_id", "embedding", k = 4, iters = 2)
      .collect()
    assert(c.length === 4)
    assert(c.forall(_.getAs[Seq[Double]]("centroid").length == dim))
  }

  test("lloyd update means stay within the data's component range") {
    val c = KMeans.initCentroids(emb, "vec_id", "embedding", k = 4)
    val m = KMeans.lloydMeansLong(emb, c, "vec_id", "embedding")
    val bad = m.where(col("mean") < -1.5 || col("mean") > 1.5).count()
    assert(bad === 0L)
    // every (cluster, dim) cell appears at most once
    assert(m.groupBy(col("cluster_id"), col("dim")).count()
      .where(col("count") > 1).count() === 0L)
  }

  test("assignHier: every point lands in a fine cell routed to its " +
       "coarse winner (random corpus)") {
    import spark.implicits._
    val dims = 12
    val rnd = new scala.util.Random(41L)
    val rows = (0 until 80).map(i =>
      (i.toLong, Array.fill(dims)(rnd.nextGaussian())))
    val df = rows.toDF("id", "v")
    val k = 9
    val coarseK = 3
    val cents = KMeans.initCentroids(df, "id", "v", k)
    val hier = KMeans.assignHier(df, cents, "id", "v", coarseK)
    assert(hier.count() === 80L)
    assert(hier.select(col("id")).distinct().count() === 80L)
    // recompute the routing serially and check cell-consistency:
    // point -> argmax coarse; its fine cell must route to that coarse
    val cvecs = cents.orderBy(col("cluster_id")).collect()
      .map(r => (r.getAs[Int]("cluster_id"), r.getAs[Seq[Double]]("centroid").toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      BigDecimal(dot / (na * nb))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val coarse = cvecs.take(coarseK)
    def bestCoarse(v: Array[Double]): Int =
      coarse.map { case (cid, cv) => (cid, cos(v, cv)) }
        .maxBy { case (cid, s) => (s, -cid) }._1
    val route = cvecs.map { case (cid, cv) => cid -> bestCoarse(cv) }.toMap
    val byId = rows.toMap
    hier.collect().foreach { r =>
      val id = r.getLong(0); val cell = r.getInt(1)
      assert(route(cell) === bestCoarse(byId(id)),
        s"point $id assigned to cell $cell routed to ${route(cell)}, " +
          s"but its coarse winner is ${bestCoarse(byId(id))}")
    }
  }

  test("silhouette: counts cover the corpus, values in [0, 1e6], " +
       "tight planted clusters score high") {
    import spark.implicits._
    // 4 well-separated direction prototypes, 15 tightly-perturbed
    // members each; ids ordered so the 4 seeds are one per prototype
    val dims = 16
    val rnd = new scala.util.Random(13L)
    val protos = Array.fill(4)(Array.fill(dims)(rnd.nextGaussian() * 3))
    val rows = (0 until 60).map { i =>
      val p = protos(i % 4)
      (i.toLong, p.map(x => x + 0.05 * rnd.nextGaussian()))
    }
    val df = rows.toDF("id", "v")
    val cents = KMeans.initCentroids(df, "id", "v", k = 4)
    val sil = KMeans.silhouetteByCluster(df, cents, "id", "v").collect()
    assert(sil.map(_.getAs[Long]("n")).sum === 60L)
    val ppm = sil.map(_.getAs[Long]("mean_sil_ppm"))
    // assignment is argmax, so a <= b and silhouette is non-negative
    assert(ppm.forall(v => v >= 0L && v <= 1000000L))
    // tight clusters around orthogonal-ish prototypes: own-centroid
    // distance is tiny vs the best foreign centroid
    assert(ppm.forall(_ > 500000L), s"low silhouette: ${ppm.mkString(",")}")
  }

  test("silhouette rejects k = 1 up front (no 'best other' centroid)") {
    import spark.implicits._
    val df = Seq((1L, Array(1.0, 0.0)), (2L, Array(0.0, 1.0))).toDF("id", "v")
    val one = KMeans.initCentroids(df, "id", "v", k = 1)
    val e = intercept[IllegalArgumentException] {
      KMeans.silhouetteByCluster(df, one, "id", "v")
    }
    assert(e.getMessage.contains("k >= 2"))
  }
}
