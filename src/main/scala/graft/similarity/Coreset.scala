package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Converge.SanitizedCheckpoint

/** Greedy k-center (farthest-point / Gonzalez) coreset selection over
  * an embedding column — the diversity-sampling primitive of data
  * curation: pick the point farthest from everything chosen so far,
  * k times, giving a 2-approximation of the optimal k-center cover.
  *
  * Scale shape: the state is ONE (id, min-dist) row per point; each
  * of the k rounds is a broadcast 1-row distance update (new center's
  * vector against every point, fused `least`) + a TakeOrdered(1)
  * argmax — k linear scans total, no pairwise stage anywhere. The
  * per-round 1-row collect is the BPE-argmax class of bounded
  * control-plane transfer; k is a small constant by definition of the
  * method. Plan depth is truncated per round with localCheckpoint.
  *
  * Exactness: cosine rounded to 6 places, distance in ppm ints
  * (`round((1 − cos₆)·10⁶)` — exact, the value is within 10⁻¹⁰ of an
  * integer), min/argmax over ints with lowest-id tie-break — every
  * round replayable by an independent engine. The seed is the lowest
  * id. Returns (sel_order 1..k, center_id, radius_ppm) where
  * radius_ppm is the chosen point's min-distance at selection time —
  * the coverage-radius curve that tells you when to stop adding
  * centers; the seed's radius is NULL. Selection stops early once the
  * farthest point is at distance 0 — coverage is complete (every
  * remaining point coincides with a chosen center), so asking for
  * k > |distinct points| returns fewer than k rows instead of
  * silently re-emitting already-covered points with radius 0. */
object Coreset {

  def kCenterGreedy(points: DataFrame, idCol: String, vecCol: String,
                    k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    graft.expressions.GraftFunctions.register(points.sparkSession)
    val spark = points.sparkSession
    val p = graft.operators.Spread.ensure(points
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v")))
      .persist()
    require(p.count() > 0, "kCenterGreedy needs a non-empty corpus")
    def distTo(centerVec: Array[Double]): org.apache.spark.sql.Column = {
      val cv = array(centerVec.map(lit(_)): _*)
      val cos6 = round(call_function(
        graft.expressions.GraftFunctions.Cosine, col("v"), cv), 6)
      round((lit(1.0d) - cos6) * 1000000.0d).cast("long")
    }
    // the argmax row carries the chosen vector, so each round is ONE
    // bounded 1-row collect (the BPE-argmax class)
    val seedRow = p.select(col("id"), col("v")).orderBy(col("id"))
      .limit(1).head()
    val seedId = seedRow.get(0)
    var chosen = List[(Any, Option[Long])]((seedId, None))
    var mind = p.select(col("id"), col("v"),
      distTo(seedRow.getSeq[Double](1).toArray).as("d")).sanitizedCheckpoint()
    var covered = false
    for (_ <- 2 to k if !covered) {
      val far = mind.orderBy(col("d").desc, col("id")).limit(1).head()
      if (far.getLong(2) == 0L) covered = true // nothing left to cover
      else {
        chosen ::= (far.get(0), Some(far.getLong(2)))
        mind = mind.select(col("id"), col("v"),
          least(col("d"), distTo(far.getSeq[Double](1).toArray)).as("d"))
          .sanitizedCheckpoint()
      }
    }
    p.unpersist(blocking = false)
    val sel = chosen.reverse.zipWithIndex
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("sel_order",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      mind.schema.fields(0).copy(name = "center_id"),
      org.apache.spark.sql.types.StructField("radius_ppm",
        org.apache.spark.sql.types.LongType, nullable = true)))
    val rows: java.util.List[org.apache.spark.sql.Row] =
      java.util.Arrays.asList(sel.map { case ((id, r), i) =>
        org.apache.spark.sql.Row(i + 1, id, r.map(Long.box).orNull)
      }: _*)
    spark.createDataFrame(rows, schema)
  }
}
