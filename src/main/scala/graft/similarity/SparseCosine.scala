package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Exact sparse TF-cosine document pairs via an inverted-index join —
  * the bag-of-words complement to the embedding near-dup and n-gram
  * Jaccard operators: two documents score high when they share the
  * same term DISTRIBUTION, not just shingles.
  *
  * Exactness contract: cosine itself needs two square roots, so the
  * emitted score is SQUARED cosine in ppm — cos² = dot²/(‖a‖²·‖b‖²)
  * is a ratio of exact integers, monotone in cosine, and therefore
  * interchangeable for ranking/thresholding while hash-matching any
  * engine (a float cosine never survives reduction-order changes).
  *
  * Scale shape: the pair generator is the inverted index — documents
  * meet ONLY on shared terms, so the O(n²) pair space never
  * materializes. The classic hazard is term-frequency skew: a
  * stop-word-grade term joins half the corpus with itself, so terms
  * with document frequency above `maxDf` are dropped from the INDEX
  * (their mass still counts in the norms — scores only sink, never
  * fake) — same df-prune trade the n-gram ppjoin documents. Dot
  * products aggregate with map-side combine on (a, b).
  */
object SparseCosine {

  /** Scored pairs (id_a, id_b, dot, cos2_ppm) with id_a < id_b and
    * cos²·10⁶ ≥ minCos2Ppm. `maxDf` caps the document frequency of
    * index terms (skew guard); norms always use ALL terms. */
  def cosinePairs(docs: DataFrame, idCol: String, textCol: String,
                  minCos2Ppm: Long, maxDf: Long = 1000L): DataFrame = {
    require(minCos2Ppm >= 0 && maxDf >= 2)
    val tf = docs
      .select(col(idCol).as("id"),
        explode(TextFunctions.words(col(textCol))).as("w"))
      .groupBy(col("id"), col("w")).agg(count(lit(1)).as("tf"))
      .persist() // feeds norms, the df prune, and both join sides
    tf.count()
    val norms = tf.groupBy(col("id"))
      .agg(sum(col("tf") * col("tf")).as("n2"))
    val keep = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
      .where(col("df") >= 2 && col("df") <= maxDf) // df=1 never pairs
      .select(col("w"))
    val indexed = tf.join(keep, Seq("w"))
    val dots = indexed.alias("a")
      .join(indexed.alias("b"),
        col("a.w") === col("b.w") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(sum(col("a.tf") * col("b.tf")).as("dot"))
    dots
      .join(norms.select(col("id").as("id_a"), col("n2").as("na")), Seq("id_a"))
      .join(norms.select(col("id").as("id_b"), col("n2").as("nb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("dot"),
        // DECIMAL(38,0): 10⁶·dot² overflows a long once docs reach
        // ~10⁵ tokens; all quantities non-negative so div ≡ floor
        expr("cast((1000000 * cast(dot as decimal(38,0)) * dot) " +
          "div (cast(na as decimal(38,0)) * nb) as bigint)")
          .as("cos2_ppm"))
      .where(col("cos2_ppm") >= minCos2Ppm)
  }
}
