package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance (Levenshtein) fuzzy matching without a cross join.
  *
  * The reference reconciles entity names across sources by exact
  * config-driven joins (e.g. `bp-bentley-idms/AGT_Chirag_Platform.py`
  * tag matching); a fuzzy variant is the standard generalization for
  * dirty identifiers. Naively this is a cartesian product with a
  * quadratic distance filter — unusable beyond toy sizes.
  *
  * Blocking that keeps it an EQUI-join, losslessly: edit distance ≤ d
  * implies |len(a) − len(b)| ≤ d, so strings bucketed by
  * `floor(len / (d+1))` can only match same-or-adjacent buckets. The
  * probe side emits bkt−1/bkt/bkt+1 and the join key is the bucket —
  * Spark hash-partitions both sides, no cross product in the plan
  * (PlanLint-clean). Within a bucket the residual filter uses
  * Spark's threshold-bounded `levenshtein(l, r, d)` — an O(d·n)
  * banded DP with early exit, not the full O(n²) matrix.
  *
  * At 100 TB the bucket count scales with string length, so one bucket
  * can still be hot (e.g. all names length 12-14). The candidate
  * volume within a bucket is quadratic in that bucket's size —
  * callers matching huge same-length corpora should pre-block further
  * (first tokens, q-gram prefixes — see `Dedup.ngramJaccardPairs` for
  * the lossless prefix machinery).
  */
object FuzzyJoin {

  /** Directed fuzzy match: for each left row, the right rows within
    * `maxDist` edits. Output: (left id, right id, dist). */
  def byEditDistance(left: DataFrame, leftId: String, leftText: String,
                     right: DataFrame, rightId: String, rightText: String,
                     maxDist: Int): DataFrame = {
    require(maxDist >= 0)
    val w = maxDist + 1
    val build = left.select(col(leftId).as("left_id"),
        col(leftText).as("lt"))
      .withColumn("bkt", floor(length(col("lt")) / w))
    val probe = right.select(col(rightId).as("right_id"),
        col(rightText).as("rt"))
      .withColumn("bkt", explode(array(
        floor(length(col("rt")) / w) - 1,
        floor(length(col("rt")) / w),
        floor(length(col("rt")) / w) + 1)))
    val d = levenshtein(col("lt"), col("rt"), maxDist)
    build.join(probe, Seq("bkt"))
      .where(abs(length(col("lt")) - length(col("rt"))) <= maxDist)
      .select(col("left_id"), col("right_id"), d.as("dist"))
      .where(col("dist") =!= -1)
  }

  /** Undirected self-match: distinct pairs (id_a < id_b) within
    * `maxDist` edits of each other. */
  def selfPairs(df: DataFrame, idCol: String, textCol: String,
                maxDist: Int): DataFrame =
    byEditDistance(df, idCol, textCol, df, idCol, textCol, maxDist)
      .where(col("left_id") < col("right_id"))
      .select(col("left_id").as("id_a"), col("right_id").as("id_b"),
        col("dist"))
}
