package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance (Levenshtein) fuzzy matching without a cross join.
  *
  * The reference reconciles entity names across sources by exact
  * config-driven joins (e.g. `bp-bentley-idms/AGT_Chirag_Platform.py`
  * tag matching); a fuzzy variant is the standard generalization for
  * dirty identifiers. Naively this is a cartesian product with a
  * quadratic distance filter — unusable beyond toy sizes.
  *
  * Blocking: PassJoin-style segment signatures (Li, Deng, Feng:
  * "PassJoin: A Partition-based Method for Similarity Joins", VLDB
  * 2012 — public algorithm, reimplemented here as Spark expressions).
  * Each BUILD string of length L splits into d+1 contiguous segments;
  * if ed(a,b) ≤ d, at least one segment is error-free (pigeonhole
  * over ≤ d edits) and appears EXACTLY in the other string, shifted
  * by at most d by preceding indels. So the PROBE side emits, for
  * every candidate build length L ∈ [len−d, len+d] and every segment
  * index, its substrings at starts within ±d of the segment start —
  * O(d³) keys per row, constant for small d — and the match is an
  * EQUI-join on (L, segment-index, substring). Unlike length-bucket
  * blocking, a corpus of same-length strings does NOT collapse into
  * one hot bucket: the join key carries 9-char substrings, which are
  * as selective as the data itself. The residual filter is Spark's
  * threshold-bounded `levenshtein(l, r, d)` — an O(d·n) banded DP.
  *
  * Scale: both sides shuffle on the signature key; skew only arises
  * if many strings share the same long substring at the same place,
  * in which case they genuinely are near-duplicates.
  */
object FuzzyJoin {

  /** Even partition of a length-L string into n segments: segment i
    * (0-based) start position, 1-based. First (L mod n) segments get
    * the extra char. */
  private def segStart(L: Column, n: Int, i: Int): Column = {
    // start_i = i*floor(L/n) + min(i, L mod n) + 1
    (lit(i) * floor(L / n).cast("int") +
      least(lit(i), pmod(L, lit(n)).cast("int")) + lit(1)).cast("int")
  }

  private def segLen(L: Column, n: Int, i: Int): Column =
    (floor(L / n).cast("int") +
      when(lit(i) < pmod(L, lit(n)).cast("int"), 1).otherwise(0)).cast("int")

  /** Directed fuzzy match: for each left row, the right rows within
    * `maxDist` edits. Output: (left id, right id, dist). */
  def byEditDistance(left: DataFrame, leftId: String, leftText: String,
                     right: DataFrame, rightId: String, rightText: String,
                     maxDist: Int): DataFrame = {
    require(maxDist >= 0)
    val n = maxDist + 1
    // BUILD (left): one signature per segment of the string itself
    val bl = length(col("lt")).cast("int")
    val buildKeys = array((0 until n).map(i => struct(
      bl.as("L"), lit(i).as("seg"),
      col("lt").substr(segStart(bl, n, i), segLen(bl, n, i)).as("sub"))): _*)
    val build = left.select(col(leftId).as("left_id"), col(leftText).as("lt"))
      .withColumn("k", explode(buildKeys))
      .select(col("left_id"), col("lt"), col("k.L").as("L"),
        col("k.seg").as("seg"), col("k.sub").as("sub"))
    // PROBE (right): for each candidate build length and segment,
    // substrings at starts within ±d of that segment's start
    val pl = length(col("rt")).cast("int")
    val probeKeys = flatten(transform(
      sequence(pl - maxDist, pl + maxDist), lv => {
        val L = lv.cast("int")
        flatten(array((0 until n).map { i =>
          val st = segStart(L, n, i)
          val ln = segLen(L, n, i)
          filter(transform(sequence(lit(-maxDist), lit(maxDist)), off => {
            val s = (st + off.cast("int")).cast("int")
            // L ≥ 0 (not ≥ 1): an empty build string still emits its
            // zero-length segments and must be probe-matchable
            when(L >= 0 && ln >= 0 && s >= 1 && s + ln - 1 <= pl,
              struct(L.as("L"), lit(i).as("seg"),
                col("rt").substr(s, ln).as("sub")))
          }), x => x.isNotNull)
        }: _*))
      }))
    val probe = right.select(col(rightId).as("right_id"), col(rightText).as("rt"))
      .withColumn("k", explode(probeKeys))
      .select(col("right_id"), col("rt"), col("k.L").as("L"),
        col("k.seg").as("seg"), col("k.sub").as("sub"))
    val d = levenshtein(col("lt"), col("rt"), maxDist)
    build.join(probe, Seq("L", "seg", "sub"))
      .select(col("left_id"), col("right_id"), col("lt"), col("rt"))
      .distinct() // a pair can match on several signatures
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
