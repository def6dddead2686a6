package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-overlap self-join as a tiled equi-join.
  *
  * The naive plan for "all pairs of rows whose [start, end] ranges
  * overlap" is a non-equi join — Spark executes that as a (broadcast)
  * nested loop, which is quadratic per key and unusable at scale. The
  * scale-correct shape replicates each interval to the fixed-width
  * time tiles it covers and joins on `(key, tile)`:
  *
  *  - the shuffle key is `(key, tile)`, so a hot key's work spreads
  *    across its time range instead of landing on one reducer;
  *  - candidate pairs only form inside a tile, so cost is bounded by
  *    per-tile density, not per-key row count squared;
  *  - each surviving pair is attributed to exactly ONE tile — the one
  *    containing the overlap start `max(a.start, b.start)` (that
  *    instant lies in both intervals, hence in both tile ranges) — so
  *    no `distinct` pass is needed to dedupe multi-tile matches.
  *
  * `tileSeconds` trades replication (long intervals touch
  * `len/tileSeconds + 1` tiles) against per-tile pair density; set it
  * near the typical interval length.
  *
  * Reference analogue: the audit-window overlap checks that
  * `bp-scala-api-ingestions` runs as driver-side loops over job-queue
  * rows; here the same semantics is one shuffle.
  */
object IntervalJoin {

  /** All unordered pairs of rows sharing `keyCol` whose
    * `[startCol, endCol]` ranges (inclusive, any numeric/castable-to-
    * long resolution — epoch seconds, epoch days) overlap. Output is
    * one row per pair: `(keyCol, a_id, b_id)` with `a_id < b_id`.
    * Rows with `start > end` (malformed intervals) are dropped. */
  def overlapPairs(df: DataFrame, keyCol: String, idCol: String,
                   startCol: String, endCol: String,
                   tileSeconds: Long): DataFrame = {
    require(tileSeconds > 0, s"tileSeconds must be positive: $tileSeconds")
    val base = df.select(col(keyCol).as("k"), col(idCol).as("id"),
        col(startCol).cast("long").as("s"), col(endCol).cast("long").as("e"))
      .where(col("s") <= col("e"))
    val tile = (c: org.apache.spark.sql.Column) =>
      floor(c / tileSeconds).cast("long")
    val tiled = base.withColumn("tile",
      explode(sequence(tile(col("s")), tile(col("e")))))
    val a = tiled.select(col("k"), col("tile"), col("id").as("a_id"),
      col("s").as("a_s"), col("e").as("a_e"))
    val b = tiled.select(col("k"), col("tile"), col("id").as("b_id"),
      col("s").as("b_s"), col("e").as("b_e"))
    a.join(b, Seq("k", "tile"))
      .where(col("a_id") < col("b_id") &&
        col("a_s") <= col("b_e") && col("b_s") <= col("a_e") &&
        col("tile") === tile(greatest(col("a_s"), col("b_s"))))
      .select(col("k").as(keyCol), col("a_id"), col("b_id"))
  }
}
