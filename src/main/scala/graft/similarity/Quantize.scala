package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalar quantization (SQ8-style) of an embedding column: each
  * dimension gets a corpus-wide [min, max] range and every value maps
  * to an integer code `0..levels-1`. At serving time the codes array
  * is `levels <= 256 ? 1 : 2` bytes per dimension instead of 4-8 — the
  * difference between a 100 TB vector corpus fitting executor memory
  * for ANN re-ranking or not.
  *
  * Everything here is chosen for cross-engine determinism:
  *  - per-dim stats are MIN/MAX (exact selections, unlike a
  *    mean/stddev whose float-sum reduction order varies);
  *  - the code is `floor(t * (levels-1) + 0.5)` — floor is
  *    reduction-order-free and avoids engines' differing round()
  *    tie-breaking (HALF_UP vs HALF_EVEN);
  *  - the stats frame is tiny (one row per dimension) and broadcast,
  *    so the whole encode is scan → broadcast-join → project: one pass
  *    over the corpus, no shuffle of vector data at all.
  *
  * `encode` keeps one row per (vector, dim) for auditing;
  * `auditStats` folds them to a per-vector contract (code checksum +
  * worst reconstruction error) — the shape a 100 TB pipeline persists
  * next to the codes to prove the quantizer's error bound holds.
  */
object Quantize {

  /** Per-dimension corpus ranges: (dim, lo, hi). */
  def dimRanges(corpus: DataFrame, vecCol: String): DataFrame =
    corpus.select(posexplode(col(vecCol).cast("array<double>"))
        .as(Seq("dim", "val")))
      .groupBy(col("dim"))
      .agg(min(col("val")).as("lo"), max(col("val")).as("hi"))

  /** (id, dim, val, code) rows; constant dimensions (lo == hi) encode
    * as 0. `levels` is the number of representable cells (256 = SQ8). */
  def encode(corpus: DataFrame, idCol: String, vecCol: String,
             levels: Int = 256): DataFrame = {
    require(levels >= 2, s"levels must be >= 2: $levels")
    val ranges = dimRanges(corpus, vecCol)
    corpus.select(col(idCol).as("id"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("dim", "val")))
      .join(broadcast(ranges), Seq("dim"))
      .select(col("id"), col("dim"), col("val"),
        when(col("hi") === col("lo"), lit(0L))
          .otherwise(floor((col("val") - col("lo")) / (col("hi") - col("lo"))
            * (levels - 1) + 0.5).cast("long")).as("code"),
        col("lo"), col("hi"))
  }

  /** Per-vector quantization contract: dims, an integer code checksum
    * (position-weighted so permuted codes don't collide), and the
    * worst absolute reconstruction error across dimensions. */
  def auditStats(corpus: DataFrame, idCol: String, vecCol: String,
                 levels: Int = 256): DataFrame = {
    val e = encode(corpus, idCol, vecCol, levels)
    val recon = when(col("hi") === col("lo"), col("lo"))
      .otherwise(col("lo") + col("code") * (col("hi") - col("lo"))
        / (levels - 1))
    e.groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("dims"),
        sum(col("code") * (col("dim") + 1)).as("code_sum"),
        round(max(abs(col("val") - recon)), 6).as("max_err"))
  }
}
