package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout for multi-dimensional file
  * skipping.
  *
  * Sorting a table by ONE column gives parquet min/max footers that
  * prune scans on that column only — a filter on a second column
  * still reads every file. Interleaving the bits of two columns into
  * one Morton code and range-partitioning + sorting by it gives every
  * file a small bounding BOX in (x, y) space, so point/range filters
  * on EITHER dimension (or both) skip most files. This is the same
  * layout trick the lakehouse engines call OPTIMIZE ZORDER BY; here
  * it is plain declarative Spark — an expression, a
  * `repartitionByRange`, and a sorted write — so it works on any
  * sink that keeps per-file column stats.
  *
  * The interleave is a 2·bits-term OR chain of shift/mask Columns:
  * entirely inside whole-stage codegen (no UDF, no HOF lambda), and
  * mirrored term-for-term by the DuckDB oracle generated from the
  * same loop.
  */
object ZOrder {

  /** Morton code of two non-negative columns, `bits` low bits each:
    * bit i of x lands at position 2i, bit i of y at 2i+1. Columns are
    * masked to `bits` via pmod so any integral input is safe. */
  def interleave2(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits in [1,31]")
    val m = 1L << bits
    val xm = pmod(x.cast("long"), lit(m))
    val ym = pmod(y.cast("long"), lit(m))
    (0 until bits).map { i =>
      shiftleft(shiftright(xm, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(ym, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Write `df` as `numFiles` parquet files z-ordered on (xCol,
    * yCol): range-partition by the Morton code (equal-count ranges
    * via sampling, so skew in z-space still balances file sizes),
    * sort within each file, drop the helper column. Per-file min/max
    * footers then bound BOTH columns tightly — the skipping property
    * `ZOrderSpec` measures. */
  def zorderWrite(df: DataFrame, xCol: String, yCol: String, bits: Int,
                  numFiles: Int, path: String): Unit = {
    val zc = Spread.freshCol(df, "__z")
    df.withColumn(zc, interleave2(col(xCol), col(yCol), bits))
      .repartitionByRange(numFiles, col(zc))
      .sortWithinPartitions(col(zc))
      .drop(zc)
      .write.mode("overwrite").parquet(path)
  }
}
