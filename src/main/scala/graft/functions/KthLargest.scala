package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Exact k-th largest value per group as a typed `Aggregator` UDAF —
  * the §2.11 custom-aggregation surface done the Spark-4 way.
  *
  * Semantics: the k-th largest value counting duplicates; for a group
  * with fewer than k values, the group minimum (i.e. the n-th largest
  * of n). Inputs must be non-null (filter first).
  *
  * Scale design: state is a BOUNDED descending array of at most k
  * values, so the plan runs as ObjectHashAggregate with map-side
  * partial aggregation — each task reduces its partitions to O(k)
  * state and only those tiny buffers shuffle. The window-function
  * phrasing of the same question (`row_number() ... WHERE rn = k`)
  * must shuffle EVERY row to its group's reducer and sort n·log n per
  * group; at 100 TB that is the difference between a few-KB-per-group
  * exchange and a full-table sort. Merge is associative and
  * commutative, so the result is order-independent and exact (values
  * are selected, never arithmetically combined — no float-order
  * drift against the oracle).
  */
class KthLargest(k: Int) extends Aggregator[Double, Array[Double], Double] {
  require(k >= 1, s"k must be >= 1, got $k")

  def zero: Array[Double] = Array.emptyDoubleArray

  /** Insert v into a descending-sorted bounded buffer. */
  private def insert(buf: Array[Double], v: Double): Array[Double] = {
    if (buf.length == k && v <= buf(buf.length - 1)) return buf
    // find insertion point in the descending order (linear: k is tiny
    // and usually the early-exit above already filtered the row)
    var i = 0
    while (i < buf.length && buf(i) >= v) i += 1
    val n = math.min(buf.length + 1, k)
    val out = new Array[Double](n)
    System.arraycopy(buf, 0, out, 0, i)
    if (i < n) {
      out(i) = v
      System.arraycopy(buf, i, out, i + 1, n - i - 1)
    }
    out
  }

  def reduce(buf: Array[Double], v: Double): Array[Double] = insert(buf, v)

  def merge(a: Array[Double], b: Array[Double]): Array[Double] =
    b.foldLeft(a)(insert)

  def finish(buf: Array[Double]): Double =
    if (buf.isEmpty) Double.NaN else buf(math.min(k, buf.length) - 1)

  def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object KthLargest {
  /** Column-form UDAF: `kthLargest(10)(col("x"))`. */
  def apply(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new KthLargest(k), Encoders.scalaDouble)
}
