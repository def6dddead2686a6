package graft.sketch

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** The KMV sketch as a typed `Aggregator`: per group, the k smallest
  * DISTINCT hash values, as an ascending array. This is the
  * bounded-state form [[Sketches.kmvDistinctByKey]]'s window phrasing
  * can't give a STREAM: as a streaming aggregation the state per
  * window is this O(k) buffer — "distinct users per hour, forever" in
  * a few hundred bytes per hour — and as a batch aggregate it runs as
  * ObjectHashAggregate with map-side partials (only k-arrays shuffle,
  * never the hash multiset).
  *
  * Merge is a bounded sorted-distinct union: associative, commutative,
  * duplicate-safe — exactly the sketch-merge contract, so partial
  * sketches from separate scans/batches combine losslessly. Convert
  * the minima to an estimate with [[Sketches.estimateFromMinima]]
  * (deterministic — the DuckDB oracle reproduces the same number).
  */
class KmvMinima(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  require(k >= 2, s"k must be >= 2, got $k")

  def zero: Array[Long] = Array.emptyLongArray

  /** Insert h into an ascending sorted-distinct bounded buffer. */
  private def insert(buf: Array[Long], h: Long): Array[Long] = {
    if (buf.length == k && h >= buf(buf.length - 1)) return buf
    var i = 0
    while (i < buf.length && buf(i) < h) i += 1
    if (i < buf.length && buf(i) == h) return buf // already present
    val n = math.min(buf.length + 1, k)
    val out = new Array[Long](n)
    System.arraycopy(buf, 0, out, 0, i)
    if (i < n) {
      out(i) = h
      System.arraycopy(buf, i, out, i + 1, n - i - 1)
    }
    out
  }

  def reduce(buf: Array[Long], h: Long): Array[Long] = insert(buf, h)

  def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    b.foldLeft(a)(insert)

  def finish(buf: Array[Long]): Array[Long] = buf

  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

object KmvMinima {
  /** Column-form UDAF over pre-hashed longs:
    * `KmvMinima(64)(TextFunctions.hash64(col))`. */
  def apply(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new KmvMinima(k), Encoders.scalaLong)
}
