package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key time-series smoothing features.
  *
  * The classic recursive EWMA (s_t = α·x_t + (1−α)·s_{t−1}) is a
  * per-key sequential scan — unbounded look-back makes it both
  * engine-irreproducible in floats and hostile to windowed execution.
  * The truncated form here keeps the geometric weighting but bounds
  * the look-back to `depth` rows: with α = 1/2 the weights are the
  * integer powers 2^(depth−1)…1 over the last `depth` values, so the
  * numerator is an exact DECIMAL dot product over lag() columns — a
  * single per-key window pass, no recursion, bit-reproducible.
  * (The tail beyond `depth` rows contributes < 2^−depth of the mass;
  * at depth 8 that is < 0.4%.)
  *
  * Scale design: one window scan per key ordered by time — the same
  * shuffle/sort as any per-key sessionization; `depth` lag columns
  * stay inside whole-stage codegen, state per row is O(depth).
  */
object TimeSeries {

  /** Truncated α=1/2 EWMA over the last `depth` values per key.
    *
    * Rows earlier than `depth−1` positions into their key use the
    * weights renormalized over the values that exist (the standard
    * adjusted/finite-history convention), so the first row's EWMA is
    * its own value. Values are taken at DECIMAL(18,4) precision;
    * the result is the exact decimal numerator divided by the integer
    * weight sum, emitted as DOUBLE (deterministic: both operands are
    * exact, IEEE division is correctly rounded).
    *
    * Null values: a NULL current value yields a NULL ewma (nulls
    * propagate, round-9 ADVICE — previously an all-null first row
    * divided 0/0 into NaN); a NULL at lag position i simply
    * contributes weight 0 (skipped), the same treatment as a missing
    * early-history lag.
    *
    * @param valueCol numeric column (cast to DECIMAL(18,4) internally)
    * @param orderBy  total order within a key — include a tie-breaker
    * @return input columns + `ewma`
    */
  def truncatedEwma(df: DataFrame, keyCol: Column, valueCol: Column,
                    depth: Int, orderBy: Column*): DataFrame = {
    require(depth >= 1 && depth <= 30, s"depth out of range: $depth")
    val w = Window.partitionBy(keyCol).orderBy(orderBy: _*)
    val v = valueCol.cast("decimal(18,4)")
    // weight 2^(depth-1-i) on lag i; missing lags (early rows) drop
    // out of both numerator and denominator
    val terms = (0 until depth).map { i =>
      val li = if (i == 0) v else lag(v, i).over(w)
      val wt = 1L << (depth - 1 - i)
      (li, wt)
    }
    val num = terms.map { case (c, wt) =>
      when(c.isNotNull, c * lit(wt)).otherwise(lit(0).cast("decimal(18,4)"))
    }.reduce(_ + _)
    val den = terms.map { case (c, wt) =>
      when(c.isNotNull, lit(wt)).otherwise(lit(0L))
    }.reduce(_ + _)
    df.withColumn("ewma",
      when(v.isNotNull,
        num.cast("decimal(28,4)").cast("double") / den.cast("double")))
  }
}
