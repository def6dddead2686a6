package graft.validate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join/aggregation key-skew report — the "does this key need
  * salting" decision input (see
  * [[graft.operators.SkewJoin.saltedJoin]] for the cure this
  * diagnoses).
  *
  * Scale shape: ONE map-combined groupBy over the raw table is the
  * only full pass; everything after runs over |distinct keys| count
  * rows. The top-k heaviest keys come from `orderBy().limit(k)`
  * (plans as TakeOrderedAndProject — a per-partition heap + driver
  * merge of k·partitions rows, never a global sort), and the final
  * rank/cumulative window runs over exactly k rows. All shares are
  * integer per-mille (n·1000 div total), so the report hash-matches
  * any engine.
  */
object Skew {

  /** Top-k heaviest keys with exact counts, per-mille share, and
    * cumulative share, plus the global key stats every row carries
    * (n_keys, total_rows, max/total imbalance). A `share_pm` near
    * 1000/partitions means one task owns that key's whole shuffle
    * bucket — the salting threshold. */
  def keySkewReport(df: DataFrame, keyCol: String, topK: Int = 10): DataFrame = {
    require(topK > 0, "topK must be positive")
    val sizes = df.groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("n"))
    val stats = sizes.agg(sum(col("n")).as("total_rows"),
      count(lit(1)).as("n_keys"))
    val top = sizes.orderBy(col("n").desc, col("key")).limit(topK)
    // rank + running share over the k already-selected rows — the
    // single-partition window is over ≤ topK rows by construction
    val w = Window.orderBy(col("n").desc, col("key"))
    top.crossJoin(broadcast(stats))
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("share_pm", expr("n * 1000 div total_rows"))
      .withColumn("cum_share_pm",
        expr("sum(n) over (order by n desc, key) * 1000 div total_rows"))
      .select(col("rk"), col("key"), col("n"), col("share_pm"),
        col("cum_share_pm"), col("n_keys"), col("total_rows"))
  }
}
