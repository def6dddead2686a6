package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Windowed operators from the reference (SURVEY §2.7).
  *
  * - ChunkPlanner re-expresses the reference's row_number()-range work
  *   slicing (`bp-unstructured-netapp-ingestion/ModuleFunctions.py:142-172`):
  *   a global `row_number() OVER (ORDER BY keys)` sliced into fixed-size
  *   chunks. NOTE: a global (un-partitioned) row_number forces all rows
  *   through a single window partition — fine for control-plane listings
  *   (≤ millions of rows), wrong for data-plane work. At scale prefer
  *   `planChunksDistributed` which numbers within hash partitions.
  * - keepLatest reproduces the keep-latest dedup
  *   (`bp-unstructured-netapp-ingestion/ModuleFunctions.py:650-670`):
  *   RANK() OVER (PARTITION BY key ORDER BY ts DESC), delete rank>1.
  */
object Windows {

  /** Global row number + chunk id; `chunkSize` rows per chunk. */
  def planChunks(df: DataFrame, chunkSize: Int, orderKeys: Column*): DataFrame = {
    val w = Window.orderBy(orderKeys: _*)
    df.withColumn("rn", row_number().over(w))
      .withColumn("chunk_id", ((col("rn") - 1) / chunkSize).cast("long"))
  }

  /** Rows of the first `n` global row numbers — the reference's
    * `WHERE rn > offset AND rn <= offset+chunk` slice query.
    * Scale path: orderBy+limit first (distributed TakeOrdered), THEN
    * the global window over only `until` rows — never sorts the full
    * table through one window partition. */
  def chunkSlice(df: DataFrame, from: Long, until: Long, orderKeys: Column*): DataFrame = {
    // limit() is Int-bounded; a silent toInt would wrap negative and
    // return wrong rows — slices beyond 2^31 rows must be re-chunked
    require(until <= Int.MaxValue,
      s"chunkSlice until=$until exceeds Int.MaxValue; use smaller slices")
    val top = df.orderBy(orderKeys: _*).limit(until.toInt)
    val w = Window.orderBy(orderKeys: _*)
    top.withColumn("rn", row_number().over(w))
      .where(col("rn") > from && col("rn") <= until)
  }

  /** Scale path: number rows *within* spark partitions after a
    * repartition on a bucket key — no single-partition window. Chunk ids
    * are unique but not globally dense; sufficient for fan-out planning. */
  def planChunksDistributed(df: DataFrame, chunkSize: Int, bucket: Column): DataFrame = {
    val w = Window.partitionBy(bucket).orderBy(bucket)
    df.withColumn("bucket_rn", row_number().over(w))
      .withColumn("chunk_id",
        concat_ws("_", bucket, ((col("bucket_rn") - 1) / chunkSize).cast("long")))
  }

  /** Keep the newest row per key (ties broken by `tieBreak` desc). */
  def keepLatest(df: DataFrame, keys: Seq[Column], ts: Column, tieBreak: Column*): DataFrame = {
    val ord = (ts.desc +: tieBreak.map(_.desc))
    val w = Window.partitionBy(keys: _*).orderBy(ord: _*)
    val rn = Spread.freshCol(df, "__rn")
    df.withColumn(rn, row_number().over(w)).where(col(rn) === 1).drop(rn)
  }

  /** The stale complement: rows keepLatest would delete (the reference
    * DELETEs rank>1, `Step 3a:129`). */
  def staleRows(df: DataFrame, keys: Seq[Column], ts: Column, tieBreak: Column*): DataFrame = {
    val ord = (ts.desc +: tieBreak.map(_.desc))
    val w = Window.partitionBy(keys: _*).orderBy(ord: _*)
    val rn = Spread.freshCol(df, "__rn")
    df.withColumn(rn, row_number().over(w)).where(col(rn) > 1).drop(rn)
  }
}
