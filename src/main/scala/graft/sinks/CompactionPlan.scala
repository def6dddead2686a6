package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Small-file compaction PLANNING as a dataframe transform: given a
  * file inventory (directory, name, size), assign every file to a
  * rewrite group whose total size lands near `targetBytes` — the
  * planning half of the compaction the reference runs blind
  * (`Sinks.compactTo` rewrites a partition to a fixed file count;
  * CREATE-TABLE-AS-style jobs guess). Planning from the inventory
  * means each directory gets the file count its BYTES justify.
  *
  * The packing is next-fit over a deterministic file order: a file's
  * group is its cumulative START offset divided by the target — one
  * window cumsum per directory, no driver-side loop, no sort beyond
  * the per-directory window. Groups can overshoot by at most one file
  * (and an oversized file simply advances later starts past its
  * spanned targets), which is what a rewrite job wants: never split a
  * source file across output groups.
  *
  * At 100 TB the inventory comes from the distributed file listing
  * ([[graft.sources.Sources]] file walk) and the plan's (dir, group)
  * pairs drive per-group rewrite tasks.
  */
object CompactionPlan {

  /** Adds `group_id` per (dir, file): cumulative-start div target over
    * files ordered by `nameCol` within `dirCol`. Integer-exact. */
  def assignGroups(files: DataFrame, dirCol: String, nameCol: String,
                   sizeCol: String, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val w = Window.partitionBy(col(dirCol)).orderBy(col(nameCol))
    files
      .withColumn("__cum", sum(col(sizeCol).cast("long")).over(w))
      .withColumn("group_id",
        expr(s"(__cum - cast(`$sizeCol` as bigint)) div $targetBytes"))
      .drop("__cum")
  }

  /** The rewrite manifest: one row per (dir, group) with file count
    * and total bytes — what the compaction executor fans out over. */
  def groupManifest(files: DataFrame, dirCol: String, nameCol: String,
                    sizeCol: String, targetBytes: Long): DataFrame =
    assignGroups(files, dirCol, nameCol, sizeCol, targetBytes)
      .groupBy(col(dirCol), col("group_id"))
      .agg(count(lit(1)).as("n_files"),
        sum(col(sizeCol).cast("long")).as("bytes"))
}
