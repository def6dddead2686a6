package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pure-Spark upsert + incremental-load primitives (SURVEY §2.2 K4/K5,
  * §2.12).
  *
  * The reference's portable upsert is a full outer join on the key
  * followed by per-column COALESCE(new, old)
  * (`bp-unstructured-netapp-ingestion/Step 1 - NetApp Listing.py:202-249`);
  * its Delta `MERGE whenMatched.updateAll.whenNotMatched.insertAll`
  * (`dataSource bp/ModuleFunctions.scala:381-408`) has the same
  * row-level outcome when incoming rows are fully populated. We ship
  * the join+COALESCE form as the engine default — it runs on plain
  * parquet and scales as one sort-merge (or broadcast) join.
  *
  * Scale note: incoming is usually small relative to existing — pass
  * `broadcastIncoming = true` to pin a broadcast hash join and skip
  * shuffling the big side.
  */
object Merge {

  /** MERGE semantics: incoming wins where matched, existing rows
    * without a match survive, incoming-only rows insert.
    *
    * `refreshCols`: columns where incoming's value must win even when
    * NULL (the reference's null-refresh trick, `Step 1:184-186` — it
    * nulls the old side out so COALESCE picks the new value). */
  def upsert(existing: DataFrame, incoming: DataFrame, keys: Seq[String],
             refreshCols: Set[String] = Set.empty,
             broadcastIncoming: Boolean = false): DataFrame =
    if (broadcastIncoming) upsertBroadcast(existing, incoming, keys, refreshCols)
    else upsertOuter(existing, incoming, keys, refreshCols)

  /** General form: one full outer join (sort-merge at scale). */
  private def upsertOuter(existing: DataFrame, incoming: DataFrame, keys: Seq[String],
                          refreshCols: Set[String]): DataFrame = {
    // presence marker instead of key-null checks — correct even when a
    // key column itself is NULL (joined via null-safe <=>)
    val nw = incoming.withColumn("__nw_present", lit(1)).alias("nw")
    val ex = existing.alias("ex")
    val cond = keys.map(k => col(s"ex.`$k`") <=> col(s"nw.`$k`")).reduce(_ && _)
    val joined = ex.join(nw, cond, "full_outer")
    val matched = col("nw.__nw_present").isNotNull
    joined.select(mergedCols(existing.columns.toSeq, keys, refreshCols, matched): _*)
  }

  /** Small-incoming form: Spark cannot broadcast a FULL OUTER join, so
    * we decompose it — (1) existing LEFT JOIN broadcast(incoming) for
    * the update side (zero shuffle of the big table), (2) matched keys
    * via a broadcast semi join, (3) incoming ANTI broadcast(matchedKeys)
    * for the inserts. The 100-TB table is scanned, never shuffled. */
  private def upsertBroadcast(existing: DataFrame, incoming: DataFrame, keys: Seq[String],
                              refreshCols: Set[String]): DataFrame = {
    val nw = broadcast(incoming.withColumn("__nw_present", lit(1))).alias("nw")
    val ex = existing.alias("ex")
    val cond = keys.map(k => col(s"ex.`$k`") <=> col(s"nw.`$k`")).reduce(_ && _)
    val matched = col("nw.__nw_present").isNotNull
    val updated = ex.join(nw, cond, "left_outer")
      .select(mergedCols(existing.columns.toSeq, keys, refreshCols, matched): _*)
    // null-safe (<=>) like the update side above: a name-based equi-join
    // here would treat NULL keys as unmatched and emit a NULL-keyed row
    // as both an update and an insert
    val matchedKeys = broadcast(
      existing.alias("ek").select(keys.map(k => col(s"ek.`$k`")): _*)
        .join(broadcast(incoming.alias("ik")),
          keys.map(k => col(s"ek.`$k`") <=> col(s"ik.`$k`")).reduce(_ && _),
          "left_semi")
        .distinct()).alias("mk")
    val inserts = incoming.alias("in")
      .join(matchedKeys,
        keys.map(k => col(s"in.`$k`") <=> col(s"mk.`$k`")).reduce(_ && _),
        "left_anti")
      .select(existing.columns.toSeq.map(c => col(s"`$c`")): _*)
    updated.unionByName(inserts)
  }

  private def mergedCols(outCols: Seq[String], keys: Seq[String],
                         refreshCols: Set[String], matched: Column): Seq[Column] =
    outCols.map { c =>
      if (keys.contains(c))
        coalesce(col(s"nw.`$c`"), col(s"ex.`$c`")).as(c)
      else if (refreshCols.contains(c))
        when(matched, col(s"nw.`$c`")).otherwise(col(s"ex.`$c`")).as(c)
      else
        coalesce(col(s"nw.`$c`"), col(s"ex.`$c`")).as(c)
    }

  /** Partition-scoped INC upsert onto a partitioned parquet path: only
    * the partitions containing incoming keys are read, merged, and
    * rewritten via dynamic partition overwrite — a 1-row delta
    * rewrites one partition, not the whole table. (The full-table
    * stage+swap in `Pipelines.writeByLoadType` is the honest portable
    * fallback for UNPARTITIONED targets; at 100 TB use this.)
    *
    * `target` must be written `partitionBy(partCol)`; incoming rows
    * may introduce new partition values. The distinct partition-value
    * collect is control-plane-sized (bounded by partitions touched
    * per increment) and drives partition pruning on the target scan. */
  def upsertPartitionScoped(spark: org.apache.spark.sql.SparkSession,
                            targetPath: String, incoming: DataFrame,
                            keys: Seq[String], partCol: String): Unit = {
    val tgt = new org.apache.hadoop.fs.Path(targetPath)
    val fs = tgt.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val merged =
      if (!fs.exists(tgt)) incoming
      else {
        val touched = incoming.select(col(partCol)).distinct()
          .collect().map(_.get(0)).toSeq
        val existing = spark.read.parquet(targetPath)
          .where(col(partCol).isin(touched: _*)) // partition pruning
        upsert(existing, incoming, keys)
      }
    val mode = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(mode)
    spark.conf.set(mode, "dynamic")
    try merged.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy(partCol).parquet(targetPath)
    finally prev match {
      case Some(v) => spark.conf.set(mode, v)
      case None => spark.conf.unset(mode)
    }
  }

  /** High-watermark incremental filter (SURVEY §2.12): rows of `source`
    * strictly newer than the max watermark already in `target`.
    * Empty target ⇒ everything passes. The scalar max is computed by
    * Spark as a separate tiny job — no driver-side collect of data. */
  def newerThanWatermark(source: DataFrame, target: DataFrame, tsCol: String): DataFrame = {
    val wm = target.agg(max(col(tsCol)).as("wm"))
    source.join(broadcast(wm), source(tsCol) > wm("wm") || wm("wm").isNull, "inner")
      .drop("wm")
  }

  /** The reference's staging + promote (`Well Logs .../Tables.scala:293-311`):
    * target rows not superseded by staging, unioned with staging. */
  def promoteStaging(target: DataFrame, staging: DataFrame, keys: Seq[String]): DataFrame = {
    val stKeys = staging.select(keys.map(col): _*).distinct()
    target.join(stKeys, keys, "left_anti").unionByName(staging)
  }
}
