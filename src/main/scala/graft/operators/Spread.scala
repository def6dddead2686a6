package graft.operators

import org.apache.spark.sql.DataFrame

/** Defensive parallelism for per-row-expensive operators (hashing,
  * shingling, vector math).
  *
  * A small parquet input arrives as ONE scan partition, so an operator
  * whose cost is per-row expression work (not I/O) runs on a single
  * core no matter how many executors exist. `ensure` repartitions up to
  * the session's shuffle parallelism — a cheap shuffle of the narrow
  * input rows — only when the plan's partitioning is actually below it;
  * at scale the scan already has more partitions than cores and this is
  * a no-op.
  *
  * LIMIT: the decision reads LOGICAL size stats, so a frame that is
  * logically large but physically single-partition — an unsplittable
  * gzip file, an upstream `coalesce(1)`, an inflated non-CBO join
  * estimate — skips the repartition and keeps its one partition
  * (perf-only; never a correctness issue). Callers feeding a
  * potentially-unsplittable source should `repartition` explicitly;
  * the alternative (reading the physical partition count) plans the
  * whole subtree a second time, which is exactly what this helper
  * exists to avoid.
  */
object Spread {

  def ensure(df: DataFrame): DataFrame = {
    // decide from LOGICAL size stats (file-size sums, in-memory row
    // estimates — no physical planning): the previous
    // df.rdd.getNumPartitions planned the whole subtree a second time
    // just to read a partition count, re-listing files on big tables.
    // est ≥ target·maxPartitionBytes means the scan will already open
    // with ≥ target partitions, so repartitioning would only add a
    // shuffle; below it the input is small and the shuffle is cheap.
    val conf = df.sparkSession.sessionState.conf
    val target = conf.numShufflePartitions
    val est = df.queryExecution.analyzed.stats.sizeInBytes
    if (est >= BigInt(conf.filesMaxPartitionBytes) * target) df
    else df.repartition(target)
  }

  /** Total order for a KNOWN-SMALL result (e.g. a filtered pair list).
    * A global `orderBy` range-partitions, and its boundary-sampling job
    * recomputes the whole upstream pipeline a second time — for an
    * expensive pipeline with a tiny output that doubles the query.
    * Shuffling everything to one partition and sorting there costs one
    * tiny shuffle instead. Only for results that fit on one task. */
  def smallSort(df: DataFrame, cols: org.apache.spark.sql.Column*): DataFrame =
    df.repartition(1).sortWithinPartitions(cols: _*)

  /** A helper-column name guaranteed absent from `df`. Operators that
    * add-then-drop working columns (`__salt`, `__rn`, …) would silently
    * clobber a user column of the same name; appending underscores
    * until the name is free makes the collision impossible while
    * keeping plans readable in the common case. */
  def freshCol(df: DataFrame, base: String): String = {
    var n = base
    while (df.columns.contains(n)) n += "_"
    n
  }
}
