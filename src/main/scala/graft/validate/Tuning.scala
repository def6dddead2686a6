package graft.validate

/** Shuffle/partition sizing advisor — the arithmetic this repo's
  * operators apply implicitly (`spark.sql.shuffle.partitions` sized
  * to cores at test SF, salting when a key dominates, broadcast under
  * the AQE threshold), exposed as an explicit control-plane
  * calculator so a 100 TB deployment can derive its conf from
  * measured table stats (`keySkewReport`, `cmsJoinSizeEstimate`,
  * file listings) instead of folklore.
  *
  * Pure driver-side arithmetic — no Spark session, no I/O; the
  * inputs come from the stats operators, the outputs go into a
  * session builder or a job conf.
  */
object Tuning {

  /** @param shufflePartitions  partitions for wide stages over this
    *                           input (≥ cores, sized to
    *                           targetPartitionBytes)
    * @param maxPartitionBytes  scan split size to feed cores evenly
    * @param saltsForTopKey     1 = no salting needed; >1 = spread the
    *                           dominant key over this many salts
    * @param broadcastSmallSide whether the small side fits the
    *                           broadcast threshold */
  case class ShuffleAdvice(shufflePartitions: Int,
                           maxPartitionBytes: Long,
                           saltsForTopKey: Int,
                           broadcastSmallSide: Boolean)

  val DefaultTargetPartitionBytes: Long = 128L << 20
  val DefaultBroadcastBytes: Long = 64L << 20
  /** Above this, more partitions stop helping and scheduler overhead
    * dominates — cap and let AQE coalesce. */
  val MaxPartitions: Int = 50000

  /** Size a shuffle over `inputBytes`/`rows` on `cores` cores.
    *
    * - partitions: enough that a partition holds ~`targetPartitionBytes`,
    *   never fewer than `cores` (idle executors) and never more than
    *   [[MaxPartitions]] (scheduler overhead; AQE coalesces the rest).
    * - salting: if the most frequent key's rows exceed 2× the average
    *   partition's rows, spread it over ceil(topKeyRows/avg) salts
    *   (capped at partitions) — below 2× the imbalance is within
    *   normal hash variance and salting just costs an extra stage.
    * - broadcast: measured small side under the threshold.
    */
  def shuffleAdvice(inputBytes: Long, rows: Long, topKeyRows: Long,
                    cores: Int,
                    targetPartitionBytes: Long = DefaultTargetPartitionBytes,
                    broadcastBytes: Long = DefaultBroadcastBytes,
                    smallSideBytes: Long = Long.MaxValue): ShuffleAdvice = {
    require(inputBytes >= 0 && rows >= 0 && topKeyRows >= 0 &&
      topKeyRows <= math.max(rows, 1) && cores >= 1 &&
      targetPartitionBytes >= 1)
    val byBytes = ceilDiv(inputBytes, targetPartitionBytes)
    val partitions = math.min(MaxPartitions,
      math.max(cores.toLong, byBytes)).toInt
    val avgRows = math.max(rows / partitions, 1L)
    val salts =
      if (topKeyRows > 2L * avgRows)
        math.min(partitions.toLong, ceilDiv(topKeyRows, avgRows)).toInt
      else 1
    ShuffleAdvice(partitions, targetPartitionBytes, salts,
      smallSideBytes <= broadcastBytes)
  }

  private def ceilDiv(a: Long, b: Long): Long =
    if (a == 0) 0 else (a - 1) / b + 1
}
