package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * A shuffle join sends every row of a key to ONE reducer; a hot key
  * (the null-ish placeholder domain, the one giant customer, the
  * empty-string language tag) turns that reducer into the stage's
  * straggler no matter how many executors exist. Salting splits each
  * hot key's rows across `salts` reducers: the big side gets a
  * deterministic per-row salt in [0, salts), the small side is
  * replicated once per salt value, and the join runs on
  * (key, salt) — same result, `salts`-way parallel hot keys.
  *
  * When to reach for this instead of the built-ins:
  *  - `broadcast(small)` is better when the small side fits in memory
  *    — salting costs a `salts`× replication of the small side.
  *  - AQE's skew-join (`spark.sql.adaptive.skewJoin.enabled`) splits
  *    oversized SORT-MERGE partitions at runtime and should be left
  *    on; but it only kicks in post-shuffle per-partition, cannot help
  *    shuffle-hash joins, and re-plans reactively. Salting is the
  *    static guarantee for a join you KNOW is skewed (and the form
  *    that ports to any engine).
  *
  * Result-preserving for `inner` and `left_outer` (big side
  * preserved): each big row carries exactly one salt and meets every
  * key-match exactly once (the small side holds that key once per
  * salt). Right/full outer would duplicate unmatched small rows
  * across salts and are rejected.
  */
object SkewJoin {

  /** Join `big` ⋈ `small` on `keys` with `salts`-way key splitting.
    * The salt is a deterministic hash of the big row's key columns
    * plus `idCol` (any column unique-ish per row — doc id, line
    * number), so reruns and retries land rows on the same reducer. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 idCol: String, salts: Int,
                 joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(Seq("inner", "left_outer", "left").contains(joinType),
      s"salting preserves only inner/left_outer semantics, got $joinType")
    val saltExpr = pmod(
      xxhash64((keys :+ idCol).map(col): _*), lit(salts))
    // collision-safe working name: an input already carrying "__salt"
    // must not be clobbered (Spread.freshCol)
    val sc = Spread.freshCol(big, Spread.freshCol(small, "__salt"))
    val b = big.withColumn(sc, saltExpr)
    val s = small.withColumn(sc,
      explode(sequence(lit(0), lit(salts - 1)).cast("array<long>")))
    b.join(s, keys :+ sc, joinType).drop(sc)
  }

  /** MEASURE the skew, then pick the salt count: the hottest key's row
    * count over `targetRowsPerTask` is how many reducers that key needs
    * so none becomes a straggler. One cheap two-level agg over the key
    * columns (partial max map-side — the shuffle carries one row per
    * key per partition); at 100 TB run it on a `sample()` instead.
    * Returns 1 for unskewed inputs (hot ≤ target → salting would only
    * add small-side replication), capped at 1024 so a pathological
    * count can't explode the small side. */
  def suggestSalts(big: DataFrame, keys: Seq[String],
                   targetRowsPerTask: Long): Int = {
    require(targetRowsPerTask > 0, "targetRowsPerTask must be positive")
    val hot = Option(
      big.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
        .agg(max(col("n"))).head().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    val need = (hot + targetRowsPerTask - 1) / targetRowsPerTask
    math.max(1, math.min(1024, need).toInt)
  }
}
