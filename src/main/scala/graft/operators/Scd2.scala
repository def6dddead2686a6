package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type 2 merge: maintain full attribute
  * history with (valid_from, valid_to, is_current) versioning columns.
  * The reference's upserts are Type 1 (overwrite-in-place, see
  * `Merge.upsertOuter`; ref `bp-scala-api-ingestions/dataSource
  * bp/ModuleFunctions.scala` MERGE path); Type 2 is the standard
  * warehouse extension a dimension-history consumer needs.
  *
  * Semantics per business key:
  *   - key only in existing-current          → row kept as-is
  *   - key only in incoming                  → new current version
  *   - matched, tracked columns equal        → row kept as-is
  *   - matched, any tracked column changed   → current row closed
  *     (valid_to = effective, is_current = false) AND a new open
  *     version inserted (valid_from = effective)
  * Non-current (already closed) history rows pass through untouched.
  *
  * Distributed shape: ONE full-outer shuffle join of current × incoming
  * on the key, then a per-row explode of a 1-or-2 element struct array
  * builds closed+new versions without re-joining — no second pass over
  * `existing`, no driver involvement. At 100 TB the join is the only
  * shuffle and AQE/broadcast applies when incoming is a small delta.
  * Closed history never enters the join at all (filter + union).
  *
  * NULL business keys follow SQL join semantics (never match); a
  * NULL-keyed incoming row therefore always inserts.
  */
object Scd2 {

  /** PRECONDITION: `incoming` holds AT MOST ONE row per business key
    * (and `existing` at most one current row per key — the invariant
    * this merge itself maintains). A duplicated incoming key fans out
    * the full-outer join, emitting multiple closed/current versions
    * for that key and breaking idempotency. The contract is NOT
    * enforced here (it would cost an extra action per merge); callers
    * with untrusted deltas should pre-collapse with
    * `Windows.keepLatest` or fail fast via [[assertUniqueKeys]].
    *
    * @param existing  history table: key ++ tracked ++ valid_from,
    *                   valid_to, is_current
    * @param incoming  delta: key ++ tracked columns only
    * @param keys      business-key column names
    * @param tracked   change-detected attribute columns
    * @param effective version boundary written into valid_to of closed
    *                  rows and valid_from of new ones (ISO date string;
    *                  kept as string — see Verify gotchas on timestamp
    *                  output columns) */
  def merge(existing: DataFrame, incoming: DataFrame, keys: Seq[String],
            tracked: Seq[String], effective: String): DataFrame = {
    val payload = keys ++ tracked
    val cur = existing.where(col("is_current"))
      .select(payload.map(col) :+ col("valid_from"): _*)
      .withColumn("c_present", lit(true))
    val hist = existing.where(!col("is_current"))
    val inc = incoming.select(payload.map(col): _*)
      .withColumnsRenamed(payload.map(c0 => c0 -> s"i_$c0").toMap)
      .withColumn("i_present", lit(true))

    val joined = cur.join(inc,
      keys.map(k => col(k) === col(s"i_$k")).reduce(_ && _), "full_outer")
    val changed = tracked.map(c0 => !(col(c0) <=> col(s"i_$c0")))
      .reduce(_ || _)

    def version(fromIncoming: Boolean, validFrom: Column,
                validTo: Column, current: Boolean): Column =
      struct(payload.map(c0 =>
        (if (fromIncoming) col(s"i_$c0") else col(c0)).as(c0)) ++ Seq(
        validFrom.as("valid_from"), validTo.as("valid_to"),
        lit(current).as("is_current")): _*)

    val keep = version(fromIncoming = false, col("valid_from"),
      lit(null).cast("string"), current = true)
    val rows = when(col("i_present").isNull, array(keep))
      .when(col("c_present").isNull, array(version(fromIncoming = true,
        lit(effective), lit(null).cast("string"), current = true)))
      .when(!changed, array(keep))
      .otherwise(array(
        version(fromIncoming = false, col("valid_from"), lit(effective),
          current = false),
        version(fromIncoming = true, lit(effective),
          lit(null).cast("string"), current = true)))

    val outCols = payload ++ Seq("valid_from", "valid_to", "is_current")
    // explode_outer: the array is never empty (the when covers all
    // cases), and the outer form skips InferFiltersFromGenerate's
    // inferred filter that would inline the whole when-expression twice
    val merged = joined.select(explode_outer(rows).as("r"))
      .select(outCols.map(c0 => col(s"r.$c0").as(c0)): _*)
    hist.select(outCols.map(col): _*).unionByName(merged)
  }

  /** Fail-fast guard for [[merge]]'s unique-key precondition: throws
    * with the duplicate count if any business key occurs more than
    * once. One distributed aggregation, driver sees a single row —
    * call it on untrusted deltas before merging. */
  def assertUniqueKeys(df: DataFrame, keys: Seq[String]): Unit = {
    val dups = df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n")).where(col("n") > 1).count()
    require(dups == 0,
      s"Scd2.merge precondition violated: $dups business key(s) " +
        s"(${keys.mkString(",")}) occur more than once in the input")
  }
}
