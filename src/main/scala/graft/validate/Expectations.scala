package graft.validate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit for ingestion pipelines — the
  * systematic form of the reference's scattered ad-hoc validation
  * (row-count sanity checks before promote, reconciliation counts;
  * ref `bp-unstructured-netapp-ingestion/Step 1 - NetApp Listing.py`
  * row-count prints, `bp-scala-api-ingestions/dataSource
  * bp/ModuleFunctions.scala` post-load count checks), in the style of
  * constraint-suite libraries (Deequ): a suite of named constraints is
  * evaluated in ONE distributed pass and the verdicts land in a small
  * frame a pipeline can gate a promote step on.
  *
  * Scale shape: `audit` folds every constraint into a single
  * `agg` over one scan — each constraint is a `sum(when(violated))`
  * counter, so the pass is map-side partial aggregation into a 1-row
  * result regardless of corpus size; the per-constraint explode touches
  * only that single row. No shuffle of data rows at all.
  * `uniqueness` is the one check that inherently needs a shuffle
  * (groupBy on the key), kept separate so suites that don't need it
  * stay shuffle-free. `profile`'s multi-column distinct counts plan as
  * one scan through an Expand (rows × (cols+1)) — linear, no joins.
  */
object Expectations {

  /** A named row-level predicate; `violated` must be true exactly for
    * rows that break the expectation (null semantics decided per
    * factory below, so audits never silently pass on null). */
  final case class Constraint(name: String, violated: Column)

  /** Violated by null. */
  def notNull(c: String): Constraint =
    Constraint(s"not_null($c)", col(c).isNull)

  /** Violated by null or out-of-bounds (inclusive bounds). */
  def inRange(c: String, lo: Double, hi: Double): Constraint =
    Constraint(s"in_range($c)",
      col(c).isNull || col(c) < lo || col(c) > hi)

  /** Violated by null or a value outside the allowed set. */
  def oneOf(c: String, allowed: Seq[String]): Constraint =
    Constraint(s"one_of($c)",
      !coalesce(col(c).isin(allowed: _*), lit(false)))

  /** Violated by null or a non-matching value (rlike is a partial
    * match; anchor the pattern for full-string checks). */
  def matches(c: String, pattern: String): Constraint =
    Constraint(s"matches($c)",
      !coalesce(col(c).rlike(pattern), lit(false)))

  /** Evaluate every constraint in one aggregation pass. Returns one
    * row per constraint: (check_name, n_rows, n_violations, passed),
    * ordered by check_name. Constraint names must be distinct. */
  def audit(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "need at least one constraint")
    require(constraints.map(_.name).distinct.size == constraints.size,
      "constraint names must be unique")
    val counters = count(lit(1)).as("n") +:
      constraints.zipWithIndex.map { case (c, i) =>
        sum(when(c.violated, 1L).otherwise(0L)).as(s"v_$i")
      }
    val one = df.groupBy().agg(counters.head, counters.tail: _*)
    val entries = constraints.zipWithIndex.map { case (c, i) =>
      struct(lit(c.name).as("check_name"), col("n").as("n_rows"),
        col(s"v_$i").as("n_violations"))
    }
    // explode of an N-element array of a SINGLE row — not a data-scale
    // generate (and _outer to stay off InferFiltersFromGenerate)
    one.select(explode_outer(array(entries: _*)).as("r"))
      .select(col("r.check_name").as("check_name"),
        col("r.n_rows").as("n_rows"),
        col("r.n_violations").as("n_violations"),
        (col("r.n_violations") === 0L).as("passed"))
      .orderBy(col("check_name"))
  }

  /** Key-uniqueness verdict: (n_rows, n_keys, n_dup_keys,
    * n_dup_rows) as a single row. One groupBy shuffle on the key —
    * map-side combined, so a mostly-unique 100-TB key set ships one
    * row per key per task, not the data. */
  def uniqueness(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
      .groupBy()
      .agg(sum(col("n")).cast("long").as("n_rows"),
        count(lit(1)).as("n_keys"),
        sum(when(col("n") > 1, 1L).otherwise(0L)).as("n_dup_keys"),
        sum(when(col("n") > 1, col("n")).otherwise(0L)).cast("long")
          .as("n_dup_rows"))

  /** Per-column null/distinct profile in one scan:
    * (column_name, n_rows, n_null, n_distinct), ordered by
    * column_name. The multi-column exact distincts plan through one
    * Expand — fine for audit-sized column lists; for very wide
    * profiles swap `countDistinct` for `approx_count_distinct`. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val counters = count(lit(1)).as("n") +: cols.zipWithIndex.flatMap {
      case (c, i) => Seq(count(col(c)).as(s"nn_$i"),
        countDistinct(col(c)).as(s"nd_$i"))
    }
    val one = df.groupBy().agg(counters.head, counters.tail: _*)
    val entries = cols.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("column_name"), col("n").as("n_rows"),
        (col("n") - col(s"nn_$i")).as("n_null"),
        col(s"nd_$i").as("n_distinct"))
    }
    one.select(explode_outer(array(entries: _*)).as("r"))
      .select(col("r.column_name").as("column_name"),
        col("r.n_rows").as("n_rows"), col("r.n_null").as("n_null"),
        col("r.n_distinct").as("n_distinct"))
      .orderBy(col("column_name"))
  }

  /** Fixed-width histogram of a numeric column over [lo, hi):
    * (bin, bin_lo, n), out-of-range values clamped into the edge
    * bins. One scan + one tiny groupBy on the bin id — the
    * distribution profile that catches drift a min/max check misses.
    * Pick `lo`/`hi`/`nBins` so the width is an exact double (e.g.
    * powers of ten) if the result must reproduce across engines. */
  def histogram(df: DataFrame, c: String, lo: Double, hi: Double,
                nBins: Int): DataFrame = {
    require(nBins > 0 && hi > lo, "need hi > lo and nBins > 0")
    val width = (hi - lo) / nBins
    val bin = least(greatest(floor((col(c) - lo) / width), lit(0L)),
      lit(nBins - 1L))
    df.where(col(c).isNotNull)
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"))
      .select(col("bin"), (col("bin") * width + lo).as("bin_lo"), col("n"))
      .orderBy(col("bin"))
  }
}
