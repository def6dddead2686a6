package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Epoch/timestamp conversions the reference does host-side (SURVEY
  * §2.10), as Column expressions. */
object TimeFunctions {

  /** Seconds between 0001-01-01T00:00:00Z and the unix epoch — the
    * .NET ticks epoch offset the reference hardcodes
    * (`PSS WHI (XML)/Tables.scala:322-323`). */
  val DotNetEpochOffsetSeconds = 62135596800L

  /** .NET ticks (100 ns units since 0001-01-01) → timestamp, truncated
    * to µs. Division goes through DECIMAL: a double round-trip would
    * lose exactness above 2^53 (ticks for current dates are ~6.4e17). */
  def dotNetTicksToTimestamp(ticks: Column): Column = {
    val micros = floor(ticks.cast(DecimalType(30, 6)) / 10).cast("long")
    timestamp_micros(micros - lit(DotNetEpochOffsetSeconds * 1000000L))
  }

  /** Timestamp → .NET ticks (µs precision, so a multiple of 10). */
  def timestampToDotNetTicks(ts: Column): Column =
    (unix_micros(ts) + lit(DotNetEpochOffsetSeconds * 1000000L)) * 10
}
