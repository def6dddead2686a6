package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Test-table access for the TPC-H-ish synthetic corpus (TESTDATA.md).
  *
  * Mirrors the reference's catalog-table scans (SURVEY §2.1 S3/S4:
  * `bp-unstructured-netapp-ingestion/ModuleFunctions.py:497-504`,
  * `bp-bentley-idms/Validation/validate_source_and_target_tags.scala:20`)
  * as plain parquet path scans. Column pruning + predicate pushdown are
  * Catalyst's job — callers `.select`/`.filter` and the parquet reader
  * gets `PushedFilters`/`ReadSchema` for free.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // If events.ts is TIMESTAMP(NANOS) parquet (older fixture gens),
    // Spark 4 rejects it by default; with this legacy flag it reads as
    // LongType epoch-nanos. Harmless for µs-typed fixtures (the flag
    // only applies to nanos-typed columns).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") normalizeEventTs(df) else df
  }

  /** THE ts-grain contract: `events.ts` is BIGINT epoch-nanoseconds,
    * whatever the fixture's physical parquet type. Fixture generations
    * have flip-flopped between TIMESTAMP(NANOS) (read as LongType ns
    * under `nanosAsLong`) and timestamp[us] (read as TIMESTAMP_NTZ, on
    * which the legacy flag is a no-op) — this one normalization point
    * absorbs the drift so every downstream `ts div 1000` keeps working.
    * The NTZ→timestamp cast is lossless because every graft session
    * pins `spark.sql.session.timeZone=UTC`. */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(TimestampNTZType) | Some(TimestampType) =>
        df.withColumn("ts",
          unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case Some(LongType) | None => df
      case Some(other) => throw new IllegalStateException(
        s"events.ts arrived as unexpected type $other — fixture drift; " +
          "extend Tables.normalizeEventTs for it")
    }

  /** `events.ts` at its native ns grain (see [[normalizeEventTs]]). */
  def eventTsNs: Column = col("ts")

  /** `events.ts` truncated to µs — the cross-engine comparison grain
    * (DuckDB's parquet read is µs); integer `div` so both engines
    * subtract identical integers. */
  def eventTsUs: Column = expr("ts div 1000")

  /** Register every table as a temp view so `spark.sql` works too. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => apply(spark, sfDir, n).createOrReplaceTempView(n))
}
