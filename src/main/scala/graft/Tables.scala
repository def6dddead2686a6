package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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
    // events.ts is TIMESTAMP(NANOS) parquet, which Spark 4 rejects by
    // default; with this legacy flag it reads as LongType epoch-nanos —
    // exact (no µs truncation), and totally ordered like DuckDB's ns.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Register every table as a temp view so `spark.sql` works too. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => apply(spark, sfDir, n).createOrReplaceTempView(n))
}
