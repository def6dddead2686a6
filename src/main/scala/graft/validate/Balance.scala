package graft.validate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-balance diagnostic: the Gini coefficient of per-domain
  * mass (token counts per source, per language, per shard) — 0 for a
  * perfectly even mixture, → 1 when one domain holds everything. The
  * one-number companion to the mixture planner (`sample/Budget`):
  * compute it before and after resampling to show the rebalance
  * worked.
  *
  * Exactness: the rank formulation G = (2·Σᵢ i·xᵢ − (n+1)·Σx) /
  * (n·Σx) over ascending-sorted xᵢ is pure integer arithmetic —
  * emitted in floor-divided ppm, engine-exact. Ties take a
  * deterministic (x, domain) rank order; any tie order yields the
  * same sum since equal x contribute symmetric terms.
  *
  * Scale shape: one groupBy to domain mass (|domains| rows), one
  * window rank over that TINY table, one aggregate. The corpus is
  * touched once.
  */
object Balance {

  /** One row: (n_domains, total, gini_ppm) for the mass distribution
    * of `weight` summed per `domain`. Zero-mass domains participate
    * (they pull the coefficient up, as they should). */
  def giniPpm(df: DataFrame, domain: Column, weight: Column): DataFrame = {
    val mass = df.select(domain.as("d"), weight.as("x"))
      .groupBy(col("d")).agg(sum(col("x")).as("x"))
    val ranked = mass.withColumn("i",
      row_number().over(Window.orderBy(col("x"), col("d"))).cast("long"))
    ranked.agg(count(lit(1)).as("n_domains"),
        sum(col("x")).as("total"),
        sum(col("x").cast("decimal(38,0)") * col("i")).as("six"))
      .select(col("n_domains"), col("total"),
        expr("case when total = 0 then 0L else " +
          "cast((1000000 * (2 * six - (n_domains + 1) * total)) " +
          "div (cast(n_domains as decimal(38,0)) * total) as bigint) end")
          .as("gini_ppm"))
  }
}
