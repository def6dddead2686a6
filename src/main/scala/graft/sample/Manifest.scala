package graft.sample

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Curation mix manifest — the per-(source, language) accounting a
  * corpus-curation run emits before training: how many documents and
  * tokens each slice contributes, how much exact duplication and
  * quality failure it carries, and what survives both gates. The
  * manifest is the composition point of the dedup
  * ([[graft.dedup.Dedup.exactGroups]]) and quality
  * ([[graft.functions.QualityFilter]]) stages — one table a reviewer
  * signs off on, and the natural input to the budget allocators
  * ([[Budget]]) downstream.
  */
object Manifest {

  /** Per-`groupCols` manifest:
    *
    *  - `n_docs`, `n_tokens` — slice size (word tokens, the same
    *    tokenization the quality rules use);
    *  - `n_dup_docs` — exact normalized-text duplicates (non-keeper
    *    side; min-id keeper per hash, corpus-WIDE, so a duplicate is
    *    charged to its own slice even when the keeper lives in
    *    another source);
    *  - `n_quality_fail` — documents failing the Gopher-style rules;
    *  - `n_kept_docs` / `kept_tokens` — keeper AND quality-pass;
    *  - `kept_ppm` / `dup_ppm` — exact integer ppm of `n_docs`
    *    (floor division, engine-exact).
    *
    * Scale shape: one quality pass over text, one md5 groupBy for the
    * dup groups, two id-keyed equi-joins, one final aggregation —
    * every stage map-side combined or key-partitioned; nothing
    * driver-side, no all-pairs anywhere. */
  def curationManifest(df: DataFrame, groupCols: Seq[String],
                       idCol: String, textCol: String,
                       rules: graft.functions.QualityFilter.Rules =
                         graft.functions.QualityFilter.Rules()): DataFrame = {
    val q = graft.functions.QualityFilter
      .qualityFilter(df, idCol, textCol, rules)
      .select(col("id"), col("token_count").cast("long").as("tk"),
        col("keep"))
    val keepers = graft.dedup.Dedup
      .exactGroups(df, idCol, textCol, normalized = true)
      .select(col("keep_id").as("id"), lit(true).as("is_keeper"))
    val perDoc = df
      .select(groupCols.map(col) :+ col(idCol).as("id"): _*)
      .join(q, Seq("id"))
      .join(keepers, Seq("id"), "left")
      .select(groupCols.map(col) :+ col("tk") :+ col("keep") :+
        coalesce(col("is_keeper"), lit(false)).as("is_keeper"): _*)
    perDoc.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("tk")).as("n_tokens"),
        sum(when(!col("is_keeper"), lit(1L)).otherwise(lit(0L)))
          .as("n_dup_docs"),
        sum(when(!col("keep"), lit(1L)).otherwise(lit(0L)))
          .as("n_quality_fail"),
        sum(when(col("is_keeper") && col("keep"), lit(1L)).otherwise(lit(0L)))
          .as("n_kept_docs"),
        sum(when(col("is_keeper") && col("keep"), col("tk")).otherwise(lit(0L)))
          .as("kept_tokens"))
      .withColumn("kept_ppm", expr("(1000000 * n_kept_docs) div n_docs"))
      .withColumn("dup_ppm", expr("(1000000 * n_dup_docs) div n_docs"))
  }
}
