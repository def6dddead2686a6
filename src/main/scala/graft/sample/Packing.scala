package graft.sample

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data export: assign documents to
  * fixed token-budget packs, greedily in a deterministic order, so
  * a trainer can stream pack by pack. `pack_id` is the running-total
  * prefix divided by the budget — a document lands in the pack its
  * first token falls into (packs can overflow by at most one
  * document; no document is split).
  *
  * Scale design: one window cumulative sum per group — shuffle keyed
  * on the group column, single sort within each group. A window per
  * (group) is the right grain when groups are bounded (languages,
  * sources); for an unbounded or skewed group, pre-split it with a
  * deterministic shard column (e.g. `pmod(hash64(id), shards)`) and
  * pack per (group, shard) — packs never cross shards, which is
  * exactly what a sharded training run wants anyway.
  */
object Packing {

  /** (id, group, tokens, pack_id): cumulative-sum packing of
    * `tokensCol` into `budget`-sized packs per `groupCol`, ordered by
    * `idCol` within the group. */
  def packByBudget(df: DataFrame, idCol: String, groupCol: String,
                   tokensCol: String, budget: Long): DataFrame = {
    val w = Window.partitionBy(col("grp")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // integer floor-division via double is exact for cums < 2^53 —
    // and mirrors identically in the oracle engine
    df.select(col(idCol).as("id"), col(groupCol).as("grp"),
        col(tokensCol).cast("long").as("tokens"))
      .withColumn("pack_id",
        floor((sum(col("tokens")).over(w) - col("tokens")).cast("double")
          / budget).cast("long"))
  }
}
