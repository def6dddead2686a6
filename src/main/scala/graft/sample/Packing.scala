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

  /** Split each document into fixed-size training windows WITH overlap
    * (the context-window chunking every pretraining pipeline runs
    * before packing): word windows of `chunk` tokens advancing by
    * `chunk − overlap`, final partial window kept. Returns
    * (id, chunk_idx, start_pos, end_pos, n_tokens) with 1-based
    * inclusive word positions — the caller slices text/token arrays by
    * range, so no giant string column rides the shuffle.
    *
    * Purely per-row (one Expand via the sequence explode, no shuffle,
    * no state): a 100-TB corpus chunks in a single map pass. */
  def chunkByTokens(df: DataFrame, idCol: String, nTokensCol: String,
                    chunk: Int, overlap: Int): DataFrame = {
    require(chunk > 0 && overlap >= 0 && overlap < chunk,
      "need 0 <= overlap < chunk")
    val stride = chunk - overlap
    val len = col(nTokensCol).cast("long")
    // windows fully covering [1, len]: the last chunk starts at or
    // before len − chunk + 1; docs at or under one chunk yield exactly
    // one window. n = 1 + ceil((len − chunk)/stride) for len > chunk.
    val nChunks = when(len <= chunk, lit(1L))
      .otherwise(lit(1L) + ceil((len - chunk).cast("double") / stride)
        .cast("long"))
    df.select(col(idCol).as("id"), len.as("len"), nChunks.as("nc"))
      .where(col("len") > 0)
      .select(col("id"), col("len"),
        posexplode_outer(sequence(lit(0L), col("nc") - 1)))
      .select(col("id"), col("pos").cast("long").as("chunk_idx"),
        (col("col") * stride + 1).as("start_pos"),
        least(col("col") * stride + chunk, col("len")).as("end_pos"))
      .withColumn("n_tokens", col("end_pos") - col("start_pos") + 1)
  }
}
