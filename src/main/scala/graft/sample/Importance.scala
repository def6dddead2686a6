package graft.sample

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style importance weighting for data selection (Xie et al.,
  * "Data Selection for Language Models via Importance Resampling",
  * 2023): score each document by how much its token distribution
  * resembles a target domain relative to the raw corpus, then keep /
  * resample the high-weight tail.
  *
  * DSIR's weight is Σ_tokens log p_target(w) − log p_raw(w). Floats
  * never hash-match across engines, so the log is the floor-log2
  * analogue `bitlen(n) = length(bin(n))`, giving the integer weight
  *
  *   weight_bits(d) = Σ_{w ∈ d} [bitlen(t_w + 1) − bitlen(r_w + 1)]
  *                    + n_tokens · [bitlen(R + 1) − bitlen(T + 1)]
  *
  * with t_w / r_w the target / raw corpus counts of token w and T / R
  * their totals (add-one smoothing; the totals term normalizes the
  * two distributions' different masses). Positive ⇒ target-like at
  * log2 grain.
  *
  * Scale shape: one token pass builds per-term (raw, target) counts in
  * a single groupBy — the "index". Per-document scoring is an
  * equi-join of the token stream with the term stats (shuffle keyed by
  * term, AQE-skew-safe: stopword-like hot terms are handled by AQE
  * splitting) followed by one groupBy(doc). Corpus totals ride along
  * as a broadcast 1-row frame. No driver state, no vocabulary cap.
  */
object Importance {

  /** Per-document integer importance weights toward the target domain.
    *
    * @param targetFlag boolean Column marking target-domain documents
    * @return (id, n_tokens, weight_bits) — one row per document that
    *         has at least one token
    */
  def bitWeights(docs: DataFrame, idCol: String, textCol: String,
                 targetFlag: Column): DataFrame = {
    val tokens = docs
      .select(col(idCol).as("id"),
        targetFlag.cast("long").as("is_target"),
        explode(TextFunctions.words(col(textCol))).as("term"))
    val termStats = tokens.groupBy(col("term"))
      .agg(count(lit(1)).as("r_cnt"),
        sum(col("is_target")).as("t_cnt"))
    val totals = termStats.agg(sum(col("r_cnt")).as("r_total"),
      sum(col("t_cnt")).as("t_total"))
    tokens
      .join(termStats, Seq("term"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(length(bin(col("t_cnt") + 1)) -
          length(bin(col("r_cnt") + 1))).as("term_bits"))
      .crossJoin(broadcast(totals))
      .select(col("id"), col("n_tokens"),
        (col("term_bits") + col("n_tokens") *
          (length(bin(col("r_total") + 1)) -
            length(bin(col("t_total") + 1)))).cast("long")
          .as("weight_bits"))
  }
}
