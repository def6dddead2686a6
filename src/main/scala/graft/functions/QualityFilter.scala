package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.operators.Spread

/** Composite document-quality filter in the Gopher/C4 rule family:
  * ordered heuristic rules over cheap text statistics, emitting every
  * metric plus a keep flag and the FIRST failing rule's name (the
  * shape a filtering pipeline logs for auditability).
  *
  * All rules are pure codegen'd Column expressions over one
  * materialized token array — a single projection pass, no UDFs, no
  * shuffles; at 100 TB this is a map-only stage that rides whatever
  * partitioning the scan already has.
  */
object QualityFilter {

  /** Rule thresholds; defaults tuned loose (drop only degenerate
    * docs). Rules apply in declaration order for fail_reason. */
  final case class Rules(minWords: Int = 10, minMeanWordLen: Double = 2.0,
                         maxMeanWordLen: Double = 10.0,
                         maxPunctRatio: Double = 0.2,
                         minStopwordRatio: Double = 0.01)

  /** (id, token_count, mean_word_len, punct_ratio, stopword_ratio,
    * keep, fail_reason) — fail_reason null iff keep. */
  def qualityFilter(df: DataFrame, idCol: String, textCol: String,
                    rules: Rules = Rules()): DataFrame = {
    val base = Spread.ensure(df.select(col(idCol).as("id"),
        col(textCol).as("txt")))
      .select(col("id"), col("txt"), words(col("txt")).as("w"))
    val toks = size(col("w"))
    // mean word length without a HOF: total letter count is the length
    // of the concatenated tokens (codegen'd), so no interpreted lambda
    val meanWl = when(toks === 0, lit(0.0))
      .otherwise(length(array_join(col("w"), "")).cast("double") / toks)
    val praw = punctRatio(col("txt"))
    val sraw = stopwordRatioFromWords(col("w"))
    def firstFail(cases: Seq[(Column, String)]): Column =
      cases.foldRight(lit(null).cast("string")) { case ((cond, name), rest) =>
        when(cond, lit(name)).otherwise(rest)
      }
    val reason = firstFail(Seq(
      (toks < rules.minWords) -> "too_short",
      (meanWl < rules.minMeanWordLen || meanWl > rules.maxMeanWordLen)
        -> "word_len",
      (praw > rules.maxPunctRatio) -> "punct",
      (sraw < rules.minStopwordRatio) -> "stopword"))
    base.select(col("id"), toks.as("token_count"),
      round(meanWl, 6).as("mean_word_len"),
      round(praw, 6).as("punct_ratio"),
      round(sraw, 6).as("stopword_ratio"),
      reason.isNull.as("keep"), reason.as("fail_reason"))
  }
}
