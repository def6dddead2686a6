package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import TextFunctions.words

/** Within-document repetition signals — the quality filters that catch
  * boilerplate and degenerate (looping) text in training corpora.
  *
  * Two shapes on purpose:
  *   - line-level ratios are pure codegen `Column`s (split + distinct
  *     on a usually-short array);
  *   - word-level stats go through explode + two-level aggregation:
  *     the per-row HOF alternative (count each distinct word inside a
  *     lambda) is O(distinct·words) INTERPRETED per document — fine at
  *     54 words, hopeless at a 100k-word document — while the explode
  *     form is linear rows into a partial-aggregated shuffle keyed on
  *     (doc, word), i.e. the shape that scales.
  */
object Repetition {

  /** Fraction of non-empty lines that repeat an earlier line:
    * 1 − distinct/total; 0.0 for texts with no non-empty lines. */
  def dupLineRatio(text: Column): Column = {
    val lines = filter(transform(split(text, "\n"), l => trim(l)),
      l => length(l) > 0)
    when(size(lines) === 0, lit(0.0))
      .otherwise(round(lit(1.0) -
        size(array_distinct(lines)).cast("double") / size(lines), 6))
  }

  /** Per-document word-repetition stats:
    * (id, n_words, n_distinct, dup_word_ratio, top_word_fraction).
    * dup_word_ratio = 1 − distinct/total; top_word_fraction = count of
    * the most frequent word / total. Documents with zero word tokens
    * produce no row. */
  def wordRepetitionStats(df: DataFrame, idCol: String,
                          textCol: String): DataFrame = {
    val perWord = df
      .select(col(idCol).as("id"), explode(words(col(textCol))).as("wd"))
      .groupBy(col("id"), col("wd"))
      .agg(count(lit(1)).as("c"))
    perWord.groupBy(col("id"))
      .agg(sum(col("c")).as("n_words"),
        count(lit(1)).as("n_distinct"),
        max(col("c")).as("max_c"))
      .select(col("id"), col("n_words"), col("n_distinct"),
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_words"), 6)
          .as("dup_word_ratio"),
        round(col("max_c").cast("double") / col("n_words"), 6)
          .as("top_word_fraction"))
  }
}
