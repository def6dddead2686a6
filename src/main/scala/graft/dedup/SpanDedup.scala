package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.operators.Spread

/** Duplicate-passage mining: find word spans (rolling windows of
  * `window` consecutive word tokens) that occur in two or more
  * documents — the substring-level complement of the document-level
  * dedup family (cf. "Deduplicating Training Data Makes Language
  * Models Better", Lee et al. 2022, which removes repeated ≥50-token
  * substrings; suffix arrays don't distribute, rolling span hashes
  * do).
  *
  * Scale design: one pass computes every span hash per document (the
  * span count is |words| − window + 1, i.e. output is O(corpus
  * tokens)), then a single groupBy on the 60-bit span hash — shuffle
  * keyed on the hash, uniformly distributed by construction, with
  * map-side partial aggregation. No joins, no quadratic candidate
  * step: a span shared by d documents costs d rows in one reducer.
  * At 100 TB the only knob that matters is the shuffle partition
  * count on the span-hash exchange.
  */
object SpanDedup {

  /** (id, pos, span_hash) rows — `pos` is the 1-based word index the
    * window starts at; the positional form [[maximalDuplicatedSpans]]
    * needs. */
  def spanHashesWithPos(df: DataFrame, idCol: String, textCol: String,
                        window: Int): DataFrame = {
    // words materialized before the span lambda (lambda-cost rule:
    // captured expressions re-evaluate per element); the per-element
    // slice+concat+md5 is inherent work, not re-evaluation.
    val base = Spread.ensure(df.select(col(idCol).as("id"),
        col(textCol).as("txt")))
      .select(col("id"), words(col("txt")).as("w"))
    val spans = base.select(col("id"),
      when(size(col("w")) >= window,
        transform(sequence(lit(1), size(col("w")) - window + 1),
          i => hash64(concat_ws(" ", slice(col("w"), i, lit(window))))))
        .otherwise(array().cast("array<bigint>")).as("spans"))
    // posexplode_outer, not posexplode: InferFiltersFromGenerate
    // inlines the full generator expression into a synthesized filter
    // for plain generators (measured blowup — see Decontaminate);
    // outer generators are skipped by the rule, and the null rows from
    // empty arrays are dropped right here. Array index j ↔ word
    // position j+1.
    spans.select(col("id"),
        posexplode_outer(col("spans")).as(Seq("pos0", "span_hash")))
      .where(col("span_hash").isNotNull)
      .select(col("id"), (col("pos0") + 1).cast("long").as("pos"),
        col("span_hash"))
  }

  /** Per-document span hashes: (id, span_hash) rows, one per window
    * position. Documents shorter than `window` words emit no spans.
    * The hash is `TextFunctions.hash64` (md5-derived 60-bit) over the
    * space-joined window, so a DuckDB oracle reproduces it exactly. */
  def spanHashes(df: DataFrame, idCol: String, textCol: String,
                 window: Int): DataFrame =
    spanHashesWithPos(df, idCol, textCol, window)
      .select(col("id"), col("span_hash"))

  /** Spans appearing in ≥ `minDocs` distinct documents:
    * (span_hash, n_docs, n_occurrences, first_doc). `n_occurrences`
    * counts every window position, so within-document repetition is
    * visible too. */
  def duplicatedSpans(df: DataFrame, idCol: String, textCol: String,
                      window: Int, minDocs: Int = 2): DataFrame =
    spanHashes(df, idCol, textCol, window)
      .groupBy(col("span_hash"))
      .agg(countDistinct(col("id")).as("n_docs"),
        count(lit(1)).as("n_occurrences"),
        min(col("id")).as("first_doc"))
      .where(col("n_docs") >= minDocs)

  /** MAXIMAL duplicated passages per document: consecutive duplicated
    * windows merge into one (start_pos, end_pos) word range — the
    * actual text spans a passage-level cleaner would cut (cf. Lee et
    * al. 2022's ≥50-token repeated substrings), not one row per
    * window. Islands-and-gaps: duplicated window positions per doc,
    * `pos − row_number()` constant within a run of consecutive
    * positions. Returns (id, start_pos, end_pos, n_windows), 1-based
    * inclusive word positions.
    *
    * Scale shape: the span groupBy + semi join distribute on
    * span_hash; the island window partitions by doc id and its width
    * is bounded by the doc's own window count — no cross-doc state. */
  def maximalDuplicatedSpans(df: DataFrame, idCol: String,
                             textCol: String, window: Int,
                             minDocs: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spans = spanHashesWithPos(df, idCol, textCol, window).persist()
    val dup = spans.groupBy(col("span_hash"))
      .agg(countDistinct(col("id")).as("n_docs"))
      .where(col("n_docs") >= minDocs).select(col("span_hash"))
    val w = Window.partitionBy(col("id")).orderBy(col("pos"))
    val out = spans.join(dup, Seq("span_hash"), "left_semi")
      .withColumn("island", col("pos") - row_number().over(w))
      .groupBy(col("id"), col("island"))
      .agg(min(col("pos")).as("start_pos"),
        (max(col("pos")) + window - 1).as("end_pos"),
        count(lit(1)).as("n_windows"))
      .select(col("id"), col("start_pos"), col("end_pos"),
        col("n_windows"))
      // materialize the passage-scale result, release the token-scale
      // span cache (same lifecycle contract as docsWithDuplicatedSpans)
      .persist()
    out.count()
    spans.unpersist(blocking = false)
    out
  }

  /** KEEP-FIRST passage scrub — the dedup stack ending in a usable
    * transform: every duplicated window is kept only in its
    * lowest-id owner document and CUT from all later occurrences
    * (Lee et al. 2022's repeated-substring removal), returning
    * (id, cleaned_text, n_words, n_removed) over the normalized word
    * stream the span hashes are defined on.
    *
    * Scale shape: ownership is one span_hash-keyed agg; redundant
    * positions merge to ranges with the same islands trick as
    * [[maximalDuplicatedSpans]]; the cut itself is a per-document
    * array `filter` against that document's own (collected, few)
    * ranges — no token-level shuffle, text crosses the network once. */
  def scrubDuplicatedSpans(df: DataFrame, idCol: String, textCol: String,
                           window: Int, minDocs: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spans = spanHashesWithPos(df, idCol, textCol, window).persist()
    val owners = spans.groupBy(col("span_hash"))
      .agg(countDistinct(col("id")).as("n_docs"),
        min(col("id")).as("first_doc"))
      .where(col("n_docs") >= minDocs)
      .select(col("span_hash"), col("first_doc"))
    val redundant = spans.join(owners, Seq("span_hash"))
      .where(col("id") =!= col("first_doc"))
      .select(col("id"), col("pos"))
    val w = Window.partitionBy(col("id")).orderBy(col("pos"))
    val ranges = redundant
      .withColumn("island", col("pos") - row_number().over(w))
      .groupBy(col("id"), col("island"))
      .agg(min(col("pos")).as("s"),
        (max(col("pos")) + window - 1).as("e"))
      .groupBy(col("id"))
      .agg(collect_list(struct(col("s"), col("e"))).as("rs"))
    val base = df.select(col(idCol).as("id"), words(col(textCol)).as("w"))
    val out = base.join(ranges, Seq("id"), "left")
      .withColumn("rs", coalesce(col("rs"),
        array().cast("array<struct<s:bigint,e:bigint>>")))
      // word j (1-based) survives iff no redundant range covers it
      .withColumn("kept", filter(col("w"), (x, i) =>
        !exists(col("rs"),
          r => (i + 1) >= r.getField("s") && (i + 1) <= r.getField("e"))))
      .select(col("id").as(idCol),
        array_join(col("kept"), " ").as("cleaned_text"),
        size(col("w")).cast("long").as("n_words"),
        (size(col("w")) - size(col("kept"))).cast("long").as("n_removed"))
      .persist()
    out.count()
    spans.unpersist(blocking = false)
    out
  }

  /** Documents containing any duplicated span (candidates for
    * passage-level cleaning): left-semi join against the duplicated
    * span set — distributes as two hash shuffles on span_hash/id. */
  def docsWithDuplicatedSpans(df: DataFrame, idCol: String,
                              textCol: String, window: Int): DataFrame = {
    // persisted: the span-hash pass feeds both the dup aggregation and
    // the semi join — without the barrier the tokenize+hash subtree
    // executes twice
    val spans = spanHashes(df, idCol, textCol, window).persist()
    val out = spans.join(
        spans.groupBy(col("span_hash"))
          .agg(countDistinct(col("id")).as("n_docs"))
          .where(col("n_docs") >= 2).select(col("span_hash")),
        Seq("span_hash"), "left_semi")
      .select(col("id")).distinct()
      // materialize the doc-id-scale result, then release the
      // token-scale span cache eagerly (it must not outlive the call);
      // the returned small frame stays cached for the caller's actions
      .persist()
    out.count()
    spans.unpersist(blocking = false)
    out
  }
}
