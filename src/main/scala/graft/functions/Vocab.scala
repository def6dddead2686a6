package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic vocabulary construction — the tokenizer-prep step of
  * a training-data pipeline: token counts over the corpus, a
  * min-count floor, then contiguous integer ids assigned in
  * (count desc, token asc) order so any two engines (or two runs over
  * re-partitioned data) produce the IDENTICAL token→id table.
  *
  * Scale shape: the token-count groupBy (map-side combined) is the
  * only pass over text; the min-count filter shrinks the type table
  * before ranking; dense-id assignment runs DISTRIBUTED
  * ([[denseRankIds]]: range-partitioned sort + per-partition
  * prefix-sum offsets) — a 100 TB web corpus has 10⁸+ surviving
  * types, which an unpartitioned ranking window would funnel through
  * one straggler task.
  */
object Vocab {

  /** Global dense ids 0..N-1 over `df` in (orderN desc, orderTok asc)
    * order WITHOUT a single-partition window: range-partition on the
    * sort key (global order across partitions), rank locally within
    * each partition, then shift by the prefix sum of partition sizes.
    * The only driver-side data is one row PER PARTITION (the size
    * table) — same bounded control-plane collect contract as watermark
    * reads. Output is bit-identical to
    * `row_number().over(Window.orderBy(...)) - 1`: the key set is
    * unique (post-groupBy tokens), so the total order has no ties for
    * boundary placement to perturb. */
  private[graft] def denseRankIds(df: DataFrame, idName: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val parts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    // persisted: the size pass and the rank pass must see the SAME
    // physical partitioning (range boundaries are sampled per-run)
    val ranged = df.repartitionByRange(parts, col("n").desc, col("token"))
      .withColumn("__pid", spark_partition_id())
      .persist()
    val sizes = ranged.groupBy(col("__pid")).agg(count(lit(1)).as("c"))
      .as[(Int, Long)].collect().sortBy(_._1)
    var acc = 0L
    val offsets = sizes.map { case (pid, c) =>
      val o = (pid, acc); acc += c; o
    }.toSeq
    val local = Window.partitionBy(col("__pid"))
      .orderBy(col("n").desc, col("token"))
    ranged
      .join(broadcast(offsets.toDF("__pid", "__off")), Seq("__pid"))
      .withColumn(idName,
        (col("__off") + row_number().over(local) - 1).cast("long"))
      .drop("__pid", "__off")
  }

  /** (token, n, tok_id) with ids 0..|V|-1 dense in
    * (n desc, token asc) order; `minCount` drops the long tail before
    * the distributed ranking. */
  def build(docs: DataFrame, textCol: String, minCount: Long): DataFrame =
    denseRankIds(
      docs.select(explode(TextFunctions.words(col(textCol))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("n"))
        .where(col("n") >= minCount),
      "tok_id")
      .select(col("token"), col("n"), col("tok_id"))

  /** Incremental vocabulary maintenance: fold a new document batch
    * into an existing (token, n, tok_id) table WITHOUT renumbering —
    * ids already baked into tokenized shards must stay valid, so
    * existing tokens keep their id (counts updated), and unseen
    * tokens at-or-above `minCount` in the batch APPEND after the
    * current max id, ranked by (batch count desc, token). Per-batch
    * cost ∝ batch + |V|, never the historical corpus — same
    * maintenance contract as `Dedup.minHashPairsAgainstIndex`.
    * Limitation (standard for floored vocab state): counts that fell
    * below the floor in earlier batches were dropped, so a token's
    * `n` reflects batches since it first crossed the floor. */
  def extend(vocab: DataFrame, newDocs: DataFrame, textCol: String,
             minCount: Long): DataFrame = {
    val batch = newDocs
      .select(explode(TextFunctions.words(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("bn"))
    val kept = vocab.join(batch, Seq("token"), "left")
      .select(col("token"),
        (col("n") + coalesce(col("bn"), lit(0L))).as("n"), col("tok_id"))
    val nextId = vocab.agg(
      coalesce(max(col("tok_id")) + 1, lit(0L)).as("m0"))
    // distributed ranking for the appended block too (same contract
    // as build — a first-batch bootstrap can carry full-corpus scale)
    val fresh = denseRankIds(
        batch.join(vocab.select(col("token")), Seq("token"), "left_anti")
          .where(col("bn") >= minCount)
          .select(col("token"), col("bn").as("n")),
        "rid")
      .crossJoin(broadcast(nextId))
      .select(col("token"), col("n"),
        (col("m0") + col("rid")).cast("long").as("tok_id"))
    kept.unionByName(fresh)
  }

  /** Directed skip-gram pair counts — the word2vec/GloVe co-occurrence
    * substrate: for each token position i and distance d ∈ [1, window],
    * the ordered pair (token_i, token_{i+d}) counts once. Computed
    * with `window` LAG columns over the per-document position sort —
    * per-doc partitioned windows, never a positions self-join (which
    * replicates every token `window`× through a range join). One
    * shuffle on doc id (the window sort), one map-combined groupBy on
    * the pair — both scale-safe; cost is window × token count rows
    * into the final count, exactly the data's information content. */
  def skipgramCounts(docs: DataFrame, idCol: String, textCol: String,
                     window: Int): DataFrame = {
    require(window >= 1, "window must be >= 1")
    val toks = docs.select(col(idCol).as("__doc"),
        posexplode(TextFunctions.words(col(textCol))).as(Seq("pos", "tok")))
    val w = Window.partitionBy(col("__doc")).orderBy(col("pos"))
    // window exprs can't live inside a generator: materialize the lag
    // columns first, then explode the (lag d, current) pairs
    val lagged = toks.select(
      (1 to window).map(d => lag(col("tok"), d).over(w).as(s"a_$d")) :+
        col("tok").as("b"): _*)
    lagged.select(explode(array((1 to window).map(d =>
        struct(col(s"a_$d").as("a"), col("b"))): _*)).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .where(col("a").isNotNull)
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n"))
  }
}
