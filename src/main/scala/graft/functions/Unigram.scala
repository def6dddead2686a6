package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Converge.SanitizedCheckpoint

/** Distributed unigram-LM (SentencePiece-style) tokenizer training —
  * the second of the two real-world subword trainers ([[Bpe]] is the
  * first): seed a large candidate-piece vocabulary from corpus
  * substring counts, then alternate Viterbi segmentation of the word
  * types under the current piece costs with count re-estimation and
  * pruning (hard-EM — the deterministic Viterbi variant of
  * SentencePiece's E step, chosen so an independent serial engine
  * replays the training bit-for-bit; soft forward-backward EM would
  * be float-order-sensitive).
  *
  * Costs are integer MICRO-NATS with add-one smoothing,
  * `cost(p) = round(ln((total + V) / (cnt + 1)) · 1e6)` — the same
  * engine-exactness contract as [[NgramLm]]. Viterbi minimizes the
  * total integer cost left to right; on ties the LONGER piece ending
  * at the position wins (fixed iteration order), so segmentations
  * are unique.
  *
  * Scale shape (the [[Bpe]] contract): the corpus is touched ONCE
  * (word-type counts, map-side combined); seeding is an explode of
  * ≤ `maxPieceLen`·|word| substrings per TYPE with a groupBy(piece)
  * partial-agg; every EM round segments the TYPE table under a broadcast
  * vocabulary-sized cost map and re-counts pieces with one explode +
  * groupBy. The driver holds only vocabulary-sized tables (seed ≤
  * `seedSize` rows, counts ≤ vocab rows) — the bounded-collect
  * contract of the BPE merge table. Per-round cost is O(types ·
  * word_len · maxPieceLen), the textbook bound.
  */
object Unigram {

  /** Candidate seed vocabulary from the word-TYPE table
    * ([[Bpe.wordTypes]]): every substring of length ≤ `maxPieceLen`
    * of every type, weighted by type frequency (every start position
    * counts), keeping ALL single characters (segmentation coverage)
    * plus the top `seedSize` longer pieces by (count desc, piece
    * asc). Returns (piece, cnt). */
  def seedVocab(types: DataFrame, maxPieceLen: Int = 6,
                seedSize: Int = 4000): DataFrame = {
    require(maxPieceLen >= 1 && seedSize >= 0)
    val counts = types
      .select(col("n"), explode(expr(
        s"flatten(transform(sequence(1, length(word)), i -> " +
          s"transform(sequence(i, least(length(word), i + ${maxPieceLen - 1})), " +
          s"j -> substring(word, i, j - i + 1))))")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("n")).as("cnt"))
      .persist()
    val chars = counts.where(length(col("piece")) === 1)
    // TakeOrdered(seedSize) — vocabulary-sized, driver-bounded
    val top = counts.where(length(col("piece")) > 1)
      .orderBy(col("cnt").desc, col("piece")).limit(seedSize)
    chars.unionByName(top)
  }

  /** Trained model: (piece, cnt, cost_micro), vocabulary-sized. */
  final case class UnigramModel(pieces: Seq[(String, Long, Long)]) {
    def toDF(spark: SparkSession): DataFrame = {
      import spark.implicits._
      pieces.toDF("piece", "cnt", "cost_micro")
    }
    lazy val costMap: Map[String, Long] =
      pieces.map(p => p._1 -> p._3).toMap
    lazy val maxPieceLen: Int =
      if (pieces.isEmpty) 1 else pieces.map(_._1.length).max
  }

  /** Deterministic Viterbi segmentation of one word under integer
    * piece costs: minimize total cost; on equal cost the longer
    * piece ending at each position wins. Every corpus character is a
    * vocabulary piece by construction, so segmentation always
    * succeeds on corpus words; a word with out-of-vocabulary
    * CHARACTERS (scoring unseen data) falls back to per-char pieces
    * for the unknown stretches. */
  private[graft] def viterbi(word: String, cost: Map[String, Long],
                             maxLen: Int): Seq[String] = {
    val n = word.length
    if (n == 0) return Nil
    val INF = Long.MaxValue
    // per-char fallback cost for OOV single chars: one above the
    // worst vocabulary cost (deterministic, never preferred)
    val oov = if (cost.isEmpty) 1L else cost.values.max + 1L
    val best = Array.fill(n + 1)(INF)
    val back = new Array[Int](n + 1)
    best(0) = 0L
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxLen)
      while (j < i) {
        if (best(j) != INF) {
          val piece = word.substring(j, i)
          val c = cost.get(piece) match {
            case Some(x) => x
            case None => if (i - j == 1) oov else -1L
          }
          if (c >= 0 && best(j) + c < best(i)) {
            best(i) = best(j) + c
            back(i) = j
          }
        }
        j += 1
      }
      i += 1
    }
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var k = n
    while (k > 0) {
      out.prepend(word.substring(back(k), k))
      k = back(k)
    }
    out.toList
  }

  private def costsOf(counts: Seq[(String, Long)]): Seq[(String, Long, Long)] = {
    val total = counts.map(_._2).sum
    val v = counts.size.toLong
    counts.map { case (p, c) =>
      (p, c, math.round(math.log((total + v).toDouble / (c + 1.0)) * 1e6))
    }
  }

  /** Hard-EM training over the word-TYPE table: seed → `rounds` ×
    * (Viterbi-segment every type under broadcast costs → re-count
    * pieces weighted by type frequency → keep all single chars plus
    * the top `vocabSize` longer pieces by (count desc, piece asc) →
    * re-derive smoothed costs). Pieces the segmentation stopped
    * using drop out; the final model is (piece, cnt, cost_micro). */
  def train(types: DataFrame, vocabSize: Int = 1000,
            maxPieceLen: Int = 6, rounds: Int = 3,
            seedSize: Int = 4000): UnigramModel = {
    require(vocabSize >= 1 && rounds >= 1)
    val spark = types.sparkSession
    val typesCk = types.select(col("word"), col("n")).sanitizedCheckpoint()
    val seed = seedVocab(typesCk, maxPieceLen, seedSize)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      .sortBy(_._1)
    var model = costsOf(seed)
    var r = 0
    while (r < rounds) {
      val bc = spark.sparkContext.broadcast(
        (model.map(p => p._1 -> p._3).toMap, maxPieceLen))
      val seg = udf((w: String) => viterbi(w, bc.value._1, bc.value._2))
      val used = typesCk
        .select(col("n"), explode(seg(col("word"))).as("piece"))
        .groupBy(col("piece")).agg(sum(col("n")).as("cnt"))
        .collect().map(x => (x.getString(0), x.getLong(1))).toSeq
      val byPiece = used.toMap
      val chars = model.map(_._1).filter(_.length == 1)
        .map(p => (p, byPiece.getOrElse(p, 0L)))
      val longer = used.filter(_._1.length > 1)
        .sortBy { case (p, c) => (-c, p) }.take(vocabSize)
      model = costsOf((chars ++ longer).sortBy(_._1))
      bc.destroy()
      r += 1
    }
    UnigramModel(model)
  }

  /** Join-based segmentation statistics against a trained model —
    * the [[Bpe.encodeStats]] shape: the corpus is re-touched once,
    * each word TYPE segments once, documents join their types.
    * Returns (id, n_words, n_pieces, n_distinct_pieces). */
  def encodeStats(docs: DataFrame, idCol: String, textCol: String,
                  model: UnigramModel): DataFrame = {
    val spark = docs.sparkSession
    val bc = spark.sparkContext.broadcast((model.costMap, model.maxPieceLen))
    val seg = udf((w: String) => viterbi(w, bc.value._1, bc.value._2))
    val tok = graft.operators.Spread.ensure(
      docs.select(col(idCol).as("id"), TextFunctions.words(col(textCol)).as("w")))
      .select(col("id"), explode_outer(col("w")).as("word"))
      .where(col("word").isNotNull)
    val types = tok.select(col("word")).distinct()
      .select(col("word"), seg(col("word")).as("pieces"))
    val sub = tok.join(types, Seq("word"))
      .select(col("id"), explode(col("pieces")).as("piece"))
    val agg = sub.groupBy(col("id")).agg(
      count(lit(1)).as("n_pieces"),
      countDistinct(col("piece")).as("n_distinct_pieces"))
    val nw = tok.groupBy(col("id")).agg(count(lit(1)).as("n_words"))
    docs.select(col(idCol).as("id"))
      .join(nw, Seq("id"), "left").join(agg, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_pieces"), lit(0L)).as("n_pieces"),
        coalesce(col("n_distinct_pieces"), lit(0L)).as("n_distinct_pieces"))
  }
}
