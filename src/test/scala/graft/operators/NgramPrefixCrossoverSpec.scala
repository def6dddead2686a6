package graft.operators

import graft.SparkSpec
import graft.dedup.Dedup
import org.apache.spark.sql.functions._

/** Demonstrates the prefix-filter crossover on a NATURAL-TEXT-SHAPED
  * gram space. The sf* synthetic corpus has only ~1k distinct char
  * 4-grams, which is the pathological case for prefix filtering (even
  * df-rare prefix grams are shared by hundreds of docs); natural text
  * has a high-cardinality gram space where the rarest-gram prefix join
  * is selective. This spec builds such a corpus — a large Zipf-ish
  * vocabulary of distinct word shapes — and asserts, against the
  * brute-force all-pairs definition:
  *
  *  1. losslessness: the prefix-filtered output EQUALS all-pairs
  *     Jaccard at the same threshold, and
  *  2. selectivity: candidate pairs ≪ all pairs (the measured run is
  *     recorded in [[Dedup.ngramJaccardPairs]]'s scaladoc caveat).
  */
class NgramPrefixCrossoverSpec extends SparkSpec {
  import spark.implicits._

  // deterministic corpus: 260 base docs of 50-99 words from a 200k-word
  // vocabulary (ids mixed so char grams vary), plus 25 near-dup
  // mutations (3 of 40 words replaced → word-set Jaccard ~0.85, char-gram higher)
  private lazy val docs: Seq[(Long, String, String)] = {
    val rnd = new scala.util.Random(42)
    // Zipf-ish draw over 200k word ids, rendered as 5-7 letter words
    // via a bit-mix (digit shapes like "w123x45" would share
    // structural grams across unrelated words — an artifact natural
    // text doesn't have)
    def word(): String = {
      val z = math.min(199999, math.floor(math.pow(rnd.nextDouble(), 1.3) * 200000).toInt)
      var x = (z * 0x9E3779B9L & 0x7FFFFFFFL) | (1L << 28)
      val sb = new StringBuilder
      while (x > 0) { sb.append(('a' + (x % 26)).toChar); x /= 26 }
      sb.toString
    }
    val base = (0L until 260L).map { i =>
      (i, "en", Seq.fill(50 + rnd.nextInt(50))(word()).mkString(" "))
    }
    val dups = (0 until 25).map { i =>
      val words = base(i)._3.split(" ")
      (3 until 6).foreach(j => words(j * 5) = word())
      (1000L + i, "en", words.mkString(" "))
    }
    base ++ dups
  }

  private lazy val df =
    docs.toDF("id", "lang", "text")

  test("prefix-filtered pairs equal the all-pairs definition (lossless)") {
    val got = Dedup.ngramJaccardPairs(df, "id", "text", "lang",
        k = 4, threshold = 0.8)
      .select("id_a", "id_b", "jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    // brute force: every id<id pair, same hashed-sorted-gram Jaccard
    val (_, sets) = Dedup.ngramCandidates(df, "id", "text", "lang",
      k = 4, threshold = 0.8)
    val inter = call_function(
      graft.expressions.GraftFunctions.IntersectSizeSorted,
      col("sh_a"), col("sh_b"))
    val brute = sets.select(col("id").as("id_a"), col("sz").as("sz_a"),
        col("sh").as("sh_a"))
      .join(sets.select(col("id").as("id_b"), col("sz").as("sz_b"),
        col("sh").as("sh_b")), col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(inter.cast("double") / (col("sz_a") + col("sz_b") - inter), 6)
          .as("jaccard"))
      .where(col("jaccard") >= 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    assert(brute.nonEmpty, "fixture must produce near-dup pairs")
    assert(got == brute)
    spark.catalog.clearCache()
  }

  test("candidates are a small fraction of all pairs (selective)") {
    val (cand, _) = Dedup.ngramCandidates(df, "id", "text", "lang",
      k = 4, threshold = 0.8)
    val n = docs.size.toLong
    val allPairs = n * (n - 1) / 2
    val candidates = cand.count()
    info(s"candidates=$candidates of allPairs=$allPairs " +
      f"(${100.0 * candidates / allPairs}%.2f%%)")
    // the sf* synthetic corpus passes ~8% of all pairs (994k of
    // 12.5M); a natural gram space must do far better
    assert(candidates < allPairs / 50,
      s"$candidates candidates vs $allPairs all pairs — prefix filter " +
        "not selective on a high-cardinality gram space")
    spark.catalog.clearCache()
  }

  test("verify-shuffle sizing: conf floor, measured growth, core floor") {
    val conf = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // empty / tiny volumes keep the session conf (small-SF plans and
    // their lint/bench records must stay byte-identical)
    assert(Dedup.verifyShufflePartitions(spark, 0L, 0.0) == conf)
    assert(Dedup.verifyShufflePartitions(spark, 100L, 50.0) >= conf)
    // 10M candidates x 900-gram sets = ~288 GB of verify rows:
    // ceil(2*900*16*10M / 128 MB) = 2146 partitions at the default target
    val big = Dedup.verifyShufflePartitions(spark, 10_000_000L, 900.0)
    assert(big == 2146, s"expected 2146 measured partitions, got $big")
    // growth is linear in candidate volume
    assert(Dedup.verifyShufflePartitions(spark, 20_000_000L, 900.0) == 2 * big)
  }

  test("sized verify path is result-invariant (cloned session, conf=2)") {
    // a cloned session with shuffle.partitions=2 < defaultParallelism
    // forces the resize branch (advice floors at cores=4) on ANY
    // nonempty corpus — same pairs, verify join at the advised width
    val clone = spark.newSession()
    clone.conf.set("spark.sql.shuffle.partitions", "2")
    // force the SHUFFLE verify branch: the r19 default broadcasts the
    // per-doc set table whenever it fits, which this tiny corpus does
    clone.conf.set("spark.graft.dedup.broadcastVerifySetsMaxBytes", "0")
    val cloneDf = clone.createDataFrame(
      spark.sparkContext.parallelize(docs.map(d => org.apache.spark.sql.Row(d._1, d._2, d._3)), 4),
      df.schema)
    val sized = Dedup.ngramJaccardPairs(cloneDf, "id", "text", "lang",
      k = 4, threshold = 0.8)
    val cores = math.max(clone.sparkContext.defaultParallelism, 1)
    assert(sized.rdd.getNumPartitions == cores,
      s"expected the advised $cores-partition verify join, got " +
        s"${sized.rdd.getNumPartitions}")
    val got = sized.select("id_a", "id_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val base = Dedup.ngramJaccardPairs(df, "id", "text", "lang",
        k = 4, threshold = 0.8)
      .select("id_a", "id_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == base)
    spark.catalog.clearCache()
  }
}
