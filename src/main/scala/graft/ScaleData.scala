package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic in-engine corpus amplifier: explode-multiplies the
  * synthetic testdata `factor`× with key remapping, producing an
  * sf1-equivalent directory from sf0.1 so the scale-stress harness
  * ([[ScaleTest]]) can MEASURE — not argue — that the heavy plans
  * survive a 10× data growth (round-9 verdict item 1).
  *
  * Remap scheme — interleaved keys, disjoint replica universes:
  *
  *   new_key = old_key * factor + rep        (rep ∈ [0, factor))
  *
  * Every foreign key in a replica is remapped with the SAME (factor,
  * rep), so each replica is a self-consistent copy of the original
  * star schema and all joins scale their outputs exactly `factor`×.
  * Interleaving (not offsetting) means a fixture range filter like
  * `l_orderkey < 1500` keeps selecting a CONSTANT-size slice (orig
  * keys < 1500/factor, once per replica) — queries with such caps
  * stay fixture-sized by construction and are reported as `capped`
  * by the harness rather than pretending to scale.
  *
  * Content perturbation — replicas must not be trivial duplicates of
  * one another or the dedup family's pair count would grow
  * quadratically in `factor` instead of linearly (every doc would
  * gain factor−1 exact clones):
  *   - documents.text: replica r applies a seeded PSEUDORANDOM
  *     permutation of the 26-letter alphabet (`translate`, both
  *     cases). A bijective character substitution maps each replica's
  *     char-n-gram and word-shingle SETS 1:1, so every within-replica
  *     Jaccard/minhash relation is IDENTICAL to the original corpus
  *     while replicas' vocabularies are (near-)disjoint — near-dup
  *     pair counts scale linearly, the property a real 10× corpus
  *     has. Two earlier schemes failed instructively: per-word `q{r}`
  *     prefixes injected a SHARED substring that inflated char-4-gram
  *     Jaccard (q_dedup_ngram 6 → 132k pairs at sf0.01×10), and
  *     Caesar ROTATIONS preserve letter-adjacency structure, so
  *     common grams of one replica reappear verbatim in others and
  *     ppjoin candidate counts grew superlinearly (q_dedup_curve
  *     6.7 s → 230 s). A random permutation scatters each replica's
  *     ~10³ distinct grams pseudo-uniformly over the 26⁴ gram space:
  *     expected cross-replica overlap is a couple of grams, so the
  *     prefix filter stays selective. Letters stay inside [a-z]
  *     because the tokenizer (`TextFunctions.words`) strips
  *     everything else — a Unicode-range scheme would turn replicas
  *     into empty token streams and fake sub-linear scaling. Word
  *     lengths, whitespace, and n_chars are unchanged by
  *     construction.
  *   - embeddings.embedding: replica r's vectors get a deterministic
  *     per-(replica, dimension) hash-sign flip (norm-preserving).
  *     Sign flips decorrelate the replicas: a first draft ROTATED the
  *     vectors instead, but adjacent-dimension correlation in the
  *     fixture made each vector's rotation a genuine near-dup of its
  *     neighbors' (q_dedup_embed pairs grew 106× at factor 10, a
  *     quadratic artifact, not a property of a real 10× corpus);
  *     under independent sign patterns cross-replica cosines
  *     concentrate near 0 and pair counts scale linearly.
  *   - events keep their timestamps (the stream gets factor× denser,
  *     which is how real traffic grows) with user/event ids remapped.
  *
  * region/nation are genuine dimensions and are copied unchanged.
  *
  * Everything is deterministic (no random, no clock): re-running
  * produces byte-identical relations, so DuckDB re-verification of
  * the graph/dedup oracles at the amplified scale is meaningful.
  */
object ScaleData {

  /** Tables whose rows multiply (vs copied dims). */
  val amplified: Seq[String] = Seq(
    "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings")

  def amplify(spark: SparkSession, srcDir: String, outDir: String,
              factor: Int): Unit = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    def src(name: String): DataFrame = Tables(spark, srcDir, name)

    // one replica index per source row; remapped keys stay BIGINT
    def withRep(df: DataFrame): DataFrame =
      df.withColumn("rep", explode(sequence(lit(0), lit(factor - 1))))
    def key(c: String) = (col(c) * factor + col("rep")).as(c)

    def write(name: String, df: DataFrame, parts: Int): Unit =
      df.repartition(parts).write.mode("overwrite")
        .parquet(s"$outDir/$name.parquet")

    write("region", src("region"), 1)
    write("nation", src("nation"), 1)

    write("customer", withRep(src("customer")).select(
      key("c_custkey"), col("c_name"), col("c_nationkey"),
      col("c_acctbal"), col("c_mktsegment")), 4)

    write("supplier", withRep(src("supplier")).select(
      key("s_suppkey"), col("s_name"), col("s_nationkey"),
      col("s_acctbal")), 2)

    write("part", withRep(src("part")).select(
      key("p_partkey"), col("p_name"), col("p_brand"), col("p_type"),
      col("p_size"), col("p_retailprice")), 4)

    write("orders", withRep(src("orders")).select(
      key("o_orderkey"), key("o_custkey"), col("o_orderstatus"),
      col("o_totalprice"), col("o_orderdate"), col("o_orderpriority")), 8)

    write("lineitem", withRep(src("lineitem")).select(
      key("l_orderkey"), key("l_partkey"), key("l_suppkey"),
      col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
      col("l_discount"), col("l_tax"), col("l_returnflag"),
      col("l_linestatus"), col("l_shipdate")), 32)

    // events.ts is already normalized to BIGINT epoch-ns by Tables;
    // writing it back as BIGINT keeps the ts-grain contract intact
    write("events", withRep(src("events")).select(
      key("event_id"), col("ts"), key("user_id"), col("event_type"),
      col("value"), col("props")), 16)

    val lower = "abcdefghijklmnopqrstuvwxyz"
    val upper = lower.toUpperCase(java.util.Locale.ROOT)
    // seeded Fisher-Yates per replica: deterministic, bijective
    def perm(s: String, r: Int): String = {
      val a = s.toCharArray
      val rnd = new java.util.Random(0x5ca1ab1eL + r)
      var i = a.length - 1
      while (i > 0) {
        val j = rnd.nextInt(i + 1)
        val t = a(i); a(i) = a(j); a(j) = t
        i -= 1
      }
      new String(a)
    }
    val permuted = (1 until factor).foldLeft(
      when(col("rep") === 0, col("text"))) { (acc, r) =>
      acc.when(col("rep") === r,
        translate(col("text"), lower + upper,
          perm(lower, r) + perm(upper, r)))
    }.otherwise(col("text"))
    val docs = withRep(src("documents")).select(
      key("doc_id"), permuted.as("text"), col("lang"), col("source"))
    write("documents",
      docs.withColumn("n_chars", length(col("text")).cast("int")), 8)

    write("embeddings", withRep(src("embeddings")).select(
      key("vec_id"),
      when(col("rep") === 0, col("embedding")).otherwise(expr(
        // ±1 per (rep, dim) from a hash bit — element type preserved
        "transform(embedding, (x, j) ->" +
          " x * cast(1 - 2 * pmod(hash(rep, j), 2) as float))"))
        .as("embedding"),
      col("label")), 4)

    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/_scale.json"), marker(srcDir, factor))
  }

  /** Bumped whenever the perturbation scheme changes, so a cached
    * amplified dir from an older amplifier never silently serves a
    * new run. */
  val scheme = 3

  private def marker(srcDir: String, factor: Int): String =
    s"""{"factor":$factor,"src":"$srcDir","scheme":$scheme}"""

  /** True when `outDir` already holds a completed amplification of
    * (`srcDir`, `factor`) by THIS amplifier version — the marker is
    * written LAST, so a torn previous run re-amplifies. */
  def isAmplified(outDir: String, srcDir: String, factor: Int): Boolean = {
    val p = java.nio.file.Paths.get(s"$outDir/_scale.json")
    java.nio.file.Files.exists(p) &&
      java.nio.file.Files.readString(p).trim == marker(srcDir, factor)
  }
}
