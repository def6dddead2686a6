package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Staged RICH-TYPE documents bench fixture. The sf0.1 `documents`
  * table has ~31 distinct word types, so every per-TYPE cost in the
  * text family (tokenizer munch, Kneser–Ney continuation stats,
  * stopword/quality scans) is priced at a vocabulary three orders of
  * magnitude below production — the r15 WordPiece probe had to
  * synthesize a corpus ad hoc every run. This stages that corpus
  * ONCE per box as a fingerprinted parquet table (the ArtifactStore
  * discipline: every constant that determines the bytes is in the
  * tag), so type-scaling bench rows are reproducible round over
  * round and cost a read, not a regeneration.
  *
  * Shape: `Docs` documents of 20–60 words; each word is drawn from a
  * `TypePool`-sized type table by a cubed-uniform rank (a Zipf-ish
  * head: rank = ⌊pool · u³⌋ concentrates mass on low ranks while the
  * tail still surfaces most of the pool), and a type's surface form
  * is the 6–14-char deterministic hash word the WordPiece probe
  * established. Everything derives from row ids — no RNG, so the
  * staged bytes are a pure function of the tag. */
object RichDocs {
  val Docs = 100000L
  val TypePool = 200000L

  /** The type table: (t, word), word deterministic from t. */
  def types(spark: SparkSession, pool: Long = TypePool): DataFrame =
    spark.range(pool).select(col("id").as("t"),
      expr("concat_ws('', transform(sequence(1, 6 + cast(id % 9 as int)), " +
        "i -> char(ascii('a') + pmod(hash(id, i), 26))))").as("word"))

  /** Stage (once) and return the parquet path of the (doc_id, text)
    * table. */
  def stage(spark: SparkSession): String = {
    def write(out: String): Unit = {
      val ty = types(spark)
      val draws = spark.range(Docs)
        .repartition(32)
        .select(col("id").as("doc_id"),
          explode(expr("sequence(1, 20 + cast(id % 41 as int))")).as("j"))
        .select(col("doc_id"), col("j"),
          expr("cast(pow(pmod(hash(doc_id, j), 1000000) / 1000000.0, 3.0)" +
            s" * ${TypePool}L as long)").as("t"))
      draws.join(broadcast(ty), Seq("t"))
        .groupBy(col("doc_id"))
        .agg(array_sort(collect_list(struct(col("j"), col("word"))))
          .as("ws"))
        .select(col("doc_id"),
          expr("concat_ws(' ', transform(ws, x -> x.word))").as("text"))
        .write.mode("overwrite").parquet(out)
    }
    graft.control.ArtifactStore.parquet(
      s"richdocs_v1:docs=$Docs:pool=$TypePool:words=20+id%41:zipf=u3",
      "bench")(write)
  }
}
