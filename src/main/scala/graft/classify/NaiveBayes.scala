package graft.classify

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Multinomial Naive Bayes text classification, trained and applied
  * as pure aggregations — the classic trainable-model step of a data
  * pipeline (label routing, quality-tier prediction, language
  * verification) expressed Spark-first: training IS two groupBys
  * (class priors, per-class word counts) and scoring IS a join plus a
  * sum, so the "model" never leaves the cluster as anything but small
  * DataFrames.
  *
  * Engine-exact scoring: each word's class-conditional `-ln P(w|c)`
  * (add-one smoothing) and each class prior `-ln P(c)` are rounded to
  * integer MICRO-NATS before any summation (the [[graft.functions.NgramLm]]
  * round-then-sum trick), so per-document class costs are order-free
  * integer sums and the argmin (cost asc, class asc) replays exactly
  * on any engine.
  *
  * Scale shape: ONE tokenize pass; per-class word counts and class
  * totals are map-side-combined groupBys; the smoothing spine
  * (distinct words × classes — the add-one term exists for UNSEEN
  * (word, class) pairs, so the spine is the model, not overhead) is a
  * broadcast cross join against the class list; scoring joins
  * per-document word occurrences to the spine on the word key (the
  * minimal co-location any NB scorer needs) and aggregates (doc,
  * class). Nothing is collected to the driver.
  */
object NaiveBayes {

  /** Self-train on (textCol → labelCol) and score every document:
    * (id, label, pred, cost_micro) where `pred` is the argmin-cost
    * class and `cost_micro` its negative log-posterior in micro-nats.
    * Documents with no words fall back to the prior-only argmin. */
  def classify(docs: DataFrame, idCol: String, textCol: String,
               labelCol: String): DataFrame = {
    val base = graft.operators.Spread.ensure(docs.select(
      col(idCol).as("id"), col(labelCol).as("label"),
      TextFunctions.words(col(textCol)).as("w")))
    val tok = base.select(col("id"), col("label"),
      explode_outer(col("w")).as("word"))
      .where(col("word").isNotNull) // lint-clean explode (see Bpe)
    val wc = tok.groupBy(col("label"), col("word"))
      .agg(count(lit(1)).as("n_wc"))
    val cc = tok.groupBy(col("label")).agg(count(lit(1)).as("n_c"))
    val vv = tok.agg(countDistinct(col("word")).as("V"))
    val nd = docs.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("n_docs"))
    val nt = docs.agg(count(lit(1)).as("N"))
    val classes = nd.select(col("label")).distinct()
    // smoothing spine: every (word, class) pair, unseen pairs at 0
    val spine = tok.select(col("word")).distinct()
      .crossJoin(broadcast(classes))
      .join(wc, Seq("label", "word"), "left")
      .join(cc, Seq("label"))
      .crossJoin(broadcast(vv))
      .select(col("word"), col("label"),
        round(log((col("n_c") + col("V")).cast("double") /
          (coalesce(col("n_wc"), lit(0L)) + lit(1.0))) * lit(1000000.0))
          .cast("long").as("lp"))
    val prior = nd.crossJoin(broadcast(nt))
      .select(col("label"),
        round(log(col("N").cast("double") / col("n_docs")) * lit(1000000.0))
          .cast("long").as("pc"))
    val dwo = tok.groupBy(col("id"), col("word"))
      .agg(count(lit(1)).as("occ"))
    val wcost = dwo
      .join(spine.withColumnRenamed("label", "cls"), Seq("word"))
      .groupBy(col("id"), col("cls"))
      .agg(sum(col("occ") * col("lp")).as("wcost"))
    // doc × class spine so a word-less document still gets the
    // prior-only argmin
    val tot = docs.select(col(idCol).as("id"))
      .crossJoin(broadcast(classes.select(col("label").as("cls"))))
      .join(wcost, Seq("id", "cls"), "left")
      .join(prior.select(col("label").as("cls"), col("pc")), Seq("cls"))
      .select(col("id"), col("cls"),
        (coalesce(col("wcost"), lit(0L)) + col("pc")).as("cost"))
    val best = tot.groupBy(col("id"))
      .agg(min(struct(col("cost"), col("cls"))).as("m"))
      .select(col("id"), col("m.cls").as("pred"),
        col("m.cost").as("cost_micro"))
    docs.select(col(idCol).as("id"), col(labelCol).as("label"))
      .join(best, Seq("id"))
  }
}
