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
  * Scale shape: ONE tokenize pass over the training corpus; per-class
  * word counts and class totals are map-side-combined groupBys; the
  * smoothing spine (distinct words × classes — the add-one term
  * exists for UNSEEN (word, class) pairs, so the spine is the model,
  * not overhead) is a broadcast cross join against the class list;
  * scoring joins per-document word occurrences to the spine on the
  * word key (the minimal co-location any NB scorer needs) and
  * aggregates (doc, class). Nothing is collected to the driver.
  */
object NaiveBayes {

  /** A trained model: `prior` (label, pc), the smoothing `spine`
    * (word, label, lp), the per-class out-of-vocabulary floor `oov`
    * (label, lpo) — the cost of a word never seen in training — and
    * the class list. All label-or-vocabulary sized. */
  final case class NbModel(prior: DataFrame, spine: DataFrame,
                           oov: DataFrame, classes: DataFrame)

  /** Train on (textCol → labelCol): two aggregations plus the
    * broadcast smoothing spine. */
  def train(docs: DataFrame, textCol: String, labelCol: String): NbModel = {
    val base = graft.operators.Spread.ensure(docs.select(
      col(labelCol).as("label"), TextFunctions.words(col(textCol)).as("w")))
    val tok = base.select(col("label"), explode_outer(col("w")).as("word"))
      .where(col("word").isNotNull) // lint-clean explode (see Bpe)
    val wc = tok.groupBy(col("label"), col("word"))
      .agg(count(lit(1)).as("n_wc"))
    val cc = tok.groupBy(col("label")).agg(count(lit(1)).as("n_c"))
    val vv = tok.agg(countDistinct(col("word")).as("V"))
    val nd = docs.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("n_docs"))
    val nt = docs.agg(count(lit(1)).as("N"))
    val classes = nd.select(col("label")).distinct()
    val spine = tok.select(col("word")).distinct()
      .crossJoin(broadcast(classes))
      .join(wc, Seq("label", "word"), "left")
      .join(cc, Seq("label"))
      .crossJoin(broadcast(vv))
      .select(col("word"), col("label"),
        round(log((col("n_c") + col("V")).cast("double") /
          (coalesce(col("n_wc"), lit(0L)) + lit(1.0))) * lit(1000000.0))
          .cast("long").as("lp"))
    val oov = cc.crossJoin(broadcast(vv))
      .select(col("label"),
        round(log((col("n_c") + col("V")).cast("double") / lit(1.0))
          * lit(1000000.0)).cast("long").as("lpo"))
    val prior = nd.crossJoin(broadcast(nt))
      .select(col("label"),
        round(log(col("N").cast("double") / col("n_docs")) * lit(1000000.0))
          .cast("long").as("pc"))
    NbModel(prior, spine, oov, classes)
  }

  /** Score `docs` against a trained model: (id, pred, cost_micro).
    * Words unseen in training cost the per-class add-one floor
    * `-ln(1/(n_c + V))`; word-less documents take the prior-only
    * argmin. Scoring other data than the training corpus is the
    * point of the split (held-out evaluation, arriving batches). */
  def score(docs: DataFrame, idCol: String, textCol: String,
            model: NbModel): DataFrame = {
    val tok = graft.operators.Spread.ensure(docs.select(
      col(idCol).as("id"), TextFunctions.words(col(textCol)).as("w")))
      .select(col("id"), explode_outer(col("w")).as("word"))
      .where(col("word").isNotNull)
    val dwo = tok.groupBy(col("id"), col("word"))
      .agg(count(lit(1)).as("occ"))
    val wcost = dwo
      .crossJoin(broadcast(model.classes.select(col("label").as("cls"))))
      .join(model.spine.select(col("word"), col("label").as("cls"),
        col("lp")), Seq("word", "cls"), "left")
      .join(model.oov.select(col("label").as("cls"), col("lpo")), Seq("cls"))
      .groupBy(col("id"), col("cls"))
      .agg(sum(col("occ") * coalesce(col("lp"), col("lpo"))).as("wcost"))
    val tot = docs.select(col(idCol).as("id"))
      .crossJoin(broadcast(model.classes.select(col("label").as("cls"))))
      .join(wcost, Seq("id", "cls"), "left")
      .join(model.prior.select(col("label").as("cls"), col("pc")), Seq("cls"))
      .select(col("id"), col("cls"),
        (coalesce(col("wcost"), lit(0L)) + col("pc")).as("cost"))
    tot.groupBy(col("id"))
      .agg(min(struct(col("cost"), col("cls"))).as("m"))
      .select(col("id"), col("m.cls").as("pred"),
        col("m.cost").as("cost_micro"))
  }

  /** Self-train on (textCol → labelCol) and score every document:
    * (id, label, pred, cost_micro). Composition of [[train]] and
    * [[score]] — self-scoring never reaches the OOV floor, so the
    * fused and split phrasings are identical. */
  def classify(docs: DataFrame, idCol: String, textCol: String,
               labelCol: String): DataFrame = {
    val best = score(docs, idCol, textCol, train(docs, textCol, labelCol))
    docs.select(col(idCol).as("id"), col(labelCol).as("label"))
      .join(best, Seq("id"))
  }
}
