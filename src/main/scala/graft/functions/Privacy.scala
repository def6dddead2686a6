package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.operators.Converge.SanitizedCheckpoint

/** Privacy transforms for training-data preparation, complementing
  * pattern-based removal (`TextFunctions.redactPii`): keyed
  * pseudonymization keeps referential integrity across tables without
  * exposing the identifier; masking and banding generalize
  * quasi-identifiers. All pure codegen Column expressions — no UDFs,
  * so they inline into whole-stage codegen next to the scan.
  *
  * Scale shape: per-row narrow transforms, no shuffle, no state; the
  * same secret yields the same pseudonym on every executor, so joins
  * on pseudonymized keys still co-partition.
  */
object Privacy {

  /** Keyed one-way pseudonym: SHA-256 over secret-prefixed value.
    * Deterministic (same value + secret → same token, so the token
    * remains joinable), non-reversible, and resistant to rainbow
    * lookup of low-entropy identifiers as long as `secret` is strong.
    * Nulls stay null (concat_ws would swallow them otherwise). */
  def pseudonymize(c: Column, secret: String): Column =
    when(c.isNull, lit(null).cast("string"))
      .otherwise(sha2(concat_ws("|", lit(secret), c.cast("string")), 256))

  /** Replace all but the last `keep` characters with '*'. Values with
    * length <= keep pass unchanged (repeat of a negative count is
    * empty on both Spark and DuckDB — the oracle relies on it). */
  def maskKeepLast(c: Column, keep: Int): Column =
    concat(call_function("repeat", lit("*"), length(c) - keep),
      substring(c, -keep, keep))

  /** Generalize a numeric to the lower edge of its `width`-sized band
    * (k-anonymity-style coarsening for quasi-identifiers). */
  def band(c: Column, width: Double): Column =
    floor(c / width) * width

  /** k-anonymity audit: the quasi-identifier equivalence classes with
    * FEWER than `k` members — the rows a release would have to
    * generalize further or suppress. One partial-aggregated groupBy on
    * the quasi columns (the shuffle carries one row per class per
    * partition), so the audit runs at full table scale; an empty
    * result certifies the release as k-anonymous. */
  def kAnonymityViolations(df: org.apache.spark.sql.DataFrame,
                           quasiCols: Seq[String], k: Long
                          ): org.apache.spark.sql.DataFrame = {
    require(quasiCols.nonEmpty && k >= 1,
      "need at least one quasi-identifier column and k >= 1")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .where(col("class_size") < k)
  }

  /** l-diversity audit: k-anonymity alone still leaks when an
    * equivalence class is homogeneous in the SENSITIVE attribute
    * (everyone in the class shares the diagnosis). Per class, report
    * `class_size`, `l_distinct` (distinct sensitive values),
    * `top_freq` (count of the most common one) and keep the classes
    * with fewer than `l` distinct values — an empty result certifies
    * distinct-l-diversity.
    *
    * Two stacked partial aggs (class×value, then class) — never a
    * distinct-agg over the raw rows, so it scales like a word count.
    */
  def lDiversityViolations(df: org.apache.spark.sql.DataFrame,
                           quasiCols: Seq[String], sensitiveCol: String,
                           l: Long): org.apache.spark.sql.DataFrame = {
    require(quasiCols.nonEmpty && l >= 1,
      "need at least one quasi-identifier column and l >= 1")
    val q = quasiCols.map(col)
    df.groupBy((q :+ col(sensitiveCol)): _*)
      .agg(count(lit(1)).as("__vc"))
      .groupBy(q: _*)
      .agg(sum(col("__vc")).cast("long").as("class_size"),
        count(lit(1)).as("l_distinct"),
        max(col("__vc")).cast("long").as("top_freq"))
      .where(col("l_distinct") < l)
  }

  /** One level of a right-to-be-forgotten cascade: the table, the
    * column that links it to the previous level's emitted keys, and
    * (for non-leaf levels) the column whose values become the next
    * level's keys. */
  case class CascadeLevel(table: String,
                          df: org.apache.spark.sql.DataFrame,
                          linkCol: String, nextKeyCol: Option[String])

  /** Right-to-be-forgotten impact report: walk a parent→child key
    * chain (customer → their orders → those orders' line items) from
    * a seed of deletion-request keys and count the rows each table
    * would purge. The DELETE itself is `Sinks.deleteWhere` per table;
    * this is the audit/planning pass a GDPR workflow runs first (and
    * logs) — deleting children before parents, which is why the
    * report preserves chain order.
    *
    * Scale shape: per level one semi-join (left_semi against the
    * previous level's key set — broadcast when small, shuffle
    * otherwise) and one distinct projection feeding the next level.
    * Nothing is collected; key frames stay distributed. Each level's
    * matched frame is persisted because it feeds BOTH the count and
    * the next level's key projection.
    *
    * @return (table, n_purged) in chain order, tagged `level` 1..n
    */
  def forgetCascade(seedKeys: org.apache.spark.sql.DataFrame,
                    seedCol: String, levels: Seq[CascadeLevel]
                   ): org.apache.spark.sql.DataFrame = {
    require(levels.nonEmpty, "cascade needs at least one level")
    val spark = seedKeys.sparkSession
    import spark.implicits._
    var keys = seedKeys.select(col(seedCol).as("__k")).distinct()
    val counts = levels.zipWithIndex.map { case (lvl, i) =>
      val hit = lvl.df
        .join(keys, lvl.df(lvl.linkCol) === keys("__k"), "left_semi")
        .persist()
      val n = hit.count()
      keys = lvl.nextKeyCol match {
        case Some(nk) => hit.select(col(nk).as("__k")).distinct()
          .sanitizedCheckpoint() // sever before the parent cache releases
        case None => keys
      }
      hit.unpersist(blocking = false)
      (i + 1, lvl.table, n)
    }
    counts.toDF("level", "table", "n_purged")
  }
}
