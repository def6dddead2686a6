package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-time (PIT) join — the feature-store correctness operator:
  * each fact row gets the dimension attributes of the version that was
  * valid AT THE FACT'S TIMESTAMP (`valid_from <= ts < valid_to`, open
  * versions have null `valid_to`), never the current ones. Joining
  * facts to a dimension's latest rows silently trains on the future;
  * the PIT join is what makes backfilled training data reproduce what
  * production actually saw.
  *
  * Built on [[AsofJoin]]'s union+window form (ONE shuffle on the key,
  * no inequality-join pair explosion — the shape that survives 100 TB
  * of facts), plus two PIT-specific pieces:
  *
  *  - the dimension payload travels as ONE struct, so the window's
  *    last-non-null carry moves whole versions atomically — a version
  *    with a genuinely-null attribute can't leak the previous
  *    version's value for just that column;
  *  - after the as-of match on `valid_from`, facts at-or-past the
  *    matched version's `valid_to` (a closed version with no
  *    successor, or a gap in the history) get null attributes instead
  *    of expired ones — fact rows are always preserved.
  *
  * `tsCol` on facts and `validFrom`/`validTo` on the dimension must be
  * mutually comparable (ISO date strings, timestamps — same type both
  * sides).
  */
object PitJoin {

  def pitJoin(facts: DataFrame, dim: DataFrame, keys: Seq[String],
              tsCol: String, validFromCol: String, validToCol: String,
              payloadCols: Seq[String]): DataFrame = {
    val packed = Spread.freshCol(facts, "__pit")
    val dimR = dim.select(keys.map(col) :+
      col(validFromCol).as(tsCol) :+
      struct((payloadCols.map(col) :+
        col(validToCol).as("__valid_to")): _*).as(packed): _*)
    val j = AsofJoin.asofJoin(facts, dimR, keys, tsCol, Seq(packed))
    // expired = matched version closed before the fact's timestamp
    val expired = col(s"$packed.__valid_to").isNotNull &&
      col(tsCol) >= col(s"$packed.__valid_to")
    val keep = facts.columns.map(col)
    j.select(keep ++ payloadCols.map(c =>
      when(col(packed).isNull || expired, lit(null))
        .otherwise(col(s"$packed.$c")).as(c)): _*)
  }
}
