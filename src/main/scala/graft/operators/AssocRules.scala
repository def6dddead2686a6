package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise market-basket association rules — support, confidence,
  * lift — in exact ppm integer arithmetic.
  *
  * Scale shape: the pair stage is a per-basket self-join, so its
  * output is Σ_b C(items_b, 2) — bounded by the per-basket item
  * count, NOT the catalog size (TPC-H orders hold ≤ 7 lines → ≤ 21
  * pairs each; a retail basket of 50 items → 1225). It grows
  * linearly in baskets at any corpus size; a pathological mega-basket
  * (thousands of items) is the one skew case, and the fix is the
  * usual salting/cap upstream, not a different algorithm. Supports
  * and the basket total are plain partial-agg counts; the
  * rule-assembly joins key on single items (broadcastable item
  * table).
  *
  * Exactness: conf_ppm = supp(a,b)·10⁶ div supp(a) in long
  * arithmetic; lift_ppm = supp(a,b)·N·10⁶ div (supp(a)·supp(b)) with
  * the numerator and denominator in DECIMAL(38,0) — supp·N·10⁶
  * overflows a long once baskets reach ~3×10⁶, and the decimal path
  * (the q_graph_stats pattern) is exact wherever both engines run it.
  */
object AssocRules {

  /** @param baskets    (basket, item) rows; duplicates tolerated
    * @param minSupport emit rules only for pairs co-occurring in at
    *                   least this many baskets
    * @return (ante, cons, supp_pair, supp_ante, supp_cons, conf_ppm,
    *         lift_ppm) — both directions of every qualifying pair */
  def rules(baskets: DataFrame, basketCol: String, itemCol: String,
            minSupport: Long): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1: $minSupport")
    val b = baskets.select(col(basketCol).as("ok"), col(itemCol).as("pk"))
      .distinct().persist()
    b.count() // materialize: items, pairs, and the total all read it
    val items = b.groupBy(col("pk")).agg(count(lit(1)).as("supp"))
    val pairs = b.alias("x").join(b.alias("y"),
        col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
      .groupBy(col("x.pk").as("a"), col("y.pk").as("c"))
      .agg(count(lit(1)).as("supp_pair"))
      .where(col("supp_pair") >= minSupport)
    val nFrame = b.agg(countDistinct(col("ok")).as("n_baskets"))
    val directed = pairs.select(explode(array(
        struct(col("a").as("ante"), col("c").as("cons"), col("supp_pair")),
        struct(col("c").as("ante"), col("a").as("cons"), col("supp_pair"))))
        .as("r"))
      .select(col("r.ante"), col("r.cons"), col("r.supp_pair"))
    directed
      .join(items.select(col("pk").as("ante"), col("supp").as("supp_ante")),
        Seq("ante"))
      .join(items.select(col("pk").as("cons"), col("supp").as("supp_cons")),
        Seq("cons"))
      .crossJoin(broadcast(nFrame))
      .select(col("ante"), col("cons"), col("supp_pair"),
        col("supp_ante"), col("supp_cons"),
        expr("CAST(supp_pair * 1000000 div supp_ante AS BIGINT)")
          .as("conf_ppm"),
        expr("CAST(CAST(supp_pair AS DECIMAL(38,0)) * n_baskets * 1000000" +
          " div (CAST(supp_ante AS DECIMAL(38,0)) * supp_cons) AS BIGINT)")
          .as("lift_ppm"))
  }
}
