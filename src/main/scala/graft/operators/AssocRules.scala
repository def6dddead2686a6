package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Converge.SanitizedCheckpoint

/** Pairwise market-basket association rules — support, confidence,
  * lift — in exact ppm integer arithmetic.
  *
  * Scale shape: the pair stage is a per-basket self-join, so its
  * output is Σ_b C(items_b, 2) — bounded by the per-basket item
  * count, NOT the catalog size (TPC-H orders hold ≤ 7 lines → ≤ 21
  * pairs each; a retail basket of 50 items → 1225). It grows
  * linearly in baskets at any corpus size; a pathological mega-basket
  * (thousands of items) is the one skew case — [[rulesWithQuarantine]]
  * makes the guard real: baskets over a size cap are routed to a
  * quarantine report (the csvScanWithQuarantine idiom) instead of the
  * pair stage, so one 10⁵-item basket cannot silently emit 5×10⁹
  * pairs. Supports and the basket total are plain partial-agg counts;
  * the rule-assembly joins key on single items (broadcastable item
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
    rulesFromDistinct(b, minSupport)
  }

  /** [[rules]] with the mega-basket guard made real: baskets holding
    * more than `maxBasketSize` DISTINCT items are excluded from the
    * mining entirely — supports, the basket total, and the pair stage
    * all see only capped-free baskets — and reported in a quarantine
    * frame `(basket, n_items, reason)` the pipeline can persist next
    * to its run log. Rationale: a basket's pair cost is C(n, 2), so a
    * single 10⁵-item basket would emit 5×10⁹ pair rows — at 100 TB
    * the guard is the difference between a skew report and a wedged
    * shuffle stage. On capped-free data the rules output is identical
    * to [[rules]] and the quarantine is empty, so the oracle contract
    * is unchanged.
    *
    * The size scan is one partial-agg pass over the deduplicated
    * basket rows; the exclusion is a left-anti join against the
    * (rare, tiny) oversized set, which AQE broadcasts. */
  def rulesWithQuarantine(baskets: DataFrame, basketCol: String,
                          itemCol: String, minSupport: Long,
                          maxBasketSize: Long): (DataFrame, DataFrame) = {
    require(minSupport >= 1, s"minSupport must be >= 1: $minSupport")
    require(maxBasketSize >= 2,
      s"maxBasketSize must be >= 2 (pairs need two items): $maxBasketSize")
    val raw = baskets.select(col(basketCol).as("ok"), col(itemCol).as("pk"))
      .distinct().persist()
    raw.count() // one scan: sizes, quarantine, and the kept side
    // oversized is rare-and-tiny by contract, so it is MATERIALIZED
    // eagerly (localCheckpoint, not persist): the returned quarantine
    // frame and the anti-join read finished blocks that no eviction
    // can send recomputing through an unpersisted `raw`, and the
    // blocks are released by the ContextCleaner once the caller drops
    // the frame — nothing lingers in the cache registry
    val oversized = raw.groupBy(col("ok"))
      .agg(count(lit(1)).as("n_items"))
      .where(col("n_items") > maxBasketSize)
      .sanitizedCheckpoint()
    val quarantine = oversized
      .select(col("ok").as("basket"), col("n_items"),
        lit("basket_exceeds_max_size").as("reason"))
    // kept stays persisted across the mining core's three scans; as
    // with [[rules]]' basket cache the CALLER owns its lifetime (the
    // bench clears the cache per query; a long-lived session unpersists
    // or clears when done with the returned frames)
    val kept = raw.join(oversized.select(col("ok")), Seq("ok"), "left_anti")
      .persist()
    kept.count()
    raw.unpersist()
    (rulesFromDistinct(kept, minSupport), quarantine)
  }

  /** Mining core over deduplicated, already-materialized
    * (ok, pk) basket rows. */
  private def rulesFromDistinct(b: DataFrame,
                                minSupport: Long): DataFrame = {
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
