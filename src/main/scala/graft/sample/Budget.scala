package graft.sample

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.Converge.SanitizedCheckpoint

/** Token-budget mixture planning: given per-domain token counts, a
  * target mixture, and a total token budget, compute how many tokens
  * each domain may contribute and the per-domain acceptance rate that
  * achieves it — the planning step BEFORE `Sampling.mixtureResample`
  * actually draws documents (the budget arithmetic that papers like
  * The Pile / DoReMi report as "mixture weights" becomes an explicit,
  * auditable table here).
  *
  * A domain whose corpus is smaller than its target allocation is
  * CAPPED at what it has; the report carries the shortfall instead of
  * silently under-delivering the mixture (a caller can water-fill the
  * freed budget in a second round using the same table).
  *
  * All arithmetic is integer ppm with floor division — the plan is
  * engine-reproducible. Scale shape: one groupBy(domain) over the
  * corpus with map-side combine, a 1-row total cross, and a broadcast
  * join against the tiny targets table; output is |domains| rows.
  */
object Budget {

  /** @param tokens        per-row token count column
    * @param targets       (domain, target_ppm) mixture, should sum to
    *                      ~10⁶ (not enforced — partial mixtures are
    *                      legitimate)
    * @param budgetPpmOfTotal  total budget as ppm of the corpus'
    *                      total tokens (e.g. 600000 = keep 60%)
    * @return (domain, tokens, target_ppm, alloc_tokens, accept_ppm,
    *         shortfall) — alloc capped at available tokens,
    *         accept_ppm = alloc·10⁶/tokens, shortfall = target − alloc
    */
  /** Water-filling refinement of [[tokenBudgetAllocation]]: budget
    * freed by domains that cap at availability is redistributed to
    * the still-unfilled domains proportionally to their target
    * shares, `rounds` times — the fixpoint is the water-filling
    * allocation (each round is one scan of the |domains|-row plan
    * table; floor-division residue of at most |domains|−1 tokens per
    * round stays unspent, documented rather than fudged).
    *
    * Strict-refinement contract vs [[tokenBudgetAllocation]] (round-9
    * ADVICE): the corpus total is taken BEFORE the target join (same
    * envelope as the base API — untargeted domains still count toward
    * the budget), and round 1's grant is the base API's absolute-ppm
    * grant `target_ppm·budget div 10⁶` — so a no-cap `rounds = 1` run
    * equals the base allocation even for partial mixtures whose
    * targets don't sum to 10⁶. Only rounds ≥ 2 normalize by the LIVE
    * unfilled-target sum `tw` (relative shares of the freed budget).
    *
    * @return (domain, tokens, target_ppm, alloc_tokens, accept_ppm) */
  def waterfillAllocation(df: DataFrame, domainCol: Column,
                          tokens: Column, targets: Seq[(String, Long)],
                          budgetPpmOfTotal: Long,
                          rounds: Int = 2): DataFrame = {
    require(rounds >= 1 && budgetPpmOfTotal >= 0 &&
      budgetPpmOfTotal <= 1000000L)
    val spark = df.sparkSession
    import spark.implicits._
    val sized = df
      .select(domainCol.as("domain"), tokens.as("tk"))
      .groupBy(col("domain")).agg(sum(col("tk")).as("tokens"))
      .where(col("tokens") > 0)
      .sanitizedCheckpoint() // tiny plan table, re-read every round
    val perDomain = sized
      .join(broadcast(targets.toDF("domain", "target_ppm")), Seq("domain"))
    val budget = perDomain
      // total over ALL nonzero domains (pre-target-join), matching
      // tokenBudgetAllocation's budget envelope
      .crossJoin(sized.agg(sum(col("tokens")).as("tt")))
      .select(col("domain"), col("tokens"), col("target_ppm"),
        expr(s"(tt * $budgetPpmOfTotal) div 1000000").as("budget"))
    var alloc = budget.withColumn("alloc", lit(0L)).sanitizedCheckpoint()
    for (round <- 1 to rounds) {
      val scal = alloc.agg(
        sum(when(col("alloc") < col("tokens"), col("target_ppm"))
          .otherwise(0L)).as("tw"),
        (max(col("budget")) - sum(col("alloc"))).as("r"))
      // round 1 divides by 10⁶ (absolute ppm, ≡ base API); later
      // rounds divide by the live unfilled-target sum (water-fill)
      val grant =
        if (round == 1) expr("(target_ppm * r) div 1000000")
        else expr("(target_ppm * r) div tw")
      alloc = alloc.crossJoin(scal) // 1-row scalars
        .select(col("domain"), col("tokens"), col("target_ppm"),
          col("budget"),
          least(col("tokens"), col("alloc") +
            when(col("alloc") < col("tokens") && col("tw") > 0, grant)
              .otherwise(0L))
            .as("alloc"))
        .sanitizedCheckpoint()
    }
    alloc.select(col("domain"), col("tokens"), col("target_ppm"),
      col("alloc").as("alloc_tokens"),
      expr("(1000000 * alloc) div tokens").as("accept_ppm"))
  }

  def tokenBudgetAllocation(df: DataFrame, domainCol: Column,
                            tokens: Column, targets: Seq[(String, Long)],
                            budgetPpmOfTotal: Long): DataFrame = {
    require(budgetPpmOfTotal >= 0 && budgetPpmOfTotal <= 1000000L)
    val spark = df.sparkSession
    import spark.implicits._
    val perDomain = df
      .select(domainCol.as("domain"), tokens.as("tk"))
      .groupBy(col("domain")).agg(sum(col("tk")).as("tokens"))
      // a domain with zero tokens has no acceptance rate to report
      // (and would divide by zero below)
      .where(col("tokens") > 0)
      // |domains| rows feed BOTH the total and the plan join —
      // materialize once so the corpus is scanned a single time
      .sanitizedCheckpoint()
    val total = perDomain.agg(sum(col("tokens")).as("total_tokens"))
    val tgt = broadcast(targets.toDF("domain", "target_ppm"))
    perDomain
      .join(tgt, Seq("domain"))
      .crossJoin(total) // 1-row scalar
      .select(col("domain"), col("tokens"), col("target_ppm"),
        expr(s"(total_tokens * $budgetPpmOfTotal) div 1000000")
          .as("budget"))
      .select(col("domain"), col("tokens"), col("target_ppm"),
        least(col("tokens"), expr("(target_ppm * budget) div 1000000"))
          .as("alloc_tokens"),
        expr("(target_ppm * budget) div 1000000").as("want"))
      .select(col("domain"), col("tokens"), col("target_ppm"),
        col("alloc_tokens"),
        expr("(1000000 * alloc_tokens) div tokens").as("accept_ppm"),
        (col("want") - col("alloc_tokens")).as("shortfall"))
  }
}
