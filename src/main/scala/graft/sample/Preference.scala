package graft.sample

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Converge.SanitizedCheckpoint

/** Bradley-Terry preference ranking in EXACT fixed-point arithmetic —
  * the pairwise-comparison scorer of an RLHF / preference-data
  * pipeline: given game rows (winner, loser), fit strength scores
  * `s_i` such that `P(i beats j) = s_i / (s_i + s_j)`, via the
  * classic minorize-maximize update
  * `s_i ← W_i / Σ_j n_ij / (s_i + s_j)` run for a fixed iteration
  * count. All arithmetic is integer (parts-per-million scores, 10¹²
  * scaling on the inner division, floor division throughout), so the
  * result is bit-identical regardless of partitioning, reduction
  * order, or engine — the same fixed-point trick as
  * [[graft.graph.PageRank]], because an iterative float fit can never
  * hash-match an independent serial engine.
  *
  * Scale shape: games collapse to one matchup row per ordered item
  * pair FIRST (map-side-combined groupBy), so every iteration runs
  * over matchups, not raw games; each round is two equi-joins of the
  * matchup table against the one-row-per-item score table (AQE
  * broadcasts the small score side) and one groupBy(i) sum. Item
  * count is vocabulary-sized, matchup count at most its square —
  * both tiny next to the game log that produced them.
  *
  * Items with zero total wins pin to score 0 (the MM fixed point as
  * the update is written); two zero-win items can never share a
  * matchup (someone won those games), so the `s_i + s_j` denominator
  * never hits zero.
  */
object Preference {
  val Scale = 1000000L      // 1.0 in ppm fixed point
  val InnerScale = 1000000000000L // 10¹² — keeps the inner division exact

  /** @param matches one row per decided game
    * @return (item, n_games, n_wins, s_ppm): total games played, games
    *         won, and the Bradley-Terry strength in ppm after `iters`
    *         MM rounds from a uniform start */
  def bradleyTerry(matches: DataFrame, winnerCol: String, loserCol: String,
                   iters: Int): DataFrame = {
    require(iters >= 1, "iters must be at least 1")
    val g = matches
      .select(col(winnerCol).as("w"), col(loserCol).as("l"))
      .groupBy(col("w"), col("l")).agg(count(lit(1)).as("c"))
    // symmetric matchup table: (i, j, wins of i over j, games i vs j).
    // persisted: every MM round joins it twice.
    val m = g.select(col("w").as("i"), col("l").as("j"),
        col("c").as("wv"), col("c").as("nv"))
      .unionByName(g.select(col("l").as("i"), col("w").as("j"),
        lit(0L).as("wv"), col("c").as("nv")))
      .groupBy(col("i"), col("j"))
      .agg(sum(col("wv")).as("w_ij"), sum(col("nv")).as("n_ij"))
      .persist()
    m.count()
    val wins = m.groupBy(col("i"))
      .agg(sum(col("w_ij")).as("W"), sum(col("n_ij")).as("n_games"))
      .persist()
    var s = wins.select(col("i"), lit(Scale).as("s_ppm"))
    for (_ <- 1 to iters) {
      val denom = m
        .join(s.select(col("i"), col("s_ppm").as("s_i")), Seq("i"))
        .join(s.select(col("i").as("j"), col("s_ppm").as("s_j")), Seq("j"))
        .groupBy(col("i"))
        .agg(sum(expr(s"(n_ij * ${InnerScale}L) div (s_i + s_j)")).as("denom"))
      s = wins.join(denom, Seq("i"))
        .select(col("i"), expr(s"(W * ${InnerScale}L) div denom").as("s_ppm"))
    }
    val out = wins.join(s, Seq("i"))
      .select(col("i").as("item"), col("n_games"), col("W").as("n_wins"),
        col("s_ppm"))
      .sanitizedCheckpoint()
    m.unpersist()
    wins.unpersist()
    out
  }

  /** Wilson-lower-bound win rates — the uncertainty-aware companion
    * to [[bradleyTerry]]: an item with 2/2 wins must NOT outrank one
    * with 90/100, and the Wilson score interval's lower bound is the
    * standard fix. Two map-side-combined groupBys and one item-keyed
    * outer join; the bound itself is one closed-form expression
    * (written with the identical operation order as the SQL oracle
    * and rounded to 6 decimals — the float-output discipline every
    * ratio column in this repo follows). Returns (item, n_games,
    * n_wins, wilson_lb). */
  def winRates(matches: DataFrame, winnerCol: String, loserCol: String)
      : DataFrame = {
    val w = matches.groupBy(col(winnerCol).as("item"))
      .agg(count(lit(1)).as("n_wins"))
    val l = matches.groupBy(col(loserCol).as("item"))
      .agg(count(lit(1)).as("n_losses"))
    w.join(l, Seq("item"), "full")
      .select(col("item"),
        (coalesce(col("n_wins"), lit(0L)) +
          coalesce(col("n_losses"), lit(0L))).as("n_games"),
        coalesce(col("n_wins"), lit(0L)).as("n_wins"))
      .withColumn("phat",
        col("n_wins").cast("double") / col("n_games"))
      .select(col("item"), col("n_games"), col("n_wins"),
        expr("round((phat + 1.96*1.96/(2*n_games) - 1.96 * " +
          "sqrt(phat*(1-phat)/n_games + 1.96*1.96/(4*n_games*n_games)))" +
          " / (1 + 1.96*1.96/n_games), 6)").as("wilson_lb"))
  }
}
