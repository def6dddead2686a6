package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-step funnel analysis: for each user, the earliest event
  * chain achieving step1 < step2 < … (strictly increasing event time),
  * greedy from the front — the standard conversion-funnel semantics
  * (first view, first click AFTER that view, first purchase AFTER that
  * click). Returns one row per user who reached step 1, with each
  * step's achieved timestamp and the depth reached.
  *
  * Shape: k−1 cascaded (equi-join on user → min-aggregate) stages, one
  * per step — NO window sort over the full event stream and no
  * per-user iterator (`mapGroups`) that would fall out of codegen.
  * Every stage shuffles by the SAME user key, so at scale the stages
  * co-partition: the per-step frames are tiny (one row per converting
  * user — monotonically shrinking down the funnel) and broadcast-able
  * against the events scan, which stays column-pruned to
  * (user, type, ts). Funnels are step-bounded (k ≤ ~6), so the
  * cascade depth is a small constant, not a data-dependent loop. */
object Funnel {

  /** @return columns: user col, `t_<step>` epoch value per step
    *         (null once the chain breaks), `depth` = steps reached. */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
             tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val slim = events.select(col(userCol).as("u"),
      col(typeCol).as("tpe"), col(tsCol).as("ts"))
    def tName(s: String) = s"t_$s"
    var acc = slim.where(col("tpe") === steps.head)
      .groupBy(col("u")).agg(min(col("ts")).as(tName(steps.head)))
    steps.sliding(2).foreach {
      case Seq(prev, step) =>
        val nxt = slim.where(col("tpe") === step)
          .select(col("u").as("u2"), col("ts"))
        val keep = acc.columns.toIndexedSeq.map(col)
        acc = acc.join(nxt,
            col("u") === col("u2") && col("ts") > col(tName(prev)), "left")
          .groupBy(keep: _*)
          .agg(min(col("ts")).as(tName(step)))
      case _ => () // single-step funnel
    }
    val depth = steps.map(s => when(col(tName(s)).isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    acc.select(col("u").as(userCol) +: steps.map(s => col(tName(s))) :+
      depth.as("depth"): _*)
  }
}
