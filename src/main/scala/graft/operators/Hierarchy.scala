package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Converge.SanitizedCheckpoint

/** Ancestor closure of a parent-pointer hierarchy — the `WITH
  * RECURSIVE` query Spark SQL doesn't have, shaped for scale: org
  * charts, category trees, bill-of-materials, reply threads.
  *
  * A recursive CTE walks one level per iteration — O(depth) joins,
  * each shuffling the full frontier. This is iterative PATH DOUBLING:
  * each round joins the closure-so-far with ITSELF (`a.anc = b.node`,
  * depths add), so reachable distance doubles per round and a
  * depth-d hierarchy closes in ⌈log₂ d⌉ joins. Every round
  * `localCheckpoint`s (truncates the growing lineage, same discipline
  * as [[graft.graph.PageRank]]) and convergence is exact: the closure
  * only grows, so an unchanged row count IS the fixed point.
  *
  * `min(depth)` collapses the duplicate derivations doubling creates
  * (k-step + j-step of the same pair); on a tree the path is unique,
  * on a DAG this returns the SHORTEST ancestor distance.
  */
object Hierarchy {

  /** (node, anc, depth) for every ancestor of every node. `edges` is
    * one (child, parent) row per parent pointer; roots simply never
    * appear as children. Cyclic input still converges (the min-depth
    * pair set is finite) and surfaces as `node == anc` rows — filter
    * for them to DETECT corrupt hierarchies. `maxRounds` bounds
    * pathological depth (reach 2^maxRounds) and fails fast rather
    * than looping. */
  def ancestorClosure(edges: DataFrame, childCol: String,
                      parentCol: String, maxRounds: Int = 40): DataFrame = {
    var reach = edges.select(col(childCol).as("node"),
        col(parentCol).as("anc"), lit(1L).as("depth"))
      .sanitizedCheckpoint()
    var n = reach.count()
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      round += 1
      val stepped = reach.alias("a")
        .join(reach.alias("b"), col("a.anc") === col("b.node"))
        .select(col("a.node").as("node"), col("b.anc").as("anc"),
          (col("a.depth") + col("b.depth")).as("depth"))
      val next = reach.unionByName(stepped)
        .groupBy(col("node"), col("anc"))
        .agg(min(col("depth")).as("depth"))
        .sanitizedCheckpoint()
      val m = next.count()
      converged = m == n
      n = m
      reach = next
    }
    if (!converged) throw new IllegalStateException(
      s"ancestorClosure did not converge in $maxRounds doubling rounds " +
        "(reach 2^" + maxRounds + ") — cyclic input?")
    reach
  }
}
