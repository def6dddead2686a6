package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Coreness (k-core decomposition) via iterated neighborhood
  * h-indices — the distributed-friendly formulation of Lü et al.,
  * "The H-index of a network node and its relation to degree and
  * coreness" (Nature Communications 7:10168, 2016): start every node
  * at its degree and repeatedly replace each node's value with the
  * h-index of its neighbors' current values (the largest h such that
  * at least h neighbors have value ≥ h). The sequence is
  * non-increasing and converges exactly to the node's coreness.
  *
  * Why this shape and not sequential peeling: the textbook k-core
  * peel (repeatedly delete min-degree nodes) is inherently
  * sequential — each deletion changes the next decision — while the
  * h-index iteration is a pure per-node recomputation from neighbor
  * state, i.e. one equi-join plus one per-node aggregation per round,
  * exactly the PageRank communication pattern. All arithmetic is
  * integer, so a fixed round count is bit-reproducible across
  * engines and partitionings (the DuckDB oracle unrolls the same
  * rounds).
  *
  * Scale design: per round, the value table (one row per node) joins
  * the symmetrized edge table on the neighbor key and the h-index is
  * computed with a per-node row_number window over neighbor values —
  * state is O(nodes), shuffle is O(edges) partitioned by node. A hub
  * node concentrates its neighbor rows in one partition (same skew
  * profile as any per-node neighborhood aggregate); the h-index
  * itself is capped by degree, so values only shrink. Rounds are
  * capped at a small constant with a signature-confirmed early stop:
  * a round is a pure function of the value table, so an unchanged
  * table ends the loop with output identical to the full unroll
  * (h-index convergence is fast in practice — diameter-bounded, a
  * handful of rounds on social graphs). Plan depth is bounded by
  * localCheckpoint per round (same discipline as LabelProp/Dedup
  * iteration), with the signature riding the checkpoint's own job.
  */
object KCore {

  /** Iterated-h-index coreness estimate after `rounds` rounds over an
    * undirected edge list (self-loops dropped, duplicate/reversed
    * edges collapsed). Round 0 is the degree; each further round
    * applies the neighborhood h-index once. Values are exact
    * integers: after enough rounds the value IS the coreness, and at
    * any fixed round count the output is deterministic and
    * engine-reproducible.
    *
    * @return (node_id, coreness) for every node incident to ≥1 edge
    */
  def corenessHIndex(edges: DataFrame, srcCol: String, dstCol: String,
                     rounds: Int): DataFrame = {
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    // canonicalize (dedup + drop self-loops), then symmetrize so each
    // node sees its full neighborhood under one groupBy key
    val e = edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
    val sym = e.select(explode(array(
        struct(col("u").as("n"), col("v").as("m")),
        struct(col("v").as("n"), col("u").as("m")))).as("p"))
      .select(col("p.n").as("n"), col("p.m").as("m"))
      .persist()
    sym.count() // materialize once; every round joins against it
    var (vals, sig) = graft.operators.Converge.checkpointWithSig(
      sym.groupBy(col("n")).agg(count(lit(1)).as("val")), "n, val")
    val byNode = Window.partitionBy(col("n"))
      .orderBy(col("nv").desc, col("m"))
    var round = 0
    var done = false
    while (!done && round < rounds) {
      round += 1
      // h = max_i min(v_i, i) over neighbor values sorted descending;
      // the tie order among equal values cannot change the max, the
      // (m) tie-break just keeps the intermediate frame deterministic
      val relaxed = sym
        .join(vals.select(col("n").as("m"), col("val").as("nv")), Seq("m"))
        .withColumn("rn", row_number().over(byNode).cast("long"))
        .groupBy(col("n"))
        .agg(max(least(col("nv"), col("rn"))).as("val"))
      // per-round checkpoint as before, with the convergence signature
      // riding the SAME materializing job (Converge.observe); a round
      // is a pure function of the value table, so an unchanged table
      // (signature match, confirmed exactly once at the match) means
      // every remaining round is identity — early stop EQUALS the
      // full unroll, the weightedDistances discipline
      val (next, nSig) =
        graft.operators.Converge.checkpointWithSig(relaxed, "n, val")
      done = nSig == sig && graft.operators.Converge.sameExact(next, vals)
      sig = nSig
      vals = next
    }
    val out = vals.select(col("n").as("node_id"), col("val").as("coreness"))
      .localCheckpoint()
    sym.unpersist()
    out
  }
}
