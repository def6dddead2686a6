package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass structural profile of an undirected graph — the graph
  * twin of the table profiler (`validate/Drift`-style numeric
  * profiles): node/edge counts, the degree range, and degree
  * assortativity (Newman, "Assortative mixing in networks", PRL 2002)
  * — whether hubs attach to hubs (r>0) or to leaves (r<0), the one
  * scalar that predicts how a graph algorithm's skew will behave
  * before you run it (a disassortative hub-and-spoke graph salts
  * differently than an assortative core).
  *
  * Assortativity is the Pearson correlation of the degree pairs over
  * directed edge endpoints: with M = 2m endpoint pairs,
  * r = (M·Σxy − Σx·Σy) / (M·Σx² − (Σx)²) — for the symmetric pair
  * set Σx = Σy and Σx² = Σy², so numerator and denominator are plain
  * INTEGER sufficient statistics. They are summed in DECIMAL(38,0)
  * (a 10⁹-edge graph with 10⁶-degree hubs overflows a long) and the
  * ratio is emitted in exact ppm floor arithmetic — engine-exact,
  * unlike any float correlation.
  *
  * Scale shape: one degree aggregation, one edges⋈degrees join per
  * endpoint, one global 1-row aggregate. No windows, no iteration.
  */
object GraphStats {

  /** (n_nodes, n_edges, deg_min, deg_max, assortativity_ppm) — one
    * row. Self-loops dropped, duplicate/reversed edges collapsed.
    * Degenerate regular graphs (zero denominator: every endpoint
    * degree equal) report assortativity_ppm = 0.
    */
  def degreeProfile(edges: DataFrame, srcCol: String,
                    dstCol: String): DataFrame = {
    val e = edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
      .persist() // feeds the degree agg and the endpoint join
    val sym = e.select(explode(array(
        struct(col("u").as("n"), col("v").as("m")),
        struct(col("v").as("n"), col("u").as("m")))).as("p"))
      .select(col("p.n").as("n"), col("p.m").as("m"))
    val deg = sym.groupBy(col("n")).agg(count(lit(1)).as("dg"))
    // every directed endpoint pair (x=deg(n), y=deg(m)); the decimal
    // casts keep Σxy / Σx² exact far past long range
    val pairs = sym
      .join(deg.select(col("n"), col("dg").as("dx")), Seq("n"))
      .join(deg.select(col("n").as("m"), col("dg").as("dy")), Seq("m"))
    pairs.agg(
        count(lit(1)).as("mm"), // = 2·n_edges
        min(col("dx")).as("deg_min"), max(col("dx")).as("deg_max"),
        sum(col("dx").cast("decimal(38,0)")).as("sx"),
        // cast a FACTOR, not the long product — dx·dy overflows a
        // long before the cast would see it
        sum(col("dx").cast("decimal(38,0)") * col("dy")).as("sxy"),
        sum(col("dx").cast("decimal(38,0)") * col("dx")).as("sxx"))
      .select(
        col("mm"), col("deg_min"), col("deg_max"),
        expr("mm * sxy - sx * sx").as("num"),
        expr("mm * sxx - sx * sx").as("den"))
      .select(
        expr("cast(mm div 2 as bigint)").as("n_edges"),
        col("deg_min"), col("deg_max"),
        expr("case when den = 0 then 0L else " +
          "cast((1000000 * num) div den as bigint) end")
          .as("assortativity_ppm"))
      .crossJoin(deg.agg(count(lit(1)).as("n_nodes")))
      .select(col("n_nodes"), col("n_edges"), col("deg_min"),
        col("deg_max"), col("assortativity_ppm"))
  }
}
