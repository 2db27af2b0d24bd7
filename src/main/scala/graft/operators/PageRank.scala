package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weighted PageRank by fixed-iteration power method — the graph-
  * centrality member of the analytics family (transition graphs from
  * q89, citation/link graphs, entity co-occurrence). Deterministic by
  * construction (no convergence test, no RNG), which is what makes a
  * graph measure oracle-checkable cross-engine.
  *
  * Shape per iteration: ranks join edges on `src` (one shuffle — or
  * map-side if the edge list is pre-partitioned by src, the layout
  * [[graft.sources.Warehouse.writeClustered]] provides), contributions
  * aggregate on `dst` (second shuffle, map-side partial sums), then a
  * node-relation left join folds in the damping term. The rank
  * relation is node-sized — orders of magnitude smaller than the edge
  * relation at web scale — so every iteration moves O(edges) once and
  * O(nodes) twice; the unrolled 3-iteration plan never materializes
  * anything driver-side except the node count (one scalar).
  *
  * Dangling nodes (no out-edges) leak their rank mass — the
  * simplified variant common in batch implementations; ranks then
  * sum to < 1 but the ORDER is preserved for graphs whose dangling
  * mass is small. Callers needing stochastic-matrix semantics can add
  * a dangling-redistribution term per iteration (one extra scalar
  * aggregate); the oracle contract here mirrors the leak variant
  * exactly.
  */
object PageRank {

  /** @param edges     (srcCol, dstCol, weightCol) relation; parallel
    *                  edges are summed
    * @param damping   classic 0.85
    * @param iterations unrolled power steps (plan depth grows linearly)
    * @return (node, rank) — rank rounded to 6 decimals for
    *         cross-engine stability of the order-dependent double sums
    */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, damping: Double = 0.85,
      iterations: Int = 3): DataFrame = {
    require(iterations >= 1, "need at least one iteration")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
      col(weightCol).cast("double").as("w"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
    val nodes = e.select(col("src").as("v"))
      .union(e.select(col("dst").as("v"))).distinct()
    val n = nodes.count() // one driver scalar — the only collect here
    require(n > 0, "empty graph")

    // transition probability p = w / out-weight(src)
    val outW = e.groupBy(col("src")).agg(sum(col("w")).as("tot"))
    val p = e.groupBy(col("src"), col("dst")).agg(sum(col("w")).as("cw"))
      .join(outW, "src")
      .select(col("src"), col("dst"), (col("cw") / col("tot")).as("p"))

    val base = lit((1.0 - damping) / n)
    var r = nodes.withColumn("r", lit(1.0 / n))
    for (_ <- 1 to iterations) {
      val contrib = p.join(r, p("src") === r("v"))
        .groupBy(col("dst")).agg(sum(col("r") * col("p")).as("s"))
      r = nodes.join(contrib, nodes("v") === contrib("dst"), "left")
        .select(col("v"),
          (base + lit(damping) * coalesce(col("s"), lit(0.0))).as("r"))
    }
    r.select(col("v").as("node"), round(col("r"), 6).as("rank"))
  }
}
