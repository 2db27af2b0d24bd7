package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Single-source BFS hop distances over an (optionally directed) edge
  * list — reachability + degrees-of-separation, completing the graph
  * family (PageRank = centrality, Triangles = density,
  * `Dedup.dupClusters` = components, [[Hierarchy]] = forests).
  *
  * Frontier iteration: each round joins the CURRENT FRONTIER (nodes
  * first reached last round — frontier-sized, usually a sliver of the
  * graph) against the edge list and keeps newly reached nodes via a
  * LEFT ANTI join on the visited set. Rounds = graph diameter; each
  * round shuffles O(frontier-adjacent edges), and `localCheckpoint`
  * truncates the iterated lineage (the [[Hierarchy]]/`dupClusters`
  * idiom). Spark's own GraphX Pregel does the same dance on RDDs;
  * this stays in DataFrames so AQE/broadcast kick in when frontiers
  * are small.
  *
  * Nodes unreachable within `maxHops` are absent from the output
  * (standard BFS contract). Undirected graphs: pass the edges both
  * ways (`union(edges.select(dst, src))`).
  */
object Bfs {

  def hops(edges: DataFrame, srcCol: String, dstCol: String,
      source: Any, maxHops: Int = 20): DataFrame = {
    require(maxHops >= 1 && maxHops <= 64, "maxHops in [1, 64]")
    val e = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull)
      .select(col(srcCol).as("s"), col(dstCol).as("d")).distinct()
    var visited = e.sparkSession
      .createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("node",
            e.schema("s").dataType),
          org.apache.spark.sql.types.StructField("hops",
            org.apache.spark.sql.types.LongType))))
      .unionByName(e.sparkSession.range(1)
        .select(lit(source).cast(e.schema("s").dataType).as("node"),
          lit(0L).as("hops")))
      .localCheckpoint(true)
    var frontier = visited
    var round = 0
    while (round < maxHops && !frontier.isEmpty) {
      val next = frontier.join(e, col("node") === col("s"))
        .select(col("d").as("node"))
        .distinct()
        .join(visited.select("node"), Seq("node"), "left_anti")
        .select(col("node"), lit(round + 1L).as("hops"))
        .localCheckpoint(true)
      visited = visited.unionByName(next).localCheckpoint(true)
      frontier = next
      round += 1
    }
    visited
  }
}
