package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hierarchy flattening: a parent-pointer relation `(node, parent)` —
  * org charts, category trees, thread replies, filesystem paths —
  * resolved to `(node, root, depth)` for every node. The SQL-native
  * answer is a recursive CTE that walks ONE level per round:
  * O(tree height) self-joins.
  *
  * This operator uses POINTER DOUBLING instead: the state relation
  * maps each node to its currently-known d-step ancestor, and each
  * round substitutes that ancestor's own known ancestor — the lookup
  * distance doubles per round (1, 2, 4, 8…), so a height-h forest
  * settles in ⌈log₂ h⌉ rounds: a depth-10⁶ chain costs ~20 joins,
  * not a million. Each round is ONE equi-join of node-sized relations
  * (tiny next to the fact data that hangs off a hierarchy) plus
  * map-side arithmetic; per-round `localCheckpoint` truncates lineage
  * so the iterated plan can't snowball — the `Dedup.dupClusters`
  * idiom.
  *
  * State invariant: `(node, anc, d, done)` — `anc` is an ancestor
  * exactly `d` edges up; once the walk has reached its root, `done`
  * is true and `anc` IS the root (roots start done, pointing at
  * themselves at depth 0). Self-parents are normalized to roots.
  * Nodes still unfinished after `maxRounds` (a pointer cycle, or
  * height > 2^maxRounds) come back with NULL root and depth —
  * corrupt-pointer rows surface instead of hanging the job.
  */
object Hierarchy {

  /** @param nodes     (idCol, parentCol) relation, one row per node;
    *                   NULL (or self) parent marks a root
    * @param maxRounds doubling rounds; resolves heights ≤ 2^maxRounds
    */
  def rootAndDepth(nodes: DataFrame, idCol: String, parentCol: String,
      maxRounds: Int = 20): DataFrame = {
    require(maxRounds >= 1 && maxRounds <= 40, "maxRounds in [1, 40]")
    val isRoot = col(parentCol).isNull || col(parentCol) === col(idCol)
    var state = nodes.select(
        col(idCol).as("node"),
        when(isRoot, col(idCol)).otherwise(col(parentCol)).as("anc"),
        when(isRoot, lit(0L)).otherwise(lit(1L)).as("d"),
        isRoot.as("done"))
      .localCheckpoint(true)

    var round = 0
    var remaining = state.filter(!col("done")).count()
    while (round < maxRounds && remaining > 0) {
      val jump = state.select(col("node").as("j_node"),
        col("anc").as("j_anc"), col("d").as("j_d"), col("done").as("j_done"))
      state = state.alias("s")
        .join(jump, col("s.anc") === col("j_node") && !col("s.done"), "left")
        .select(col("s.node").as("node"),
          when(col("s.done"), col("s.anc"))
            .otherwise(coalesce(col("j_anc"), col("s.anc"))).as("anc"),
          when(col("s.done"), col("s.d"))
            .otherwise(col("s.d") + coalesce(col("j_d"), lit(0L))).as("d"),
          (col("s.done") || coalesce(col("j_done"), lit(false))).as("done"))
        .localCheckpoint(true)
      remaining = state.filter(!col("done")).count()
      round += 1
    }

    state.select(col("node"),
      when(col("done"), col("anc")).as("root"),
      when(col("done"), col("d")).as("depth"))
  }
}
