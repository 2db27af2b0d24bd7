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

  /** CLOSURE TABLE for a parent-pointer hierarchy: every
    * (desc, anc, dist) ancestor pair, self-pairs at dist 0 included —
    * Mondrian's `<Closure>` mechanism, THE way a ragged parent-child
    * hierarchy (org chart, category tree) rolls measures up: join the
    * fact on `desc`, group by `anc`, and every manager/category gets
    * its whole-subtree total in one equi-join + one aggregate, no
    * recursion at query time.
    *
    * Built by the same pointer-doubling idiom as [[rootAndDepth]]:
    * each round joins the pair set with itself (a path of length
    * d₁ + d₂ from a d₁-path ending where a d₂-path starts), so round
    * k holds every path of length ≤ 2^k — ⌈log₂ h⌉ rounds, each ONE
    * equi-join of pair-sized relations. Pairs are deduplicated to the
    * MINIMUM distance per (desc, anc): in a tree distances are unique
    * so this is a no-op, and under a CORRUPT pointer cycle the pair
    * set saturates instead of growing unboundedly, with the cycle
    * SURFACING as a nonzero-distance self-pair beside the dist-0 one
    * (same surface-don't-hang stance as rootAndDepth's NULL rows).
    *
    * Size trade, stated: the closure holds Σ depth(node) + n rows —
    * the classic closure-table storage cost. For a 100 TB fact over a
    * million-node hierarchy that is a few-million-row dimension-side
    * relation (broadcastable); the fact is touched once. */
  def closure(nodes: DataFrame, idCol: String, parentCol: String,
      maxRounds: Int = 20): DataFrame = {
    require(maxRounds >= 1 && maxRounds <= 40, "maxRounds in [1, 40]")
    val self = nodes.select(col(idCol).as("desc"),
      col(idCol).as("anc"), lit(0L).as("dist"))
    var pairs = nodes
      .filter(col(parentCol).isNotNull && col(parentCol) =!= col(idCol))
      .select(col(idCol).as("desc"), col(parentCol).as("anc"),
        lit(1L).as("dist"))
      .localCheckpoint(true)
    var total = pairs.count()
    var round = 0
    var grew = total > 0
    // up to maxRounds GROWTH rounds plus one CONFIRMING no-growth
    // round (convergence is only provable by a round that adds
    // nothing): heights ≤ 2^maxRounds close without tripping the
    // completeness guard below
    while (round <= maxRounds && grew) {
      val doubled = pairs.alias("a")
        .join(pairs.alias("b"), col("a.anc") === col("b.desc"))
        .select(col("a.desc").as("desc"), col("b.anc").as("anc"),
          (col("a.dist") + col("b.dist")).as("dist"))
      val next = pairs.unionByName(doubled)
        .groupBy(col("desc"), col("anc"))
        .agg(min(col("dist")).as("dist"))
        .localCheckpoint(true)
      val n = next.count()
      grew = n > total
      total = n
      pairs = next
      round += 1
    }
    // a pair set still GROWING at maxRounds means heights beyond
    // 2^maxRounds remain unclosed — a silent return would undercount
    // every subtree rollup built on it, so fail loudly instead (the
    // closure has no per-row NULL slot to surface partial rows the way
    // rootAndDepth does)
    require(!grew,
      s"closure did not converge within $maxRounds doubling rounds " +
        s"(${total} pairs and growing) — raise maxRounds or check for " +
        "pathological pointer structure")
    self.unionByName(pairs)
  }

  /** INCREMENTAL closure maintenance under a SUBTREE MOVE — the
    * update that makes closure tables scary in practice: re-parenting
    * `node` under `newParent` invalidates every (descendant-of-node,
    * old-ancestor-above-node) pair, and a naive fix rebuilds the whole
    * table. This maintains it from the closure itself in THREE
    * dimension-sized joins, no recursion:
    *
    *  - `subtree` = descendants of `node` (closure rows anchored at
    *    `anc = node`, self included at dist 0);
    *  - DROP the crossing pairs — desc ∈ subtree, anc ∉ subtree (the
    *    old paths out of the subtree); pairs fully inside the subtree
    *    are untouched (relative distances don't change), pairs fully
    *    outside are untouched;
    *  - ADD subtree × ancestors-of-`newParent` (self included), at
    *    dist d₁ + 1 + d₂ — every new path out of the subtree goes
    *    desc →(d₁) node →(1) newParent →(d₂) anc. The ancestor set is
    *    read from the ORIGINAL closure: it cannot intersect the
    *    subtree (that would make `newParent` a descendant of `node`,
    *    rejected below), so the move doesn't perturb it.
    *
    * A CYCLE-INTRODUCING move (`newParent` inside `node`'s subtree,
    * `node` itself included) is rejected loudly — applying it would
    * corrupt every rollup downstream. Cost: the subtree relation is
    * the moved slice's size, the ancestor relation is depth-sized
    * (broadcast); at 100 TB-fact scale this is dimension maintenance
    * that never touches a fact row — the oracle for correctness is a
    * full closure rebuild over the moved parent relation
    * (q226/HierarchySpec). */
  def closureMove(closure: DataFrame, node: Any, newParent: Any): DataFrame = {
    // ONE validation pass (a serve-time path — separate limit/count
    // jobs would re-execute the closure lineage per predicate): both
    // endpoints must exist, and newParent must not sit inside node's
    // subtree (a cycle; node itself included via the dist-0 self-pair)
    val checks = closure.agg(
      sum(when(col("anc") === lit(node) &&
        col("desc") === lit(newParent), 1L).otherwise(0L)).as("cycle"),
      sum(when(col("desc") === lit(node), 1L).otherwise(0L)).as("nodeSeen"),
      sum(when(col("desc") === lit(newParent), 1L).otherwise(0L))
        .as("parentSeen")).head()
    require(Option(checks.get(1)).exists(_.asInstanceOf[Long] > 0),
      s"node $node is not in the closure")
    require(Option(checks.get(2)).exists(_.asInstanceOf[Long] > 0),
      s"new parent $newParent is not in the closure — moving under it " +
        "would silently orphan the subtree from every ancestor rollup")
    require(checks.getAs[Long]("cycle") == 0,
      s"moving $node under $newParent would create a cycle — " +
        s"$newParent is a descendant of $node")
    val sub = closure.filter(col("anc") === lit(node))
      .select(col("desc").as("s_desc"), col("dist").as("d1"))
    val outside = closure
      .join(sub.select(col("s_desc").as("desc")), Seq("desc"), "left_anti")
    val within = closure
      .join(sub.select(col("s_desc").as("desc")), Seq("desc"), "left_semi")
      .join(sub.select(col("s_desc").as("anc")), Seq("anc"), "left_semi")
      .select(col("desc"), col("anc"), col("dist"))
    val newAncs = closure.filter(col("desc") === lit(newParent))
      .select(col("anc"), col("dist").as("d2"))
    val added = sub.crossJoin(
        org.apache.spark.sql.functions.broadcast(newAncs))
      .select(col("s_desc").as("desc"), col("anc"),
        (col("d1") + lit(1L) + col("d2")).as("dist"))
    // lazily checkpointed: maintenance ops CHAIN (move -> insert ->
    // delete is the q227 lifecycle) and each op's validation aggregate
    // plus the caller's final consumer would otherwise RE-EXECUTE every
    // predecessor's join chain once per action (profiled r16: 78 jobs
    // on the chained lifecycle). The first consumer materializes the
    // result once; later consumers read the blocks. Values unchanged.
    //
    // CLUSTER TRADE (r17, the canonical note for every
    // localCheckpoint(false) site in this repo): a local checkpoint
    // truncates lineage to UNREPLICATED executor-local blocks — on a
    // real cluster, losing an executor after materialization fails
    // every downstream consumer instead of recomputing, and the blocks
    // stay pinned until the frame is GC'd. Acceptable here because (a)
    // the closure relation is O(nodes × depth) — hierarchy-sized, not
    // fact-sized; (b) maintenance chains are short-lived batch jobs a
    // retry re-runs from the stored closure; (c) the alternative
    // (reliable checkpoint / parquet scratch) pays a distributed-FS
    // write per op on the serving path. Long-lived serving sessions
    // that must survive executor loss should persist the returned
    // frame to durable storage instead of holding it.
    outside.unionByName(within).unionByName(added).localCheckpoint(false)
  }

  /** INCREMENTAL closure maintenance under a LEAF INSERT: the new
    * node's pairs are its dist-0 self-pair plus (node, anc-of-parent,
    * 1 + d) for every ancestor of `parent` (self included) — one
    * depth-sized read of the existing closure, nothing else changes
    * (no existing node gains or loses an ancestor). `parent = null`
    * inserts a new root (self-pair only). The node must be NEW —
    * inserting an existing id would silently duplicate its pair set
    * and double every rollup it feeds, so it is rejected loudly, as
    * is an unknown parent (the [[closureMove]] orphan argument).
    * Subtree inserts compose: insert parents before children. */
  def closureInsert(closure: DataFrame, node: Any, parent: Any): DataFrame = {
    val checks = closure.agg(
      sum(when(col("desc") === lit(node), 1L).otherwise(0L)).as("nodeSeen"),
      sum(when(col("desc") === lit(parent), 1L).otherwise(0L))
        .as("parentSeen")).head()
    require(!Option(checks.get(0)).exists(_.asInstanceOf[Long] > 0),
      s"node $node is already in the closure — re-inserting it would " +
        "double-count every rollup above it")
    require(parent == null ||
      Option(checks.get(1)).exists(_.asInstanceOf[Long] > 0),
      s"parent $parent is not in the closure — inserting under it " +
        "would orphan the new node from every ancestor rollup")
    val spark = closure.sparkSession
    val self = spark.range(1).select(
      lit(node).cast(closure.schema("desc").dataType).as("desc"),
      lit(node).cast(closure.schema("anc").dataType).as("anc"),
      lit(0L).as("dist"))
    val up =
      if (parent == null) self.limit(0)
      else closure.filter(col("desc") === lit(parent))
        .select(lit(node).cast(closure.schema("desc").dataType).as("desc"),
          col("anc"), (col("dist") + lit(1L)).as("dist"))
    // lazy checkpoint: see closureMove's chaining note
    closure.unionByName(self).unionByName(up).localCheckpoint(false)
  }

  /** INCREMENTAL closure maintenance under a SUBTREE DELETE: every
    * pair whose DESCENDANT lies in `node`'s subtree disappears (the
    * subtree's rows are gone; self-pairs included), and no other pair
    * changes — remaining nodes had no ancestors inside the subtree
    * (ancestors of a surviving node are on its root path, which
    * cannot pass through the deleted subtree). One anti join against
    * the subtree relation. Deleting an unknown node is rejected —
    * silently returning the closure unchanged would mask a caller
    * bug. */
  def closureDelete(closure: DataFrame, node: Any): DataFrame = {
    val seen = closure.filter(col("desc") === lit(node)).limit(1).count()
    require(seen > 0, s"node $node is not in the closure")
    val sub = closure.filter(col("anc") === lit(node))
      .select(col("desc"))
    // lazy checkpoint: see closureMove's chaining note
    closure.join(sub, Seq("desc"), "left_anti").localCheckpoint(false)
  }
}
