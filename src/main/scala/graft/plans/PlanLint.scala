package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Plan lint: the scale-safety checks this repo asserts ad hoc in
  * PlanSpec, as a reusable API — run it in CI (or a notebook) against
  * any DataFrame BEFORE pointing the query at 100 TB. Each finding is
  * a plan shape that works at test scale and detonates at cluster
  * scale:
  *
  *  - `CARTESIAN` / `NESTED_LOOP`: O(|L|·|R|) row comparisons — a
  *    missing join key or a non-equi predicate Catalyst couldn't hash
  *    (see RangeJoin/AsOfJoin for the bucketized alternatives);
  *  - `GLOBAL_WINDOW`: a window with no PARTITION BY collapses every
  *    row into ONE task (acceptable only over provably bounded
  *    relations — dim tables, bucket summaries);
  *  - `SINGLE_PARTITION_EXCHANGE`: a shuffle into one partition
  *    (global sort/limit shapes on what may be the full relation);
  *  - `UNPUSHED_SCAN_FILTER`: a parquet/ORC scan with data filters
  *    that pushed nothing down — usually a cast or function wrapped
  *    around the filtered column defeating the pushdown.
  *
  * Findings are STRINGS naming the node, not booleans, so a CI
  * assertion failure says what to fix. A finding is advisory — the
  * caller knows whether the windowed relation is truly bounded; the
  * point is that every such plan is a DECISION, not an accident.
  */
object PlanLint {

  def check(df: DataFrame): Seq[String] = {
    val top = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    collectFindings(top)
  }

  private def collectFindings(plan: SparkPlan): Seq[String] =
    plan.collect {
      case j: CartesianProductExec =>
        Seq(s"CARTESIAN: ${j.nodeName} — O(L*R); bucketize or add an equi-key")
      case j: BroadcastNestedLoopJoinExec
          if !boundedSide(j.left) && !boundedSide(j.right) =>
        // a nested loop against a PROVABLY ≤1-row / driver-local side
        // is the scalar-broadcast pattern (stats fences, bounds,
        // coefficients) — map-side O(n), correct at any scale. Flag
        // only when neither side is bounded by construction.
        Seq(s"NESTED_LOOP: ${j.nodeName} (${j.joinType}) — non-equi join; " +
          "see RangeJoin/AsOfJoin/BloomJoin for scale-safe shapes")
      case w: WindowExec if w.partitionSpec.isEmpty =>
        Seq("GLOBAL_WINDOW: window with no PARTITION BY — single task; " +
          "acceptable only over bounded relations")
      case e: ShuffleExchangeExec if e.outputPartitioning.numPartitions == 1 =>
        Seq("SINGLE_PARTITION_EXCHANGE: shuffle into one partition")
      case s: FileSourceScanExec if unpushed(s) =>
        Seq(s"UNPUSHED_SCAN_FILTER: scan of ${s.metadata.getOrElse("Location", "?")}" +
          s" filters ${s.dataFilters.mkString(", ")} but pushed nothing " +
          "beyond null guards — check for casts/functions around the " +
          "filtered column")
    }.flatten

  /** A join side bounded BY CONSTRUCTION: walking through row-
    * preserving/row-reducing wrappers (exchange, codegen, project,
    * filter), the producer is either a global aggregate (exactly one
    * row) or a driver-local literal relation. */
  private def boundedSide(p: SparkPlan): Boolean = {
    import org.apache.spark.sql.execution._
    import org.apache.spark.sql.execution.aggregate._
    import org.apache.spark.sql.execution.exchange._
    def strip(n: SparkPlan): SparkPlan = n match {
      case e: BroadcastExchangeExec => strip(e.child)
      case e: ShuffleExchangeExec => strip(e.child)
      case e: ReusedExchangeExec => e // opaque: treat as its own node
      case w: WholeStageCodegenExec => strip(w.child)
      case i: InputAdapter => strip(i.child)
      case pr: ProjectExec => strip(pr.child)
      case f: FilterExec => strip(f.child)
      case c: ColumnarToRowExec => strip(c.child)
      case other => other
    }
    strip(p) match {
      case h: HashAggregateExec => h.groupingExpressions.isEmpty
      case h: ObjectHashAggregateExec => h.groupingExpressions.isEmpty
      case h: SortAggregateExec => h.groupingExpressions.isEmpty
      case _: LocalTableScanExec => true
      // a small global limit caps the side no matter what feeds it —
      // the probe-row pattern (filter + limit(1) before a cross)
      case l: GlobalLimitExec => l.limit <= 1000
      case t: TakeOrderedAndProjectExec => t.limit <= 1000
      case _ => false
    }
  }

  /** Real (non-null-guard) data filters exist, but nothing beyond
    * IsNotNull guards reached the source — the predicate shape
    * defeated pushdown. */
  private def unpushed(s: FileSourceScanExec): Boolean = {
    val realFilters = s.dataFilters.filterNot(
      _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.IsNotNull])
    val pushedReal = s.metadata.get("PushedFilters").toSeq
      .flatMap(_.stripPrefix("[").stripSuffix("]").split(",").map(_.trim))
      .filter(p => p.nonEmpty && !p.startsWith("IsNotNull"))
    realFilters.nonEmpty && pushedReal.isEmpty
  }
}
