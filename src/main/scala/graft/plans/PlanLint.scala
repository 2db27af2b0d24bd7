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

  /** Data-aware skew advisory — the wiring between the static lint
    * above and [[graft.etl.SkewProfile.keyStats]]: walk the OPTIMIZED
    * logical plan for equi-joins that will shuffle (neither side under
    * the broadcast threshold by Catalyst's own size estimate), then
    * MEASURE each side's join-key distribution and, where one key
    * value owns more than `hotShare` of the rows, emit a finding that
    * names the key, the hot value, its share, and the
    * [[graft.operators.SaltedJoin]] rewrite with a computed bucket
    * count (≈ the number of reducers the hot key's rows should spread
    * over: top1_share × shuffle partitions).
    *
    * This EXECUTES one aggregation + one top-1 probe per join side —
    * it is a pre-flight/CI tool like [[check]], not something to call
    * inside a production query. The measurement is exact (the same
    * one-shuffle keyStats relation a skew investigation would run by
    * hand); at corpus scale point it at a sample of the input.
    *
    * @param broadcastThreshold bytes under which a side is assumed to
    *        broadcast (no shuffle, skew irrelevant); None = read
    *        `spark.sql.autoBroadcastJoinThreshold` from the session.
    */
  def adviseSkew(df: DataFrame, hotShare: Double = 0.3,
      minRows: Long = 10000L,
      broadcastThreshold: Option[Long] = None): Seq[String] = {
    import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualTo, Expression}
    import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
    import org.apache.spark.sql.functions._
    val spark = df.sparkSession
    val bcThr = broadcastThreshold.getOrElse(
      org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
          .replaceAll("(?i)b$", "")))
    val shuffleParts = spark.conf
      .get("spark.sql.shuffle.partitions", "200").toInt
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    val plan = df.queryExecution.optimizedPlan
    plan.collect {
      case j: Join =>
        val keyPairs = j.condition.toSeq.flatMap(conjuncts).collect {
          case EqualTo(a: Attribute, b: Attribute)
              if j.left.outputSet.contains(a) && j.right.outputSet.contains(b) =>
            (a, b)
          case EqualTo(a: Attribute, b: Attribute)
              if j.left.outputSet.contains(b) && j.right.outputSet.contains(a) =>
            (b, a)
        }
        if (keyPairs.isEmpty) Seq.empty[String]
        else {
          def sideFindings(side: LogicalPlan, keys: Seq[Attribute],
              label: String): Seq[String] = {
            if (side.stats.sizeInBytes <= bcThr) Seq.empty
            else {
              val sideDf = org.apache.spark.sql.graft.Bridge
                .ofRows(spark, side)
              // address keys by ATTRIBUTE, not name — self-join plans
              // can carry two same-named attributes on one side
              val keyed = sideDf.select(struct(keys.map(a =>
                org.apache.spark.sql.graft.Bridge.column(a)): _*).as("__k"))
              val stats = graft.etl.SkewProfile.keyStats(keyed, "__k").head()
              val nRows = stats.getAs[Long]("n_rows")
              val share = stats.getAs[Double]("top1_share")
              if (nRows < minRows || share < hotShare) Seq.empty
              else {
                val hot = keyed.groupBy(col("__k"))
                  .agg(count(lit(1)).as("cnt"))
                  .orderBy(col("cnt").desc).limit(1).head()
                val hotVal = hot.getStruct(0).mkString(", ")
                val buckets = math.max(2,
                  math.ceil(share * shuffleParts).toInt)
                val keyNames = keys.map(_.name).mkString(", ")
                Seq(f"SKEWED_JOIN_KEY: ($keyNames) on the $label side of a " +
                  f"${j.joinType.sql} join — value $hotVal owns " +
                  f"${share * 100}%.1f%% of $nRows%d rows " +
                  f"(skew ${stats.getAs[Double]("skew")}%.1fx): one reducer " +
                  "becomes the stage's critical path. Rewrite with " +
                  s"graft.operators.SaltedJoin.join(big, other, " +
                  s"""Seq("$keyNames"), buckets = $buckets) — or rely on """ +
                  "AQE skew split for moderate skew.")
              }
            }
          }
          sideFindings(j.left, keyPairs.map(_._1), "left") ++
            sideFindings(j.right, keyPairs.map(_._2), "right")
        }
    }.flatten
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
