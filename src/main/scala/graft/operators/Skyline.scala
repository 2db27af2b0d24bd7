package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._

/** Skyline (Pareto-dominance) operator: keep the rows not dominated by
  * any other row, where `a` dominates `b` iff `a ≤ b` on every
  * dimension and `a < b` on at least one (all dimensions MINIMIZED —
  * negate a column to maximize it). The classic multi-criteria
  * trade-off frontier ("cheapest AND smallest") that SQL can only
  * express as an O(n²) `NOT EXISTS` anti-join.
  *
  * Scale design: the skyline is MERGEABLE —
  * `sky(A ∪ B) = sky(sky(A) ∪ sky(B))` — so each partition first
  * reduces to its local skyline with a block-nested-loop pass
  * (O(rows × local-skyline-size), no shuffle, runs map-side on all
  * executors), and only the surviving candidates — typically a
  * vanishing fraction of the input, bounded by the true frontier of
  * each partition — are coalesced into one task for the final merge
  * pass. This is the skyline analog of TakeOrdered's per-partition
  * top-k + small merge; a raw `NOT EXISTS` self-join would be a
  * cartesian at 100 TB.
  *
  * Rows with a null in any dimension are excluded: dominance is
  * undefined on unknowns (and the SQL formulation's three-valued
  * logic would silently keep every null row). Ties (two rows equal on
  * all dimensions) are both kept — neither strictly dominates.
  */
object Skyline {

  def skyline(df: DataFrame, dims: Seq[String]): DataFrame = {
    require(dims.nonEmpty, "skyline needs at least one dimension")
    // Comparison happens on a packed array<double> so the pass is
    // type-agnostic; original columns are returned untouched. Exact
    // for integral values below 2^53.
    val packed = df
      .filter(dims.map(c => col(c).isNotNull).reduce(_ && _))
      .withColumn("__sky", array(dims.map(c => col(c).cast("double")): _*))
    val enc = Encoders.row(packed.schema)
    val vIdx = packed.schema.fieldIndex("__sky")
    val d = dims.length

    def pass(it: Iterator[Row]): Iterator[Row] = {
      val kept = ArrayBuffer.empty[(Array[Double], Row)]
      it.foreach { row =>
        val v = row.getSeq[Double](vIdx).toArray
        var dominated = false
        var i = 0
        while (i < kept.length && !dominated) {
          if (dominates(kept(i)._1, v, d)) dominated = true else i += 1
        }
        if (!dominated) {
          // evict candidates the new row dominates, then admit it
          var j = 0
          while (j < kept.length) {
            if (dominates(v, kept(j)._1, d)) kept.remove(j) else j += 1
          }
          kept += ((v, row))
        }
      }
      kept.iterator.map(_._2)
    }

    val local = packed.mapPartitions(pass)(enc)
    // One merge task over the local skylines. repartition(1), NOT
    // coalesce(1): coalesce is a narrow dependency, so the single merge
    // task would also run the upstream scan and every "partition-local"
    // pass serially — the exchange here shuffles only the
    // frontier-sized local skylines while the map-side passes keep
    // their parallelism.
    local.repartition(1).mapPartitions(pass)(enc).drop("__sky")
  }

  /** a dominates b: a ≤ b everywhere, a < b somewhere. */
  private def dominates(a: Array[Double], b: Array[Double], d: Int): Boolean = {
    var strict = false
    var i = 0
    while (i < d) {
      if (a(i) > b(i)) return false
      if (a(i) < b(i)) strict = true
      i += 1
    }
    strict
  }

  /** The same operator as a FIRST-CLASS plan node
    * ([[graft.plans.SkylinePlan]] → `SkylineStrategy` →
    * `SkylineExec`): requires the session to carry `GraftExtensions`
    * (the strategy must be injected or the node cannot be planned).
    * Identical semantics to [[skyline]]; the partial/final split is
    * declared as physical distribution requirements instead of a
    * hand-placed coalesce. */
  def skylineNative(df: DataFrame, dims: Seq[String]): DataFrame = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.Cast
    import org.apache.spark.sql.types.DoubleType
    require(dims.nonEmpty, "skyline needs at least one dimension")
    val dimExprs = dims.map(c => Cast(UnresolvedAttribute.quoted(c), DoubleType))
    org.apache.spark.sql.graft.Bridge.ofRows(df.sparkSession,
      graft.plans.SkylinePlan(dimExprs, df.queryExecution.analyzed))
  }
}
