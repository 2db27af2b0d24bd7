package graft.plans

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, Distribution, UnspecifiedDistribution}

/** The skyline operator as a FIRST-CLASS plan node — the full
  * custom-operator path (LogicalPlan → Strategy → SparkPlan,
  * registered through `GraftExtensions`), used where composition
  * genuinely cannot express the semantics: skyline's only relational
  * form is the O(n²) `NOT EXISTS` self-join.
  *
  * [[graft.operators.Skyline]] is the library-level implementation of
  * the same algorithm via `mapPartitions` — preference (d) in the
  * extension ladder; this node is preference (c): the operator gets a
  * real place in the plan (visible to EXPLAIN, reusable from any
  * plan-producing surface), the partial/final split is expressed as
  * physical REQUIREMENTS (`AllTuples` on the final phase — the
  * planner inserts the exchange, exactly how partial aggregation
  * declares itself) rather than a hand-placed `coalesce(1)`, and the
  * hot loop runs on `InternalRow` with an `UnsafeProjection` for the
  * dimension tuple instead of external Row decoding.
  *
  * Semantics match [[graft.operators.Skyline]] exactly: all
  * dimensions minimized, ties kept, rows with a NULL dimension
  * excluded.
  */
case class SkylinePlan(dims: Seq[Expression], child: LogicalPlan)
    extends UnaryNode {
  require(dims.nonEmpty, "skyline needs at least one dimension")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): SkylinePlan =
    copy(child = newChild)
}

/** Physical block-nested-loop skyline pass. `finalPhase = false`
  * reduces each partition to its local skyline wherever the data
  * already is; `finalPhase = true` demands `AllTuples` and merges the
  * surviving frontier-sized candidates (skyline is mergeable:
  * sky(A∪B) = sky(sky(A)∪sky(B)) — AlgebraProps-verified). */
case class SkylineExec(dims: Seq[Expression], finalPhase: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (finalPhase) AllTuples :: Nil else UnspecifiedDistribution :: Nil

  override protected def withNewChildInternal(newChild: SparkPlan): SkylineExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val dimExprs = dims
    val childOutput = child.output
    val d = dimExprs.length
    child.execute().mapPartitions { it =>
      val proj = UnsafeProjection.create(dimExprs, childOutput)
      val kept = ArrayBuffer.empty[(Array[Double], InternalRow)]
      it.foreach { row =>
        val key = proj(row)
        if (!(0 until d).exists(key.isNullAt)) {
          val v = new Array[Double](d)
          var i = 0
          while (i < d) { v(i) = key.getDouble(i); i += 1 }
          var dominated = false
          i = 0
          while (i < kept.length && !dominated) {
            if (SkylineExec.dominates(kept(i)._1, v, d)) dominated = true
            else i += 1
          }
          if (!dominated) {
            var j = 0
            while (j < kept.length) {
              if (SkylineExec.dominates(v, kept(j)._1, d)) kept.remove(j)
              else j += 1
            }
            kept += ((v, row.copy()))
          }
        }
      }
      kept.iterator.map(_._2)
    }
  }
}

object SkylineExec {
  /** a dominates b: a ≤ b everywhere, a < b somewhere. */
  def dominates(a: Array[Double], b: Array[Double], d: Int): Boolean = {
    var strict = false
    var i = 0
    while (i < d) {
      if (a(i) > b(i)) return false
      if (a(i) < b(i)) strict = true
      i += 1
    }
    strict
  }
}

/** Plans [[SkylinePlan]] as partial-then-final [[SkylineExec]]; the
  * `AllTuples` requirement on the final phase makes the planner place
  * the (frontier-sized) exchange. */
object SkylineStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case SkylinePlan(dims, child) =>
      SkylineExec(dims, finalPhase = true,
        SkylineExec(dims, finalPhase = false, planLater(child))) :: Nil
    case _ => Nil
  }
}
