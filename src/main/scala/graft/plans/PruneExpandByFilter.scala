package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Plan rewrite: prune `Expand` projections a filter refutes.
  *
  * A GROUPING SETS / rollup / cube aggregate plans as
  * `Aggregate(…, Expand(projections, …))` — the Expand replicates
  * every input row once per member set, and the set identity rides as
  * a LITERAL `spark_grouping_id` slot in each projection. A query that
  * selects ONE member set of a materialized member space
  * (`WHERE gid = 255` — the cube SQL face's staple, q230) still pays
  * the full Expand: Catalyst pushes the filter below the Aggregate
  * (gid is a grouping column), but stock Spark stops there — every
  * projection's rows are produced, replicated and aggregated, then
  * all but one set's groups are discarded by the filter.
  *
  * This rule finishes the push: for `Filter(cond, Expand(…))`, each
  * projection's expressions are substituted into `cond`; a projection
  * whose substituted condition CLOSES (no remaining input references)
  * and folds to false/null can never emit a surviving row, so it is
  * dropped from the Expand. The filter itself stays — projections the
  * condition cannot decide (it references pass-through data columns)
  * are kept and still filtered row-by-row, so the rewrite only ever
  * removes provably-dead replication. With every projection refuted
  * the Expand collapses to an empty relation.
  *
  * At scale this turns "materialize the member space, keep one set"
  * from an O(sets × fact) Expand into O(fact) — the same plan a
  * hand-written single-set aggregate gets.
  *
  * Safety gates:
  *  - `cond` must be deterministic (a nondeterministic predicate may
  *    not be evaluated at plan time);
  *  - a projection is dropped ONLY when the substituted condition has
  *    no references left AND evaluates (driver-side, on the literal
  *    tree) to false or null — an evaluation error keeps it.
  */
object PruneExpandByFilter extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, e: Expand) if cond.deterministic =>
      val kept = e.projections.filter(proj => !refuted(cond, e.output, proj))
      if (kept.length == e.projections.length) f
      else if (kept.isEmpty) LocalRelation(e.output, Nil)
      else Filter(cond, Expand(kept, e.output, e.child))
  }

  /** True iff substituting this projection's expressions into the
    * condition provably yields false/null for every input row. */
  private def refuted(cond: Expression, output: Seq[Attribute],
      proj: Seq[Expression]): Boolean = {
    val byExprId = output.map(_.exprId).zip(proj).toMap
    val substituted = cond.transformUp {
      case a: Attribute if byExprId.contains(a.exprId) => byExprId(a.exprId)
    }
    if (substituted.references.nonEmpty) return false
    try substituted.eval(null) match {
      case null => true
      case false => true
      case _ => false
    } catch { case scala.util.control.NonFatal(_) => false }
  }
}
