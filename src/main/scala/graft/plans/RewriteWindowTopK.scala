package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types.{ArrayType, IntegerType, StructType}

import graft.functions.BoundedTopKAgg

/** Plan rewrite: the ubiquitous top-k-per-group idiom
  *
  *   `row_number() OVER (PARTITION BY p ORDER BY o…) AS rn` + `rn ≤ k`
  *
  * plans as a WindowExec — which SORTS every group's entire row set to
  * keep k of it. This rule rewrites the Filter(Window) pattern into
  * the bounded-heap aggregate ([[BoundedTopKAgg]]): rows pack into
  * `struct(orderKeys…, payload…)`, each group keeps a k-element heap
  * at every aggregation stage (map-side partials included), and
  * posexplode reconstructs the original schema plus the rank. The
  * full-group sort disappears; per-group state drops from O(group) to
  * O(k) — the difference between a skewed group that OOMs and one
  * that doesn't.
  *
  * Safety gates (rewrite only when provably equivalent):
  *  - single window expression = row_number() (no other functions
  *    share the spec);
  *  - the filter is exactly `rn ≤ lit` / `rn < lit` (or mirrored),
  *    with k in (0, 10^5] — a huge k would make the heap the problem;
  *  - ORDER BY is all-ascending, default null ordering (the heap's
  *    natural struct order), with deterministic expressions;
  *  - partition keys are plain attributes; every column type is
  *    orderable (the heap compares full payload structs).
  *
  * Tie semantics: row_number breaks order-key ties arbitrarily
  * (partition-layout-dependent); the heap breaks them by the
  * remaining payload columns — one of the valid outcomes, now
  * deterministic. Queries that need a specific contested-boundary row
  * already pass a unique tiebreaker in ORDER BY, which this rewrite
  * honors exactly.
  */
object RewriteWindowTopK extends Rule[LogicalPlan] {

  private val maxK = 100000

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond,
        w @ Window(Seq(alias @ Alias(we: WindowExpression, _)), parts, order, child, _))
        if eligible(cond, alias.toAttribute, we, parts, order, child) =>
      rewrite(f, cond, alias, parts, order, child)
  }

  private def limitOf(cond: Expression, rn: Attribute): Option[Int] = {
    def lit(e: Expression): Option[Int] = e match {
      case Literal(v: Int, IntegerType) => Some(v)
      case _ => None
    }
    cond match {
      case LessThanOrEqual(a: Attribute, l) if a.semanticEquals(rn) => lit(l)
      case LessThan(a: Attribute, l) if a.semanticEquals(rn) => lit(l).map(_ - 1)
      case GreaterThanOrEqual(l, a: Attribute) if a.semanticEquals(rn) => lit(l)
      case GreaterThan(l, a: Attribute) if a.semanticEquals(rn) => lit(l).map(_ - 1)
      case _ => None
    }
  }

  private def eligible(cond: Expression, rn: Attribute, we: WindowExpression,
      parts: Seq[Expression], order: Seq[SortOrder],
      child: LogicalPlan): Boolean = {
    val isRowNumber = we.windowFunction.isInstanceOf[RowNumber]
    val k = limitOf(cond, rn)
    val ascending = order.nonEmpty && order.forall(so =>
      so.direction == Ascending && so.nullOrdering == NullsFirst &&
        so.child.deterministic)
    val partsOk = parts.forall(_.isInstanceOf[AttributeReference])
    val typesOk = (order.map(_.child) ++ child.output)
      .forall(e => TypeUtils.checkForOrderingExpr(e.dataType, "rewrite")
        .isSuccess) &&
      // rank arithmetic below assumes the analyzed row_number type
      rn.dataType == IntegerType
    isRowNumber && k.exists(v => v > 0 && v <= maxK) &&
      ascending && partsOk && typesOk
  }

  private def rewrite(f: Filter, cond: Expression, rnAlias: Alias,
      parts: Seq[Expression], order: Seq[SortOrder],
      child: LogicalPlan): LogicalPlan = {
    val k = limitOf(cond, rnAlias.toAttribute).get
    val orderExprs = order.map(_.child)

    // heap element: order keys first (they drive the comparison),
    // full payload after (reconstruction + deterministic tie-break)
    val fields: Seq[Expression] =
      orderExprs.zipWithIndex.flatMap { case (e, i) =>
        Seq(Literal(s"o$i"), e)
      } ++ child.output.zipWithIndex.flatMap { case (a, i) =>
        Seq(Literal(s"c$i"), a)
      }
    val keyStruct = CreateNamedStruct(fields)
    val aggExpr = BoundedTopKAgg(keyStruct, k).toAggregateExpression()
    val topAlias = Alias(aggExpr, "__graft_top")()
    val agg = Aggregate(parts, Seq(topAlias), child)

    val elemType = keyStruct.dataType.asInstanceOf[StructType]
    val posAttr = AttributeReference("__graft_pos", IntegerType,
      nullable = false)()
    val elemAttr = AttributeReference("__graft_elem", elemType,
      nullable = false)()
    val generate = Generate(
      PosExplode(topAlias.toAttribute),
      unrequiredChildIndex = Seq(0),
      outer = false,
      qualifier = None,
      generatorOutput = Seq(posAttr, elemAttr),
      agg)

    // rebuild the Filter's output schema under the ORIGINAL exprIds so
    // parents resolve untouched: child columns from the payload slots,
    // rank = pos + 1
    val nOrder = orderExprs.length
    val cols = child.output.zipWithIndex.map { case (a, i) =>
      Alias(GetStructField(elemAttr, nOrder + i, Some(s"c$i")), a.name)(
        exprId = a.exprId, qualifier = a.qualifier)
    }
    val rnOut = Alias(Add(posAttr, Literal(1)), rnAlias.name)(
      exprId = rnAlias.exprId, qualifier = rnAlias.qualifier)
    Project(cols :+ rnOut, generate)
  }
}
