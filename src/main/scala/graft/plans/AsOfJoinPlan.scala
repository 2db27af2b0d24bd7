package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** The as-of join as a FIRST-CLASS plan node — the native-operator
  * face of [[graft.operators.AsOfJoin]] (which builds the merge out of
  * union + window). Same extension ladder as [[SkylinePlan]]: the
  * operator gets a real place in the plan, its physical needs are
  * declared as REQUIREMENTS — co-clustering on the key
  * (`ClusteredDistribution` on both sides) and per-partition sort
  * orders (left by (key, ts), right by (key, ts, tieBreak)) — so the
  * planner places the exchanges and sorts, and AQE sizes them. The
  * merge itself is then a single forward scan of both sorted streams
  * per partition: no union of mismatched schemas, no window state
  * machine, no carried `last(ignoreNulls)` buffers.
  *
  * Semantics (identical to [[graft.operators.AsOfJoin.asOf]], which is
  * the spec'd contract): for each left row, the LAST right row with
  * the same key and `rightTs <= leftTs` under (ts, tieBreak) order
  * supplies the carry columns; unmatched left rows carry NULLs.
  * Callers must route NULL keys around the node (the DataFrame face
  * does) — inside the merge, keys compare with the natural ordering,
  * which would happily group NULLs.
  *
  * Cost at 100 TB: ONE hash exchange of each side on the key + the
  * per-partition sorts (what any shuffled equi-join pays), then a
  * linear merge. The window formulation shuffles the same bytes but
  * pays a second pass over the unioned relation and materializes a
  * carry struct per row; the native node touches each row once.
  */
case class AsOfJoinPlan(leftKey: Attribute, leftTs: Attribute,
    rightKey: Attribute, rightTs: Attribute, tieBreak: Attribute,
    carry: Seq[Attribute], left: LogicalPlan, right: LogicalPlan,
    forward: Boolean = false)
    extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ carry.map(_.withNullability(true))
  override protected def withNewChildrenInternal(newLeft: LogicalPlan,
      newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Physical sorted-merge as-of pass over co-clustered, co-sorted
  * children.
  *
  * `forward = true` flips the match rule to the EARLIEST right row
  * at-or-after each left timestamp — over the SAME ascending child
  * orderings (no re-sort): because left rows arrive in ascending
  * (key, ts) too, right rows behind the current left timestamp are
  * permanently useless and the scan stays single-pass. The forward
  * candidate is the last row of the first eligible equal-(key, ts)
  * run (max tie-break — the same winner rule as backward), retained
  * while later left rows still fall at-or-before it. */
case class AsOfJoinExec(leftKey: Attribute, leftTs: Attribute,
    rightKey: Attribute, rightTs: Attribute, tieBreak: Attribute,
    carry: Seq[Attribute], left: SparkPlan, right: SparkPlan,
    forward: Boolean = false)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ carry.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  private def asc(a: Attribute) =
    SortOrder(a, Ascending, Ascending.defaultNullOrdering, Seq.empty)

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(asc(leftKey), asc(leftTs)) ::
      Seq(asc(rightKey), asc(rightTs), asc(tieBreak)) :: Nil

  // left rows pass through in place: their partitioning and order survive
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(newLeft: SparkPlan,
      newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  /** Direct primitive reader for long-backed fixed-width types — the
    * fast merge path. Key/ts columns of these types compare as their
    * underlying long, no projection, no boxing. */
  private def longGetter(
      dt: org.apache.spark.sql.types.DataType): Option[(InternalRow, Int) => Long] = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType | TimestampType | TimestampNTZType =>
        Some((r, i) => r.getLong(i))
      case IntegerType | DateType => Some((r, i) => r.getInt(i).toLong)
      case ShortType => Some((r, i) => r.getShort(i).toLong)
      case ByteType => Some((r, i) => r.getByte(i).toLong)
      case _ => None
    }
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKey = leftKey; val lTs = leftTs
    val rKey = rightKey; val rTs = rightTs
    val carryAttrs = carry
    val nCarry = carryAttrs.length
    // ordinals + primitive getters resolved ONCE on the driver; the
    // merge loop then reads fields in place — the window formulation
    // this node competes with is whole-stage-codegen'd, so an
    // interpreted per-row projection/comparator here (boxing, two
    // allocations per right row) loses exactly where the node should
    // win: per-row cost at volume
    val lkOrdinal = lOut.indexWhere(_.exprId == lKey.exprId)
    val ltOrdinal = lOut.indexWhere(_.exprId == lTs.exprId)
    val rkOrdinal = rOut.indexWhere(_.exprId == rKey.exprId)
    val rtOrdinal = rOut.indexWhere(_.exprId == rTs.exprId)
    val fastPath: Option[((InternalRow, Int) => Long, (InternalRow, Int) => Long)] =
      if (lkOrdinal >= 0 && ltOrdinal >= 0 && rkOrdinal >= 0 && rtOrdinal >= 0 &&
          lKey.dataType == rKey.dataType && lTs.dataType == rTs.dataType)
        for (gk <- longGetter(lKey.dataType); gt <- longGetter(lTs.dataType))
          yield (gk, gt)
      else None

    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val carryProj = UnsafeProjection.create(carryAttrs, rOut)
      val nullCarry: InternalRow = new GenericInternalRow(nCarry)
      val joined = new JoinedRow
      // emit UnsafeRows: parents (exchanges in particular) require them.
      // Bind against the NULLABLE output schema — the carry attrs' child
      // nullability would compile away the null check an unmatched
      // row's null carry needs
      val outAttrs = lOut ++ carryAttrs.map(_.withNullability(true))
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)

      // one-row lookahead over the right stream
      var rHead: InternalRow = if (rIt.hasNext) rIt.next() else null

      fastPath match {
        case Some((getKey, getTs)) =>
          // nulls-first total order on (isNull, value) — matches the
          // generic path's natural ascending null-first comparator
          var candSet = false
          var candKeyNull = false
          var candKeyVal = 0L
          var candTsNull = false
          var candTsVal = 0L
          // reusable carry buffer: copyFrom grows the backing array as
          // needed and steady-states at zero allocation per row
          val candCarry = new UnsafeRow(nCarry)
          candCarry.pointTo(new Array[Byte](64), 64)
          def cmp(aNull: Boolean, a: Long, bNull: Boolean, b: Long): Int =
            if (aNull && bNull) 0 else if (aNull) -1 else if (bNull) 1
            else java.lang.Long.compare(a, b)
          def nextR(): Unit =
            rHead = if (rIt.hasNext) rIt.next() else null
          if (forward) lIt.map { lRow =>
            val lkNull = lRow.isNullAt(lkOrdinal)
            val lk = if (lkNull) 0L else getKey(lRow, lkOrdinal)
            val ltNull = lRow.isNullAt(ltOrdinal)
            val lt = if (ltNull) 0L else getTs(lRow, ltOrdinal)
            // candidate (last row of the first eligible run) survives
            // while this left row still falls at-or-before it
            val candValid = candSet &&
              cmp(candKeyNull, candKeyVal, lkNull, lk) == 0 &&
              cmp(candTsNull, candTsVal, ltNull, lt) >= 0
            if (!candValid) {
              candSet = false
              var scan = true
              while (scan && rHead != null) {
                val rkNull = rHead.isNullAt(rkOrdinal)
                val rk = if (rkNull) 0L else getKey(rHead, rkOrdinal)
                val kc = cmp(rkNull, rk, lkNull, lk)
                if (kc < 0) nextR()
                else if (kc > 0) scan = false
                else {
                  val rtNull = rHead.isNullAt(rtOrdinal)
                  val rt = if (rtNull) 0L else getTs(rHead, rtOrdinal)
                  if (cmp(rtNull, rt, ltNull, lt) < 0) nextR() // stale
                  else {
                    // first eligible run: keep its LAST row (max tb)
                    candKeyNull = rkNull; candKeyVal = rk
                    candTsNull = rtNull; candTsVal = rt
                    candCarry.copyFrom(carryProj(rHead)); candSet = true
                    nextR()
                    var run = true
                    while (run && rHead != null) {
                      val kN = rHead.isNullAt(rkOrdinal)
                      val kV = if (kN) 0L else getKey(rHead, rkOrdinal)
                      val tN = rHead.isNullAt(rtOrdinal)
                      val tV = if (tN) 0L else getTs(rHead, rtOrdinal)
                      if (cmp(kN, kV, candKeyNull, candKeyVal) == 0 &&
                          cmp(tN, tV, candTsNull, candTsVal) == 0) {
                        candCarry.copyFrom(carryProj(rHead)); nextR()
                      } else run = false
                    }
                    scan = false
                  }
                }
              }
            }
            resultProj(joined(lRow, if (candSet) candCarry else nullCarry))
          }
          else lIt.map { lRow =>
            val lkNull = lRow.isNullAt(lkOrdinal)
            val lk = if (lkNull) 0L else getKey(lRow, lkOrdinal)
            val ltNull = lRow.isNullAt(ltOrdinal)
            val lt = if (ltNull) 0L else getTs(lRow, ltOrdinal)
            var advance = true
            while (advance && rHead != null) {
              val rkNull = rHead.isNullAt(rkOrdinal)
              val rk = if (rkNull) 0L else getKey(rHead, rkOrdinal)
              val kc = cmp(rkNull, rk, lkNull, lk)
              if (kc < 0) {
                nextR()
              } else if (kc == 0 && {
                  val rtNull = rHead.isNullAt(rtOrdinal)
                  val rt = if (rtNull) 0L else getTs(rHead, rtOrdinal)
                  cmp(rtNull, rt, ltNull, lt) <= 0
                }) {
                candCarry.copyFrom(carryProj(rHead))
                candSet = true; candKeyNull = rkNull; candKeyVal = rk
                nextR()
              } else {
                advance = false
              }
            }
            val matched =
              candSet && cmp(candKeyNull, candKeyVal, lkNull, lk) == 0
            resultProj(joined(lRow, if (matched) candCarry else nullCarry))
          }

        case None =>
          val lKeyProj = UnsafeProjection.create(Seq(lKey), lOut)
          val lTsProj = UnsafeProjection.create(Seq(lTs), lOut)
          val rKeyProj = UnsafeProjection.create(Seq(rKey), rOut)
          val rTsProj = UnsafeProjection.create(Seq(rTs), rOut)
          val keyOrd =
            RowOrdering.createNaturalAscendingOrdering(Seq(lKey.dataType))
          val tsOrd =
            RowOrdering.createNaturalAscendingOrdering(Seq(lTs.dataType))
          def nextR(): Unit =
            rHead = if (rIt.hasNext) rIt.next() else null
          // last right row (its carry projection) whose (key, ts)
          // qualified, and the (key, ts) it qualified under
          var candCarry: InternalRow = null
          var candKey: InternalRow = null
          var candTs: InternalRow = null
          if (forward) lIt.map { lRow =>
            val lk = lKeyProj(lRow)
            val lt = lTsProj(lRow)
            val candValid = candKey != null &&
              keyOrd.compare(candKey, lk) == 0 &&
              tsOrd.compare(candTs, lt) >= 0
            if (!candValid) {
              candKey = null
              var scan = true
              while (scan && rHead != null) {
                val rk = rKeyProj(rHead)
                val kc = keyOrd.compare(rk, lk)
                if (kc < 0) nextR()
                else if (kc > 0) scan = false
                else {
                  val rt = rTsProj(rHead)
                  if (tsOrd.compare(rt, lt) < 0) nextR() // stale
                  else {
                    candKey = rk.copy(); candTs = rt.copy()
                    candCarry = carryProj(rHead).copy()
                    nextR()
                    while (rHead != null &&
                        keyOrd.compare(rKeyProj(rHead), candKey) == 0 &&
                        tsOrd.compare(rTsProj(rHead), candTs) == 0) {
                      candCarry = carryProj(rHead).copy()
                      nextR()
                    }
                    scan = false
                  }
                }
              }
            }
            resultProj(joined(lRow,
              if (candKey != null) candCarry else nullCarry))
          }
          else lIt.map { lRow =>
            val lk = lKeyProj(lRow)
            val lt = lTsProj(lRow)
            // advance the right stream through everything at-or-before
            // (lk, lt); the last advanced row with key == lk is the match
            var advance = true
            while (advance && rHead != null) {
              val rk = rKeyProj(rHead)
              val kc = keyOrd.compare(rk, lk)
              if (kc < 0) {
                nextR()
              } else if (kc == 0 && tsOrd.compare(rTsProj(rHead), lt) <= 0) {
                candCarry = carryProj(rHead).copy()
                candKey = rk.copy()
                nextR()
              } else {
                advance = false
              }
            }
            val matched =
              candKey != null && keyOrd.compare(candKey, lk) == 0
            resultProj(joined(lRow, if (matched) candCarry else nullCarry))
          }
      }
    }
  }
}

/** Plans [[AsOfJoinPlan]] as [[AsOfJoinExec]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(lk, lt, rk, rt, tb, carry, l, r, fwd) =>
      AsOfJoinExec(lk, lt, rk, rt, tb, carry,
        planLater(l), planLater(r), fwd) :: Nil
    case _ => Nil
  }
}
