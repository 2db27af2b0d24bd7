package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (temporal) join: for each left row, attach the most recent
  * right row whose timestamp is at-or-before the left row's, per key.
  *
  * The reference has no temporal operator (its PDI FuzzyMatch is the
  * closest "theta join" shape, `etl_final.ktr:3609-3645`); this is part
  * of the training-data-pipeline extension surface — point-in-time
  * feature attachment without leakage (e.g. "the last error state a
  * user saw before this click").
  *
  * Implementation is the merge formulation, not a range join: tag and
  * union both sides, then one window pass per key ordered by (ts, side,
  * right-tiebreak) carries the latest right payload forward with
  * `last(ignoreNulls)`. Cost at 100 TB: ONE shuffle of left+right on
  * the key (same as any equi-join), a per-partition sort, zero
  * range-explosion — versus the O(|L|·|R|) blowup of the naive
  * `l.ts >= r.ts` join Catalyst would plan as BroadcastNestedLoop.
  * Right rows sort before left rows at equal timestamps, so a right row
  * exactly at the left timestamp IS matched (inclusive, DuckDB/kdb
  * ASOF semantics).
  */
object AsOfJoin {

  /** @param carry    right-side columns to attach to each left row
    * @param rightTieBreak right column ordering simultaneous right rows
    *                 (the later one under this order wins — keeps the
    *                 result deterministic when timestamps collide)
    */
  def asOf(left: DataFrame, right: DataFrame, key: String, ts: String,
      carry: Seq[String], rightTieBreak: String): DataFrame = {
    val reserved = Set("__k", "__ts", "__side", "__tb", "__l", "__c")
    val clash = (left.columns ++ right.columns).filter(reserved)
    require(clash.isEmpty,
      s"asOf reserves internal column names ${reserved.mkString(", ")}; " +
        s"rename input columns: ${clash.mkString(", ")}")
    val rSchema = right.schema
    val leftStruct = struct(left.columns.map(col).toIndexedSeq: _*)
    // the carried payload is ONE struct of all carry columns, taken
    // atomically from the matched right row — carrying each column
    // independently with last(ignoreNulls) would resurrect an older
    // row's value wherever the matched row holds a legitimate NULL,
    // emitting a mixed row that never existed (and conflating "no
    // match" with "matched row with a NULL attribute")
    val carryStruct = struct(carry.map(col).toIndexedSeq: _*)

    // Equality-join semantics for NULL keys (matches the DuckDB ASOF
    // oracle): a NULL-keyed left row matches NOTHING — it passes through
    // with a null carry rather than pairing with NULL-keyed right rows,
    // which the window partition (NULLs group together) would otherwise do.
    val nullKeyedLeft = left.filter(col(key).isNull)
      .select((left.columns.map(col) ++
        carry.map(c => lit(null).cast(rSchema(c).dataType).as(c))).toIndexedSeq: _*)
    val leftK = left.filter(col(key).isNotNull)
    val rightK = right.filter(col(key).isNotNull)

    val l2 = leftK.select(
      col(key).as("__k"), col(ts).as("__ts"), lit(1).as("__side"),
      lit(null).cast(rSchema(rightTieBreak).dataType).as("__tb"),
      leftStruct.as("__l"),
      lit(null).cast(StructType(carry.map(c => rSchema(c)))).as("__c"))
    val r2 = rightK.select(
      col(key).as("__k"), col(ts).as("__ts"), lit(0).as("__side"),
      col(rightTieBreak).as("__tb"),
      lit(null).cast(l2.schema("__l").dataType).as("__l"),
      carryStruct.as("__c"))

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__side"), col("__tb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l2.unionByName(r2)
      .select(col("__side"), col("__l"),
        last(col("__c"), ignoreNulls = true).over(w).as("__m"))
      .filter(col("__side") === 1)
      .select((col("__l.*") +: carry.map(c => col(s"__m.$c").as(c))): _*)
      .unionByName(nullKeyedLeft)
  }

  /** The same join through the NATIVE plan node
    * ([[graft.plans.AsOfJoinPlan]] → `AsOfJoinStrategy` →
    * `AsOfJoinExec`) — requires a session carrying `GraftExtensions`.
    * Identical semantics and column layout to [[asOf]] (spec-enforced
    * parity); the physical plan is one exchange + sort per side and a
    * single forward merge scan, instead of union + window. */
  def asOfNative(left: DataFrame, right: DataFrame, key: String,
      ts: String, carry: Seq[String], rightTieBreak: String): DataFrame = {
    val rSchema = right.schema
    // NULL-keyed left rows match nothing; route them around the node
    // (inside the merge, natural ordering would group NULL keys)
    val nullKeyedLeft = left.filter(col(key).isNull)
      .select((left.columns.map(col) ++
        carry.map(c => lit(null).cast(rSchema(c).dataType).as(c))).toIndexedSeq: _*)
    val leftK = left.filter(col(key).isNotNull)
    // shuffle only what the merge needs from the right side; the
    // explicit aliases mint FRESH exprIds so a self-join (same base
    // relation on both sides) can't leave the node with ambiguous
    // attribute references
    val rightCols = (Seq(key, ts, rightTieBreak) ++ carry).distinct
    val rightK = right.filter(col(key).isNotNull)
      .select(rightCols.map(c => col(c).as(c)): _*)

    val lp = leftK.queryExecution.analyzed
    val rp = rightK.queryExecution.analyzed
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        name: String) =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"asOfNative: no column $name"))
    val plan = graft.plans.AsOfJoinPlan(
      attr(lp, key), attr(lp, ts), attr(rp, key), attr(rp, ts),
      attr(rp, rightTieBreak), carry.map(attr(rp, _)), lp, rp)
    org.apache.spark.sql.graft.Bridge.ofRows(left.sparkSession, plan)
      .unionByName(nullKeyedLeft)
  }
}
