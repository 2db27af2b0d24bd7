package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

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

  /** Epoch seconds for time axes (matching DuckDB's epoch()):
    * timestamps as exact micros over 1e6 (NTZ casts through
    * TIMESTAMP — both sides convert identically, so DIFFERENCES are
    * timezone-free); DATE as midnight epoch seconds (a date column is
    * a valid as-of axis — the native merge's longGetter handles it —
    * so tolerance must too, and `CAST(date AS DOUBLE)` is an analysis
    * error); identity for numeric axes (the unit is the column's
    * own). */
  private def epochSeconds(c: org.apache.spark.sql.Column,
      dt: org.apache.spark.sql.types.DataType) = dt match {
    case _: org.apache.spark.sql.types.TimestampType |
         _: org.apache.spark.sql.types.TimestampNTZType |
         _: org.apache.spark.sql.types.DateType =>
      unix_micros(c.cast("timestamp")).cast("double") / lit(1e6)
    case _ => c.cast("double")
  }

  /** @param carry    right-side columns to attach to each left row
    * @param rightTieBreak right column ordering simultaneous right rows
    *                 (the later one under this order wins — keeps the
    *                 result deterministic when timestamps collide)
    * @param forward  false (default) matches the LATEST right row
    *                 at-or-BEFORE each left row (pandas merge_asof
    *                 'backward'); true matches the EARLIEST right row
    *                 at-or-AFTER it ('forward') — e.g. "the next error
    *                 a user hit after this click". Both inclusive at
    *                 equal timestamps. Same merge formulation either
    *                 way: the forward pass just scans time reversed,
    *                 so the 100 TB cost is identical (one key shuffle,
    *                 one per-partition sort, no range explosion).
    * @param toleranceSec reject a match farther than this many seconds
    *                 (timestamp inputs; for numeric `ts` columns the
    *                 unit is the column's own) from the left row —
    *                 pandas merge_asof `tolerance`. The row survives
    *                 with a null carry, exactly like no-match: since
    *                 the as-of match is the NEAREST candidate in the
    *                 scan direction, "nearest is too far" is precisely
    *                 "nothing within tolerance".
    */
  def asOf(left: DataFrame, right: DataFrame, key: String, ts: String,
      carry: Seq[String], rightTieBreak: String,
      forward: Boolean = false,
      toleranceSec: Option[Double] = None): DataFrame = {
    val reserved = Set("__k", "__ts", "__side", "__tb", "__l", "__c", "__mts")
    val clash = (left.columns ++ right.columns).filter(reserved)
    require(clash.isEmpty,
      s"asOf reserves internal column names ${reserved.mkString(", ")}; " +
        s"rename input columns: ${clash.mkString(", ")}")
    toleranceSec.foreach(t =>
      require(t >= 0, s"asOf tolerance must be >= 0, got $t"))
    val rSchema = right.schema
    val leftStruct = struct(left.columns.map(col).toIndexedSeq: _*)
    // the carried payload is ONE struct of all carry columns, taken
    // atomically from the matched right row — carrying each column
    // independently with last(ignoreNulls) would resurrect an older
    // row's value wherever the matched row holds a legitimate NULL,
    // emitting a mixed row that never existed (and conflating "no
    // match" with "matched row with a NULL attribute"). The matched
    // row's own timestamp rides along as __mts so the tolerance test
    // compares against the row actually matched, never a neighbor.
    val carryStruct =
      struct((carry.map(col) :+ col(ts).as("__mts")).toIndexedSeq: _*)

    // Equality-join semantics for NULL keys (matches the DuckDB ASOF
    // oracle): a NULL-keyed left row matches NOTHING — it passes through
    // with a null carry rather than pairing with NULL-keyed right rows,
    // which the window partition (NULLs group together) would otherwise do.
    val nullKeyedLeft = left.filter(col(key).isNull)
      .select((left.columns.map(col) ++
        carry.map(c => lit(null).cast(rSchema(c).dataType).as(c))).toIndexedSeq: _*)
    val leftK = left.filter(col(key).isNotNull)
    val rightK = right.filter(col(key).isNotNull)

    val carryType = StructType(carry.map(c => rSchema(c)) :+
      StructField("__mts", rSchema(ts).dataType, nullable = true))
    val l2 = leftK.select(
      col(key).as("__k"), col(ts).as("__ts"), lit(1).as("__side"),
      lit(null).cast(rSchema(rightTieBreak).dataType).as("__tb"),
      leftStruct.as("__l"),
      lit(null).cast(carryType).as("__c"))
    val r2 = rightK.select(
      col(key).as("__k"), col(ts).as("__ts"), lit(0).as("__side"),
      col(rightTieBreak).as("__tb"),
      lit(null).cast(l2.schema("__l").dataType).as("__l"),
      carryStruct.as("__c"))

    // forward = the same scan over REVERSED time: at equal timestamps
    // the side ordering still puts right rows before left (inclusive
    // both ways), and the tie-break still makes the max-__tb right row
    // the one last() sees — one deterministic winner rule, either
    // direction
    val tsOrder = if (forward) col("__ts").desc else col("__ts").asc
    val w = Window.partitionBy(col("__k"))
      .orderBy(tsOrder, col("__side"), col("__tb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = l2.unionByName(r2)
      .select(col("__side"), col("__l"),
        last(col("__c"), ignoreNulls = true).over(w).as("__m"))
      .filter(col("__side") === 1)
    // tolerance: null the WHOLE carry when the matched row is too far
    // (epoch seconds for timestamps — exact micros over 1e6, matching
    // DuckDB's epoch(); identity for numerics, where the unit is the
    // column's own; abs covers both scan directions). A too-far match
    // and a no-match emit identical rows — see the param doc.
    val keep = toleranceSec match {
      case None => col("__m").isNotNull
      case Some(tol) => col("__m").isNotNull &&
        abs(epochSeconds(col(s"__l.$ts"), left.schema(ts).dataType) -
          epochSeconds(col("__m.__mts"), rSchema(ts).dataType)) <= tol
    }
    matched
      .select((col("__l.*") +:
        carry.map(c => when(keep, col(s"__m.$c")).as(c))): _*)
      .unionByName(nullKeyedLeft)
  }

  /** The same join through the NATIVE plan node
    * ([[graft.plans.AsOfJoinPlan]] → `AsOfJoinStrategy` →
    * `AsOfJoinExec`) — requires a session carrying `GraftExtensions`.
    * Identical semantics and column layout to [[asOf]] (spec-enforced
    * parity, including `forward` and `toleranceSec`); the physical
    * plan is one exchange + sort per side and a single merge scan,
    * instead of union + window. Tolerance rides OUTSIDE the node: the
    * matched right timestamp travels as an extra carry column and a
    * post-projection nulls the carry when it is too far — the merge
    * itself is unchanged, since the nearest match being too far is
    * exactly "no match within bound". */
  def asOfNative(left: DataFrame, right: DataFrame, key: String,
      ts: String, carry: Seq[String], rightTieBreak: String,
      forward: Boolean = false,
      toleranceSec: Option[Double] = None): DataFrame = {
    val rSchema = right.schema
    require(!(left.columns ++ right.columns).contains("__rts"),
      "asOfNative reserves the internal column name __rts")
    toleranceSec.foreach(t =>
      require(t >= 0, s"asOfNative tolerance must be >= 0, got $t"))
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
    val carryNames =
      if (toleranceSec.isDefined) carry :+ "__rts" else carry
    val rightK = right.filter(col(key).isNotNull)
      .select((rightCols.map(c => col(c).as(c)) ++
        (if (toleranceSec.isDefined) Seq(col(ts).as("__rts"))
         else Seq.empty)): _*)

    val lp = leftK.queryExecution.analyzed
    val rp = rightK.queryExecution.analyzed
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        name: String) =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"asOfNative: no column $name"))
    val plan = graft.plans.AsOfJoinPlan(
      attr(lp, key), attr(lp, ts), attr(rp, key), attr(rp, ts),
      attr(rp, rightTieBreak), carryNames.map(attr(rp, _)), lp, rp,
      forward)
    val joined = org.apache.spark.sql.graft.Bridge
      .ofRows(left.sparkSession, plan)
    val bounded = toleranceSec match {
      case None => joined
      case Some(tol) =>
        val within = col("__rts").isNotNull &&
          abs(epochSeconds(col(ts), left.schema(ts).dataType) -
            epochSeconds(col("__rts"), rSchema(ts).dataType)) <= tol
        joined.select((left.columns.map(col) ++
          carry.map(c => when(within, col(c)).as(c))).toIndexedSeq: _*)
    }
    bounded.unionByName(nullKeyedLeft)
  }
}
