package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (Type 2) versioning — the temporal
  * extension of the reference's CombinationLookup dimensions
  * (`etl_final.ktr` D3): instead of one row per natural key, the
  * dimension keeps one row per (key, attribute-state) EPISODE with a
  * validity interval, so facts can join "as of" their event time.
  *
  * [[scd2FromChangeLog]] builds the full history from a change log in
  * one pass: per key in event order, consecutive rows with unchanged
  * attributes collapse into the open episode; each surviving row takes
  * `valid_from` = its timestamp and `valid_to` = the next episode's
  * start (null while current). Two window functions over the SAME
  * (key, order) sort — Catalyst plans them in one Window operator
  * after one shuffle; nothing here is iterative.
  *
  * The companion point-in-time lookup is [[graft.operators.AsOfJoin]]
  * (valid_from ≤ t, latest wins) — SCD2 storage and as-of retrieval
  * are the two halves of the same contract.
  */
object Scd {

  /** Null-safe "any attribute changed vs the previous row" predicate. */
  private def changedVsPrev(attrCols: Seq[String], w: org.apache.spark.sql.expressions.WindowSpec): Column =
    attrCols.map(a => !(col(a) <=> lag(col(a), 1).over(w)))
      .reduce(_ || _) || row_number().over(w) === 1

  /** Change log (key, attrs, ts) → SCD2 history
    * (key, attrs, valid_from, valid_to, version, is_current).
    *
    * `orderCols` must uniquely order events within a key (pass a
    * tiebreaker alongside the timestamp — same contract as
    * forwardFill); the first `orderCols` column is used as the validity
    * boundary value. */
  def scd2FromChangeLog(log: DataFrame, keyCols: Seq[String],
      attrCols: Seq[String], orderCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty && orderCols.nonEmpty,
      "keys, attrs and order columns are all required")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val tsCol = orderCols.head
    val episodes = log
      .withColumn("__keep", changedVsPrev(attrCols, w))
      .filter(col("__keep"))
    // same window spec as `w`: the post-filter lead/version ranking must
    // use the identical (key, order) sort the run-collapse used
    episodes
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("is_current", col("valid_to").isNull)
      .select((keyCols ++ attrCols).map(col) ++
        Seq(col("valid_from"), col("valid_to"), col("version"),
          col("is_current")): _*)
  }
}
