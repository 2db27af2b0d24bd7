package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Predicate row routing — PDI FilterRows with `send_true_to` /
  * `send_false_to` (`etl_final.ktr:2625-2667`): a SPLIT, not a drop.
  *
  * Null semantics matter (SURVEY.md §7.4.2): PDI routes rows where the
  * predicate is not-true (including NULL) to the false branch, while a
  * naive Spark `=!=` filter kills nulls on BOTH branches. The false
  * branch therefore uses `coalesce(!p, true)`.
  *
  * Scale note: both branches share one upstream plan; callers that fan a
  * large scan into both branches should `.persist()` the input (or rely
  * on parquet scan reuse) rather than recompute it.
  */
object Router {

  /** (rows where predicate is true, rows where it is false OR null). */
  def split(df: DataFrame, predicate: Column): (DataFrame, DataFrame) =
    (df.filter(predicate), df.filter(coalesce(!predicate, lit(true))))

  /** Routing as a lineage column instead of two plans — the shape to
    * prefer at scale when both branches get the same downstream
    * treatment: one pass, no double-scan. */
  def tag(df: DataFrame, predicate: Column, trueTag: String,
      falseTag: String, tagCol: String = "route"): DataFrame =
    df.withColumn(tagCol,
      when(coalesce(predicate, lit(false)), trueTag).otherwise(falseTag))
}
