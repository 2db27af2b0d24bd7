package graft.etl

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Column-level data profiling — the warehouse QA pass that runs
  * before anything else trusts a new delivery: per-column null counts
  * and distinct cardinalities, emitted long-format (one row per
  * column) so downstream rules can join against expectations.
  *
  * ONE aggregation pass computes every column's stats side by side
  * (null counts combine map-side; distincts use HyperLogLog++ when
  * `approxDistinct` — the fixed-state 100 TB path — or exact
  * `count(DISTINCT)` when the gate needs engine-reproducible numbers;
  * Spark plans multi-column exact distincts via Expand, still a single
  * scan). The long format comes from a `stack` of the wide result —
  * driver-free, no per-column jobs. */
object Profile {

  def profile(df: DataFrame, cols: Seq[String],
      approxDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    // ONE shared row count — not one per column — plus nulls/distincts
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(
        F.sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn_$c"),
        (if (approxDistinct) approx_count_distinct(col(c))
        else countDistinct(col(c))).as(s"__nd_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', `__n`, `__nn_$c`, `__nd_$c`").mkString(", ")
    wide.select(expr(
      s"stack(${cols.size}, $stackArgs) AS (column, n_rows, n_nulls, n_distinct)"))
  }
}
