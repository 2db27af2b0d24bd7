package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inclusion-dependency discovery — measuring, for candidate
  * (child.fk → parent.pk) column pairs, what fraction of the child's
  * distinct values the parent actually contains. The onboarding pass
  * that turns an undocumented parquet drop into a star schema: a
  * coefficient of 1.0 is a foreign key candidate
  * ([[graft.olap.StarSchema]] can then join it), anything less
  * quantifies orphaned references the way the reference's ETL only
  * discovers by broken lookups (`etl_final.ktr` CombinationLookup
  * silently mints surrogate keys for orphans).
  *
  * Per pair: distinct-project both sides (shuffles on the candidate
  * column — partial aggregation combines map-side), LEFT ANTI join
  * child-distinct against parent-distinct (AQE broadcasts the small
  * side), one-row reduce. NULL child values are excluded from the
  * coefficient (SQL FKs ignore NULLs) but reported. Output rows are
  * pair-count-sized — the audit of a whole warehouse is a union of
  * tiny one-row results. */
object Discovery {

  /** One row: pair label, child distinct count, values missing from
    * the parent, containment coefficient, null child-value count. */
  def inclusion(pairLabel: String, child: DataFrame, childCol: String,
      parent: DataFrame, parentCol: String): DataFrame = {
    val c = child.select(col(childCol).as("__v"))
      .filter(col("__v").isNotNull).distinct()
    val p = parent.select(col(parentCol).as("__v"))
      .filter(col("__v").isNotNull).distinct()
    val missing = c.join(p, Seq("__v"), "left_anti")
      .agg(count(lit(1)).as("n_missing"))
    val nulls = child.agg(
      sum(when(col(childCol).isNull, 1L).otherwise(0L)).as("n_null_child"))
    c.agg(count(lit(1)).as("n_child_distinct"))
      .crossJoin(missing).crossJoin(nulls)
      .select(
        lit(pairLabel).as("pair"),
        col("n_child_distinct"),
        col("n_missing"),
        round(when(col("n_child_distinct") === 0, lit(null))
          .otherwise(lit(1.0) - col("n_missing")
            / col("n_child_distinct").cast("double")), 6)
          .as("containment"),
        col("n_null_child"))
  }

  /** Audit a list of candidate pairs; one row each, ordered by label. */
  def discover(pairs: Seq[(String, DataFrame, String, DataFrame, String)])
      : DataFrame = {
    require(pairs.nonEmpty, "discovery needs at least one candidate pair")
    pairs.map { case (l, c, cc, p, pc) => inclusion(l, c, cc, p, pc) }
      .reduce(_.unionByName(_)).orderBy(col("pair"))
  }
}
