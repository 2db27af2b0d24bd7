package graft.olap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention matrix — the product-analytics staple next to the
  * funnel: entities are grouped into cohorts by their FIRST activity
  * period, and each later period's retention is the fraction of the
  * cohort still active in it.
  *
  * Scale shape: one entity-keyed aggregation finds first-activity
  * (cohort assignment), the activity log deduplicates to distinct
  * (entity, period) pairs in the same pass shape, the cohort label
  * joins back on the entity key (the exchanges line up), and the
  * matrix reduces to (cohorts × periods) cells — tiny by definition.
  * The division runs per cell on exact distinct counts. Periods are
  * day-granular buckets of `periodDays`, anchored at each cohort's own
  * start (offset 0 = the cohort period itself, always retention 1.0 by
  * construction).
  */
object Retention {

  /** @param periodDays cohort/retention bucket width in days
    * @return (cohort_start, period_offset, active, cohort_size,
    *         retention) — cohort_start is the first day of the
    *         entity's first period, period_offset counts periods
    *         since it. */
  def cohortMatrix(events: DataFrame, entityCol: String, tsCol: String,
      periodDays: Int): DataFrame = {
    require(periodDays >= 1, "periodDays must be positive")
    // day index from the epoch, then period bucket — pure date math,
    // identical across engines (no timezone: dates are taken as-is)
    val day = datediff(to_date(col(tsCol)), to_date(lit("1970-01-01")))
    // floor(day / width): day counts are tiny (≤ ~10⁵), so the double
    // division is exact and the floor matches integer division — the
    // same expression an external engine runs verbatim. Null entities
    // or timestamps carry no cohort information and are dropped (an
    // unfiltered null period would otherwise surface as a null-offset
    // cell).
    val activity = events
      .filter(col(entityCol).isNotNull && col(tsCol).isNotNull)
      .select(col(entityCol).as("__e"),
        floor(day / lit(periodDays)).cast("long").as("__p"))
      .distinct()
    val cohorts = activity.groupBy(col("__e")).agg(min(col("__p")).as("__c"))
    val sizes = cohorts.groupBy(col("__c")).agg(count(lit(1)).as("cohort_size"))
    activity.join(cohorts, Seq("__e"))
      .groupBy(col("__c"), (col("__p") - col("__c")).as("period_offset"))
      .agg(count(lit(1)).as("active"))
      .join(sizes, Seq("__c"))
      .select(
        date_add(to_date(lit("1970-01-01")),
          (col("__c") * periodDays).cast("int")).as("cohort_start"),
        col("period_offset"), col("active"), col("cohort_size"),
        round(col("active").cast("double") /
          col("cohort_size").cast("double"), 6).as("retention"))
      .orderBy("cohort_start", "period_offset")
  }
}
