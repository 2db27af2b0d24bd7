package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join/shuffle-key skew diagnostics — the pre-flight check before
  * pointing a 1000-executor join at a key: a key whose heaviest value
  * owns 30% of the rows turns one reducer into the job's critical
  * path, and the fix (salting — [[graft.operators.SaltedJoin]] — or
  * AQE skew splitting) wants a measured severity, not a guess.
  *
  * The reference tunes nothing (single-process pandas has no
  * shuffle); this is scale tooling the Spark re-expression needs.
  *
  * Two aggregations: the per-key count relation (one shuffle on the
  * key, map-side combine), then a one-row reduce over it. Percentiles
  * of the group-size distribution use `percentile_cont` over the
  * KEY relation — its cardinality is the distinct-key count, already
  * reduced from the row count, and the reduce is distributed; for a
  * corpus-sized key domain swap the documented `approx_percentile`
  * strategy (same dial as [[graft.features.Features.quantileBins]]).
  */
object SkewProfile {

  /** One-row skew report for `keyCol`: n_rows, n_keys, max/avg key
    * frequency, p50/p90/p99 of key frequencies, top1_share (heaviest
    * key's row fraction) and skew (max/avg — 1.0 = perfectly even).
    * NULL keys count as one key (they co-locate in a shuffle too). */
  def keyStats(df: DataFrame, keyCol: String): DataFrame =
    df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
      .agg(
        sum(col("cnt")).as("n_rows"),
        count(lit(1)).as("n_keys"),
        max(col("cnt")).as("max_cnt"),
        round(avg(col("cnt")), 6).as("avg_cnt"),
        round(expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY cnt)"), 6)
          .as("p50_cnt"),
        round(expr("percentile_cont(0.9) WITHIN GROUP (ORDER BY cnt)"), 6)
          .as("p90_cnt"),
        round(expr("percentile_cont(0.99) WITHIN GROUP (ORDER BY cnt)"), 6)
          .as("p99_cnt"),
        round(max(col("cnt")) / sum(col("cnt")).cast("double"), 6)
          .as("top1_share"),
        round(max(col("cnt")) / avg(col("cnt")), 6).as("skew"))
}
