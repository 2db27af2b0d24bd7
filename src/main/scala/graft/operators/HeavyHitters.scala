package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.freq_sketch

/** Exact heavy hitters at bounded shuffle cost — the two-phase plan:
  *
  *   1. CANDIDATES: one scan aggregates a [[graft.functions.FreqSketchAgg
  *      Misra–Gries sketch]] (≤ capacity counters per partial buffer,
  *      `capacity` entries per map task on the wire) together with the
  *      exact non-null row count N. The sketch provably contains every
  *      item with true frequency > N/(capacity+1) — recall 1.0.
  *   2. VERIFY: a second scan exact-counts ONLY the ≤ capacity
  *      candidates (`isin` probe — map-side filter, then a hash
  *      aggregate over at most `capacity` distinct keys) and keeps
  *      those above the threshold.
  *
  * The result is EXACT and deterministic — identical to `GROUP BY item
  * HAVING count(*) > N/(capacity+1)` — but the shuffle never carries
  * the full distinct-key space: for a 100 TB corpus keyed by URL or
  * n-gram, phase 1 ships `tasks × capacity` rows and phase 2 ships
  * `tasks × capacity` partial counts, vs billions of distinct keys for
  * the naive plan. Two scans of the fact is the textbook trade
  * (Cormode & Hadjieleftheriou, VLDB 2008 survey) — scans are cheap,
  * shuffles are not.
  *
  * The candidate handoff is a driver round-trip of ≤ `capacity` values
  * (a k-row stat, like every other driver collect in this engine) so
  * phase 2's probe is a broadcast-free `isin` literal.
  */
object HeavyHitters {

  /** Items of `c` with exact count strictly above N/(capacity+1),
    * as (item, cnt), count-descending then item-ascending. NULL items
    * are excluded (a NULL never equals itself under GROUP BY-style
    * equality semantics here; count NULLs separately if they matter).
    */
  def apply(df: DataFrame, c: Column, capacity: Int): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val probe = df.select(c.as("item")).filter(col("item").isNotNull)
    val head = probe.agg(
      count(lit(1)).as("n"),
      freq_sketch(col("item"), capacity).as("sk")).head()
    val n = head.getLong(0)
    val candidates = head.getSeq[org.apache.spark.sql.Row](1).map(_.get(0))
    if (candidates.isEmpty) {
      // empty input (or all-null column): empty result, right schema
      probe.groupBy("item").agg(count(lit(1)).as("cnt")).limit(0)
    } else {
      probe
        .filter(col("item").isin(candidates: _*))
        .groupBy("item").agg(count(lit(1)).as("cnt"))
        // strict >: the MG guarantee covers exactly this threshold
        .filter(col("cnt") * (capacity + 1) > lit(n))
        .orderBy(col("cnt").desc, col("item"))
    }
  }
}
