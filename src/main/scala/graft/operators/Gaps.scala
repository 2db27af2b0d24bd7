package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence-gap detection: the missing ranges `[gap_start, gap_end]`
  * of an integer id column — "which chunks never arrived" over
  * ingestion sequence numbers, offsets, or surrogate keys.
  *
  * The naive formulation is `lag` over ONE global ordering — a
  * single-partition window, the classic scale-killer. This is the
  * [[PrefixSum]] two-phase shape instead: ids bucket by
  * `id DIV bucketWidth`, intra-bucket gaps come from a PARTITIONED
  * window (parallel across buckets), and cross-bucket gaps from a
  * bucket summary (min/max per non-empty bucket) that is
  * `idRange / bucketWidth` rows — the only global window runs over
  * that bounded summary relation, never the data. Pick `bucketWidth`
  * so the summary stays driver-or-window friendly (10⁹ ids at width
  * 10⁶ → a 1000-row summary).
  *
  * Duplicate ids are harmless (a zero-width "gap" is filtered);
  * NULL ids are ignored.
  */
object Gaps {

  def missingRanges(df: DataFrame, idCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val ids = df.select(col(idCol).cast("long").as("id"))
      .filter(col("id").isNotNull)
      .withColumn("bucket", expr(s"id DIV $bucketWidth"))

    val intraW = Window.partitionBy(col("bucket")).orderBy(col("id"))
    val intra = ids
      .withColumn("prev", lag(col("id"), 1).over(intraW))
      .filter(col("prev").isNotNull && col("id") - col("prev") > 1)
      .select((col("prev") + 1).as("gap_start"), (col("id") - 1).as("gap_end"))

    val summary = ids.groupBy(col("bucket"))
      .agg(min(col("id")).as("lo"), max(col("id")).as("hi"))
    // bounded relation: one row per NON-EMPTY bucket — the pinned
    // partition marks the single-task window intentional (identical
    // semantics, no spurious WindowExec scale warning)
    val crossW = Window.partitionBy(graft.plans.PinnedWindow.key(col("bucket")))
      .orderBy(col("bucket"))
    val cross = summary
      .withColumn("prev_hi", lag(col("hi"), 1).over(crossW))
      .filter(col("prev_hi").isNotNull && col("lo") - col("prev_hi") > 1)
      .select((col("prev_hi") + 1).as("gap_start"), (col("lo") - 1).as("gap_end"))

    intra.unionByName(cross)
      .withColumn("missing", col("gap_end") - col("gap_start") + 1)
  }
}
