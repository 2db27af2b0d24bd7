package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global prefix sum — the scan primitive behind
  * sequence packing, global row numbering, and budgeted chunking.
  *
  * The naive formulation (`sum(x) OVER (ORDER BY k)`) is a
  * single-partition window: Spark moves the ENTIRE relation to one
  * task (WindowExec warns about exactly this), which is the canonical
  * 100 TB scale-killer. This operator is the two-phase scan instead:
  *
  *  1. bucket rows by `orderCol / bucketWidth` (a VALUE-derived bucket,
  *     deterministic under any partitioning — no dependence on
  *     `spark_partition_id`);
  *  2. window-cumsum WITHIN each bucket (one hash shuffle, buckets run
  *     in parallel);
  *  3. the per-bucket totals — one row per bucket, driver-small by
  *     construction (`corpus / bucketWidth` rows) — become exclusive
  *     running offsets on the driver and broadcast-join back.
  *
  * Total cost: one shuffle of the data + one tiny collect, vs the
  * single-task sort of the naive window. Requires a unique numeric
  * order key (ties across rows would make "prefix" ill-defined).
  */
object PrefixSum {

  /** Append `outCol` = Σ valueCol over all rows with a smaller-or-equal
    * `orderCol` (inclusive prefix sum in `orderCol` order).
    *
    * The scan needs TWO jobs over the input (the offsets collect, then
    * the windowed result), so by default the bucketed input is
    * persisted MEMORY_AND_DISK — otherwise everything upstream (e.g.
    * per-row tokenization) runs twice. Pass a NARROW projection
    * (order + value + carry columns you need) so the cached footprint
    * is a few columns, not the corpus; `persist = false` opts out and
    * accepts the recompute. */
  def cumsum(df: DataFrame, orderCol: String, valueCol: String,
      outCol: String, bucketWidth: Long = 100000L,
      persist: Boolean = true): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val bucket = floor(col(orderCol) / lit(bucketWidth)).cast("long")
    val in0 = df.withColumn("__bucket", bucket)
    val in = if (persist)
      in0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else in0
    val within = in.withColumn("__c",
      sum(col(valueCol)).over(
        Window.partitionBy(col("__bucket")).orderBy(col(orderCol))))
    // one row per bucket: driver-small by construction, documented.
    // Offsets accumulate in the SUM's own type family: an integral
    // input keeps exact Long arithmetic all the way out (a double
    // detour would corrupt prefix sums past 2^53 — byte totals at the
    // design scale live there); fractional input accumulates in double.
    val totalsRows = in.groupBy(col("__bucket"))
      .agg(sum(col(valueCol)).as("__t"))
      .collect()
      .sortBy(_.getLong(0))
    val integral = within.schema("__c").dataType match {
      case org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = broadcast(
      if (integral) {
        val totals = totalsRows.map(r =>
          (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1)))
        totals.scanLeft((Long.MinValue, 0L)) {
          case ((_, acc), (b, t)) => (b, Math.addExact(acc, t))
        }.sliding(2).collect { case Array((_, acc), (b, _)) => (b, acc) }
          .toSeq.toDF("__bucket", "__off")
      } else {
        val totals = totalsRows.map(r => (r.getLong(0), r.get(1) match {
          case null => 0.0
          case n: java.lang.Number => n.doubleValue()
        }))
        totals.scanLeft((Long.MinValue, 0.0)) {
          case ((_, acc), (b, t)) => (b, acc + t)
        }.sliding(2).collect { case Array((_, acc), (b, _)) => (b, acc) }
          .toSeq.toDF("__bucket", "__off")
      })
    val joined = within.join(offDf, Seq("__bucket"))
      .withColumn(outCol, col("__c") + col("__off"))
      .drop("__bucket", "__c", "__off")
    if (!persist) joined
    else {
      // materialize the result eagerly (it reads the cache once more),
      // then RELEASE the cached input — without this every cumsum call
      // pins its projection in executor storage for the session's
      // lifetime. localCheckpoint blocks are reference-managed by the
      // ContextCleaner, so the returned frame carries no manual-release
      // duty for the caller.
      val out = joined.localCheckpoint()
      in.unpersist()
      out
    }
  }

  /** Greedy stream packing: rows in `orderCol` order fill fixed
    * token-budget packs; a row belongs to pack
    * `floor(exclusive_prefix / budget)` — the deterministic,
    * engine-reproducible formulation of "concatenate documents into
    * fixed-size training sequences" (packs may overflow by at most one
    * document, the standard greedy-packing contract). */
  def packBudget(df: DataFrame, orderCol: String, tokenCol: String,
      budget: Long, packCol: String = "pack_id",
      bucketWidth: Long = 100000L): DataFrame = {
    require(budget > 0, "budget must be positive")
    val c = cumsum(df, orderCol, tokenCol, "__cum", bucketWidth, persist = true)
    // integral token counts: exact integer division (the double floor
    // path loses unit precision past 2^53); token counts are
    // nonnegative by contract so DIV == floor-div here
    val pack = c.schema("__cum").dataType match {
      case org.apache.spark.sql.types.LongType =>
        expr(s"(__cum - `$tokenCol`) DIV $budget")
      case _ =>
        floor((col("__cum") - col(tokenCol)) / lit(budget)).cast("long")
    }
    c.withColumn(packCol, pack).drop("__cum")
  }
}
