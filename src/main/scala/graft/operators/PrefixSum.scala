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

  /** Exclusive running offsets from (bucket, total) rows, computed at
    * the driver. Accumulates in the sum's own type family: integral
    * input keeps exact (overflow-checked) Long arithmetic; fractional
    * accumulates in double. Null totals (all-null bucket) count as
    * zero. Returns a tiny (__bucket, __off) frame. */
  private def exclusiveOffsets(spark: org.apache.spark.sql.SparkSession,
      totalsRows: Array[org.apache.spark.sql.Row],
      integral: Boolean): DataFrame = {
    import spark.implicits._
    val sorted = totalsRows.sortBy(_.getLong(0))
    if (integral) {
      val totals = sorted.map(r =>
        (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1)))
      totals.scanLeft((Long.MinValue, 0L)) {
        case ((_, acc), (b, t)) => (b, Math.addExact(acc, t))
      }.sliding(2).collect { case Array((_, acc), (b, _)) => (b, acc) }
        .toSeq.toDF("__bucket", "__off")
    } else {
      val totals = sorted.map(r => (r.getLong(0), r.get(1) match {
        case null => 0.0
        case n: java.lang.Number => n.doubleValue()
      }))
      totals.scanLeft((Long.MinValue, 0.0)) {
        case ((_, acc), (b, t)) => (b, acc + t)
      }.sliding(2).collect { case Array((_, acc), (b, _)) => (b, acc) }
        .toSeq.toDF("__bucket", "__off")
    }
  }

  /** [[exclusiveOffsets]] for DECIMAL(38,0) totals (the distributed
    * integral path): exact BigDecimal accumulation at the driver,
    * offsets returned as DECIMAL(38,0) so the downstream checked
    * cast-back to Long is the single overflow gate. */
  private def exclusiveOffsetsDecimal(
      spark: org.apache.spark.sql.SparkSession,
      totalsRows: Array[org.apache.spark.sql.Row]): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val sorted = totalsRows.sortBy(_.getLong(0))
    val totals = sorted.map(r => (r.getLong(0),
      if (r.isNullAt(1)) java.math.BigDecimal.ZERO else r.getDecimal(1)))
    val rows = new scala.collection.mutable.ArrayBuffer[Row](totals.length)
    var acc = java.math.BigDecimal.ZERO
    totals.foreach { case (b, t) =>
      rows += Row(b, new java.math.BigDecimal(acc.toBigInteger))
      acc = acc.add(t)
    }
    spark.createDataFrame(
      java.util.Arrays.asList(rows.toArray: _*),
      StructType(Seq(StructField("__bucket", LongType),
        StructField("__off", DecimalType(38, 0)))))
  }

  /** Append `outCol` = Σ valueCol over all rows with a smaller-or-equal
    * `orderCol` (inclusive prefix sum in `orderCol` order).
    *
    * The scan needs TWO jobs over the input (the offsets collect, then
    * the windowed result), so by default the bucketed input is
    * persisted MEMORY_AND_DISK — otherwise everything upstream (e.g.
    * per-row tokenization) runs twice. Pass a NARROW projection
    * (order + value + carry columns you need) so the cached footprint
    * is a few columns, not the corpus; `persist = false` opts out and
    * accepts the recompute.
    *
    * GUARDRAIL (checked, not assumed): the per-bucket totals are
    * "driver-small by construction" only while `rows / bucketWidth`
    * stays modest — a 10¹²-row corpus at the default width is 10⁷
    * offset rows. The collect is capped at `maxDriverBuckets + 1`
    * (a result under the cap IS the complete set, so the normal path
    * pays nothing extra); at the cap the offsets are instead computed
    * DISTRIBUTED in two levels: buckets fold into ≤ maxDriverBuckets
    * value-derived superbuckets, the within-superbucket exclusive
    * prefix is a (superbucket-partitioned) window over the tiny totals
    * relation, only superbucket totals are collected, and the bucket
    * offsets stay a distributed relation joined back on `__bucket` —
    * never materialized at the driver. Integral offsets on this path
    * accumulate in exact DECIMAL(38,0) and checked-cast back to Long,
    * so both paths fail loudly on overflow (driver: Math.addExact;
    * distributed: raise_error on the cast). Scope note: that guarantee
    * covers the CROSS-BUCKET running offsets in both ANSI modes; the
    * per-bucket Long sums and the final `value-cumsum + offset`
    * addition rely on ANSI arithmetic (Spark 4's default) to error on
    * overflow — a non-ANSI session weakens those two spots to silent
    * IEEE wrapping, as any plain Long sum in it does. */
  def cumsum(df: DataFrame, orderCol: String, valueCol: String,
      outCol: String, bucketWidth: Long = 100000L,
      persist: Boolean = true, maxDriverBuckets: Long = 1000000L): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(maxDriverBuckets > 0, "maxDriverBuckets must be positive")
    val bucket = floor(col(orderCol) / lit(bucketWidth)).cast("long")
    val in0 = df.withColumn("__bucket", bucket)
    val in = if (persist)
      in0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else in0
    val within = in.withColumn("__c",
      sum(col(valueCol)).over(
        Window.partitionBy(col("__bucket")).orderBy(col(orderCol))))
    val integral = within.schema("__c").dataType match {
      case org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    val spark = df.sparkSession
    val totalsDf = in.groupBy(col("__bucket"))
      .agg(sum(col(valueCol)).as("__t"))
    val probeCap = (math.min(maxDriverBuckets, Int.MaxValue - 2L) + 1).toInt
    val probe = totalsDf.limit(probeCap).collect()
    val offDf =
      if (probe.length < probeCap) broadcast(exclusiveOffsets(spark, probe, integral))
      else {
        // Two-level distributed offsets. Superbucket = value-derived
        // fold of the bucket id into ≤ maxDriverBuckets groups (dense
        // relative to [minB, maxB], deterministic under any layout).
        // Integral input accumulates in DECIMAL(38,0) end to end —
        // exact for any sum of Longs — and checked-casts the final
        // offset back to Long, so this path keeps the SAME
        // error-on-overflow guarantee as the driver path's
        // Math.addExact (a wrap cannot slip through silently).
        val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
        val totals0 = totalsDf
        val totals = (if (integral)
          totals0.withColumn("__t", col("__t").cast(d38))
        else totals0)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val mm = totals.agg(min(col("__bucket")), max(col("__bucket"))).head()
        val (minB, maxB) = (mm.getLong(0), mm.getLong(1))
        // ceil((span)/cap) without overflow; span ≥ cap here by the probe
        val fold = {
          val span = Math.subtractExact(maxB, minB) + 1L
          (span + maxDriverBuckets - 1L) / maxDriverBuckets
        }
        val sup = totals.withColumn("__sb",
          floor((col("__bucket") - lit(minB)) / lit(fold)).cast("long"))
        val zero = if (integral) lit(0L).cast(d38) else lit(0.0)
        val wExcl = Window.partitionBy(col("__sb")).orderBy(col("__bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val withinSup = sup.withColumn("__woff",
          coalesce(sum(col("__t")).over(wExcl), zero))
        val supTotals = sup.groupBy(col("__sb")).agg(sum(col("__t")).as("__t"))
          .collect() // ≤ maxDriverBuckets rows by construction
        val supOff =
          if (integral) exclusiveOffsetsDecimal(spark, supTotals)
            .withColumnRenamed("__bucket", "__sb")
            .withColumnRenamed("__off", "__soff")
          else exclusiveOffsets(spark, supTotals, integral = false)
            .withColumnRenamed("__bucket", "__sb")
            .withColumnRenamed("__off", "__soff")
        val offExpr = if (integral) {
          // exact decimal sum; try_cast nulls a Long overflow in both
          // ANSI modes, so the guard raises ONE clear error (both
          // operands are non-null by construction)
          val asLong = expr("try_cast(__osum AS BIGINT)")
          when(asLong.isNull,
            raise_error(lit("PrefixSum: running offset overflows Long"))
              .cast("long"))
            .otherwise(asLong)
        } else col("__osum")
        // materialize the (bucket-count-sized, two-column) offset
        // relation eagerly so the totals cache can be released NOW —
        // it stays distributed, never driver-collected
        val off = withinSup.join(broadcast(supOff), Seq("__sb"))
          .withColumn("__osum", col("__woff") + col("__soff"))
          .select(col("__bucket"), offExpr.as("__off"))
          .localCheckpoint()
        totals.unpersist()
        off
      }
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
      bucketWidth: Long = 100000L,
      maxDriverBuckets: Long = 1000000L): DataFrame = {
    require(budget > 0, "budget must be positive")
    val c = cumsum(df, orderCol, tokenCol, "__cum", bucketWidth,
      persist = true, maxDriverBuckets = maxDriverBuckets)
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
