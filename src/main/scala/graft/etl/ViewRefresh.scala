package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.sources.Warehouse

/** Partition-scoped maintenance of a materialized DENORMALIZED view
  * under dimension updates — the backfill problem every star schema
  * hits: an SCD1 attribute overwrite (a customer changes segment, a
  * product is re-categorized) invalidates the denormalized rows of
  * JUST the affected dim members, but a naive refresh rewrites the
  * whole view. Here the view is laid out partitioned by a BUCKET of
  * the dim key, so a dim delta maps to a bounded set of partitions:
  * recompute the join for those buckets only and swap them in with a
  * dynamic-partition overwrite ([[Warehouse.overwritePartitions]] —
  * the write replaces only the partitions present in the frame).
  * Readers of untouched partitions never see a file change
  * (ViewRefreshSpec asserts the untouched files are byte-identical
  * after a refresh).
  *
  * What is saved, honestly: the WRITE. c randomly-hashed changed keys
  * touch B·(1−(1−1/B)^c) of B buckets — ≈c buckets while c ≪ B, all
  * of them once c approaches B·ln B. The win case is the common small
  * delivery (correct one customer, a handful of late fixes): write
  * amplification drops from a full view rewrite to ~c/B of it, and it
  * degrades gracefully to a plain rewrite for bulk updates. The
  * refresh still SCANS one pass of the fact to recompute the affected
  * rows (prunable further only when the fact layout shares the bucket
  * key) — at 100 TB the saving is write bandwidth on (B−c)/B of the
  * view's parquet, which is the expensive half of a rewrite.
  *
  * The bucket count trades refresh granularity against small-file
  * pressure: more buckets → less over-rebuild per changed key but
  * more directories. Keys hash via `pmod(hash(key), n)` so skewed or
  * negative key domains spread evenly.
  */
object ViewRefresh {

  val BucketCol = "pbucket"

  /** The partition-bucket expression — MUST be identical at
    * materialize and refresh time, or a refresh writes rows into a
    * different partition than the stale copy it means to replace. */
  def bucketOf(key: Column, nBuckets: Int): Column =
    pmod(hash(key), lit(nBuckets))

  /** Initial build: the view rows, laid out by dim-key bucket. */
  def materialize(view: DataFrame, key: Column, nBuckets: Int,
      path: String): Unit =
    withBucket(view, key, nBuckets)
      .write.partitionBy(BucketCol).mode("overwrite").parquet(path)

  /** Co-bucketed SOURCE layout: write a fact (or any view input)
    * partitioned by the bucket of ITS copy of the dim key — the same
    * `pmod(hash(key), n)` as the view layout. A view built from this
    * layout carries `pbucket` from the scan through the join, so
    * [[refresh]]'s bucket filter lands on the source scan as a
    * PARTITION filter: the refresh then READS ~c/B of the fact
    * instead of scanning it all and discarding (B−c)/B post-join —
    * the scan-side half of the write-amplification win documented
    * above, and the one that dominates at 100 TB. */
  def materializeSource(fact: DataFrame, factKey: Column, nBuckets: Int,
      path: String): Unit =
    fact.withColumn(BucketCol, bucketOf(factKey, nBuckets))
      .write.partitionBy(BucketCol).mode("overwrite").parquet(path)

  /** The view frame with its bucket column: REUSED when the caller
    * already carries [[BucketCol]] (from a [[materializeSource]]
    * layout — that provenance is what turns the refresh filter into
    * partition pruning; recomputing here would shadow it with a
    * post-join expression), derived from `key` otherwise. A carried
    * column MUST equal `bucketOf(key, nBuckets)` row-for-row — it
    * does by construction when it is the source layout's partition
    * column over the same key and count; anything else mis-partitions
    * the view (the [[bucketOf]] contract). */
  private def withBucket(view: DataFrame, key: Column,
      nBuckets: Int): DataFrame =
    if (view.columns.contains(BucketCol)) view
    else view.withColumn(BucketCol, bucketOf(key, nBuckets))

  /** The partitions a dim delta invalidates: distinct buckets of the
    * changed keys. Bounded by nBuckets (a driver-side list the size of
    * the partition count, never the key count). */
  def affectedBuckets(changedKeys: DataFrame, key: Column,
      nBuckets: Int): Seq[Int] =
    changedKeys.select(bucketOf(key, nBuckets).as(BucketCol)).distinct()
      .collect().map(_.getInt(0)).sorted.toSeq

  /** Refresh: recompute `view` (already joined against the UPDATED
    * dimension) restricted to the affected buckets, and overwrite only
    * those partitions. The filter on the freshly-computed bucket
    * column prunes the fact scan too when the view source is itself
    * bucket-partitioned.
    *
    * DELETION correctness: dynamic-partition overwrite only replaces
    * partitions PRESENT in the written frame — an affected bucket
    * whose recomputed content is now EMPTY (its only member was
    * deleted / dropped by the view's inner join) would silently keep
    * its stale files. Those buckets are detected (one distinct over
    * the already-bucket-filtered rows, bounded by nBuckets) and their
    * partition directories deleted explicitly.
    *
    * Reader isolation caveat: the emptied-partition delete (and the
    * dynamic overwrite itself) are file-level swaps, NOT the
    * rename-swap publish used elsewhere — a reader scanning a
    * replaced partition mid-refresh can see missing-file errors or a
    * stale-then-vanishing directory. Same isolation level as any
    * dynamic-partition overwrite; route through a
    * [[graft.sources.Warehouse.publish]]-style rebuild when readers
    * are concurrent with refreshes. */
  def refresh(view: DataFrame, key: Column, nBuckets: Int,
      buckets: Seq[Int], path: String): Unit = {
    val spark = view.sparkSession
    // pinned across the write and the bucket census: recomputing the
    // view for the census would double the refresh's join work, and
    // reading the census from the table AFTER the write would see the
    // stale partition it exists to detect
    val scoped = withBucket(view, key, nBuckets)
      .filter(col(BucketCol).isin(buckets: _*))
      .persist()
    try {
      // a CARRIED bucket column is a trust-but-verify contract: a
      // layout bucketed on a different key or count would silently
      // swap the WRONG partitions. Verify on the scoped rows (already
      // persisted, affected-buckets-sized — not a fact scan): any row
      // whose carried bucket disagrees with bucketOf(key, nBuckets)
      // proves a mismatched layout, and refreshing from it corrupts
      // the view — fail loudly instead.
      if (view.columns.contains(BucketCol)) {
        val bad = scoped
          .filter(col(BucketCol) =!= bucketOf(key, nBuckets)).count()
        require(bad == 0,
          s"carried $BucketCol column disagrees with bucketOf(key, " +
            s"$nBuckets) on $bad scoped rows — the source layout was " +
            "bucketed on a different key or bucket count")
      }
      Warehouse.overwritePartitions(scoped, path, Seq(BucketCol))
      val written = scoped.select(col(BucketCol)).distinct()
        .collect().map(_.getInt(0)).toSet
      val emptied = buckets.filterNot(written)
      if (emptied.nonEmpty) {
        val fs = new org.apache.hadoop.fs.Path(path)
          .getFileSystem(spark.sessionState.newHadoopConf())
        emptied.foreach { b =>
          fs.delete(new org.apache.hadoop.fs.Path(s"$path/$BucketCol=$b"),
            true): Unit
        }
      }
    } finally scoped.unpersist(): Unit
  }
}
