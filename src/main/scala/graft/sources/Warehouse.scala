package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Warehouse table layout: bucketed, sorted, optionally partitioned
  * parquet tables registered in the session catalog.
  *
  * This is the scale answer to "co-locate the big joins": two tables
  * bucketed by the same key into the same bucket count join with NO
  * exchange on either side (SortMergeJoin reads bucket i against bucket
  * i directly). At 100 TB, bucketing the fact tables by their join key
  * once at write time removes the dominant shuffle from every
  * subsequent query. The reference's warehouse (plain PostgreSQL heap
  * tables, `docker-compose.yaml:3-18`) has no analog — this is free
  * Spark capability surfaced as a first-class layout policy.
  */
object Warehouse {

  /** Marker segment of a DISPLACED directory mid-publish: the old
    * version of `p` moves aside as `.<name>.old-<uuid>` during
    * [[installBuilt]]'s rename-swap. ONE definition — the stale
    * sweeps in [[commitVia]] and [[graft.etl.ViewRefresh]] match on
    * it, so a rename here must not be able to strand their debris. */
  private[graft] val OldTag = ".old-"

  private[graft] def displacedPrefix(name: String): String =
    s".$name$OldTag"

  /** Write `df` as a bucketed (and optionally date/id-partitioned)
    * parquet table. `sortBy` the bucket key so bucket files are
    * merge-join-ready without a per-query sort. */
  def writeBucketed(df: DataFrame, table: String, path: String,
      bucketKey: String, buckets: Int,
      partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, bucketKey)
      .sortBy(bucketKey)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Range-clustered parquet layout — the data-skipping policy for
    * scan-heavy range predicates (event time, ship date, doc id).
    * `repartitionByRange` gives each output file a DISJOINT value
    * range on the cluster keys, so parquet min/max footer stats let a
    * range filter skip whole files/row groups without reading them:
    * at 100 TB a one-week predicate over a year of date-clustered data
    * reads ~2% of the files. The in-file sort tightens per-row-group
    * stats and keeps downstream merge-ish consumers cheap.
    *
    * This is Z-ordering's single/prefix-key special case — exact, with
    * no interleaving machinery, and the right default when one key
    * dominates the scan predicates (multi-key locality trades range
    * tightness for breadth; see the Delta/Iceberg OPTIMIZE literature).
    * Skipping effectiveness is asserted in WarehouseSpec via scan
    * metrics (rows actually read), not plan text — the pruning happens
    * inside the parquet reader, invisible to the plan.
    *
    * Key-type caveat (measured on Spark 4.1): TIMESTAMP_NTZ predicates
    * are listed under PushedFilters but the parquet reader does NOT
    * stat-skip row groups for them — integral, DATE and (LTZ)
    * timestamp keys skip as expected. Cluster on a DATE / epoch-int
    * derivation of an NTZ event time, not the raw column. */
  def writeClustered(df: DataFrame, path: String,
      clusterCols: Seq[String], files: Int): Unit = {
    require(clusterCols.nonEmpty && files > 0,
      "need at least one cluster column and one output file")
    import org.apache.spark.sql.functions.col
    df.repartitionByRange(files, clusterCols.map(col): _*)
      .sortWithinPartitions(clusterCols.map(col): _*)
      .write.mode("overwrite")
      .option("compression", "snappy").parquet(path)
  }

  /** Z-ordered parquet layout — [[writeClustered]]'s multi-key
    * sibling for workloads where ANY of 2–3 columns appears in scan
    * predicates. The Morton key build is
    * [[graft.operators.ZOrder.zValueN]] — the ONE Morton
    * implementation in the engine (exact-BIGINT 16-bit normalize +
    * bit interleave, oracle-covered by q199/q200, overflow-guarded
    * for wide domains) — and range-partitioning that 1-D key tiles
    * the k-D value space: every output file covers a box, so its
    * parquet min/max stats are tight on EVERY key and a range
    * predicate on any one of them skips most files. 1-D clustering
    * gives ~no skipping beyond its own key — the measured contrast
    * is in WarehouseSpec.
    *
    * Keys must be integral (or integral-derived — epoch ints for
    * timestamps, same caveat as [[writeClustered]]'s NTZ note): the
    * normalization is exact integer arithmetic, reproducible in any
    * engine. The Morton key is dropped before writing — skipping
    * reads the data columns' own stats, so readers need no knowledge
    * of the layout. */
  def writeZOrdered(df: DataFrame, path: String, cols: Seq[String],
      files: Int): Unit = {
    require(files > 0, "need at least one output file")
    require(cols.size >= 2 && cols.size <= 3,
      s"z-order needs 2-3 key columns, got ${cols.size} (use " +
        "writeClustered for one key)")
    import org.apache.spark.sql.functions.col
    df.withColumn("__z", graft.operators.ZOrder.zValueN(df, cols))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite")
      .option("compression", "snappy").parquet(path)
  }

  /** Two-key convenience overload. */
  def writeZOrdered(df: DataFrame, path: String, colA: String,
      colB: String, files: Int): Unit =
    writeZOrdered(df, path, Seq(colA, colB), files)

  /** Compact a parquet directory's small files in place — the
    * maintenance half of any incremental-append story (streaming
    * sinks, [[graft.etl.SurrogateKeys.dimAppend]]-style accretion):
    * thousands of kilobyte files turn listing, footer reads and task
    * scheduling into the scan bottleneck long before data volume
    * does. One rewrite into ceil(bytes/target) files, published with
    * the same atomic rename-swap as [[cached]] — a concurrent reader
    * sees the old layout or the new one, never a partial directory.
    * Returns the new data-file count. */
  def compact(spark: SparkSession, path: String,
      targetFileBytes: Long): Int = {
    require(targetFileBytes > 0, "target file size must be positive")
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val dataFiles = fs.listStatus(p).filter { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
    val totalBytes = dataFiles.map(_.getLen).sum
    val n = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    // the rewrite reads the CURRENT layout while writing the temp dir;
    // the source stays intact until the post-write rename swap
    val df = spark.read.parquet(path)
    commitVia(fs, p) { tmp =>
      df.repartition(n).write.mode("overwrite")
        .option("compression", "snappy").parquet(tmp)
    }
    n
  }

  /** Join two same-bucketed catalog tables on the bucket key — with
    * matching bucket specs Spark plans a SortMergeJoin with no
    * Exchange. Callers can assert that with [[hasShuffle]]. */
  def colocatedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, leftKey: String, rightKey: String): DataFrame = {
    // bind each table once: the join condition must reference the SAME
    // Dataset instances being joined (fresh spark.table() calls only
    // resolve via the catalog's relation cache, which can invalidate)
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }

  /** Layout-quality report: per-file min/max/count for the given
    * columns — quantifies how well a layout supports data skipping
    * (disjoint per-file ranges = every range predicate prunes;
    * overlapping ranges = the scan touches everything regardless of
    * row-group stats). Run it after [[writeClustered]] /
    * [[writeZOrdered]] / [[compact]] to see what the rewrite bought,
    * or on a suspect table to explain why pruning is not happening.
    * One scan with map-side aggregation on `input_file_name` (honest
    * about reading the data; footer-only stats need no engine help —
    * `parquet-tools meta` — but can't see live session state).
    *
    * `overlapFraction`: for each column, the fraction of file pairs
    * whose [min, max] ranges intersect — 0.0 is a perfectly clustered
    * layout, ~1.0 is unclustered. Computed on the files-sized report,
    * driver-local. */
  def layoutReport(spark: SparkSession, path: String,
      cols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    require(cols.nonEmpty, "need at least one column")
    val df = spark.read.parquet(path)
    val aggs = cols.flatMap { c =>
      Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"))
    } :+ count(lit(1)).as("rows")
    df.groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Pairwise range-overlap fraction per column over a
    * [[layoutReport]] result (files-sized — driver math). */
  def overlapFraction(report: DataFrame, c: String): Double = {
    import org.apache.spark.sql.functions._
    // A file whose column is all-NULL has null min/max stats — it can
    // never overlap anything, so it drops out of the pair count too.
    val ranges = report.select(col(s"${c}_min").cast("double"),
        col(s"${c}_max").cast("double"))
      .collect()
      .filter(r => !r.isNullAt(0) && !r.isNullAt(1))
      .map(r => (r.getDouble(0), r.getDouble(1)))
    val n = ranges.length
    if (n < 2) return 0.0
    var overlapping = 0
    for (i <- 0 until n; j <- (i + 1) until n) {
      if (ranges(i)._1 <= ranges(j)._2 && ranges(j)._1 <= ranges(i)._2)
        overlapping += 1
    }
    overlapping.toDouble / (n.toLong * (n - 1) / 2).toDouble
  }

  /** Dynamic-partition overwrite: write `df` partitioned by
    * `partitionCols`, replacing ONLY the partitions present in `df` —
    * the incremental-backfill staple (re-run one day without touching
    * the other 3,650). Plain `mode(overwrite)` + `partitionBy` would
    * TRUNCATE THE WHOLE TABLE first (static mode, Spark's default) —
    * the classic destroyed-warehouse footgun this wrapper exists to
    * make impossible: the dynamic mode is set on THIS write only, not
    * session-wide. Readers of untouched partitions are unaffected;
    * readers of a replaced partition see the usual file-level swap
    * (for stronger isolation, write to a new path and [[publish]]). */
  def overwritePartitions(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit = {
    require(partitionCols.nonEmpty, "need at least one partition column")
    df.write
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** Public face of [[commitVia]]: build a new version of `path` in a
    * hidden temp sibling via `writeTo`, publish by atomic rename-swap.
    * The snapshot-maintenance primitive for anything that rewrites a
    * directory a reader may be scanning (streaming MERGE, compaction,
    * index rebuilds). */
  def publish(spark: SparkSession, path: String)(writeTo: String => Unit): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    commitVia(fs, p)(writeTo)
  }

  /** Build into a hidden temp sibling, then PUBLISH by rename — rename
    * is atomic on a real filesystem, so a concurrent reader either sees
    * the old committed dir (its already-open files survive the unlink,
    * POSIX semantics) or the complete new one, never a half-written
    * rebuild deleting files out from under a running scan (the hazard
    * of in-place `mode("overwrite")`). Stale temp dirs from crashed
    * builds are swept before each build. */
  private def commitVia(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path)(writeTo: String => Unit): Unit = {
    val parent = p.getParent
    fs.mkdirs(parent)
    val tmpPrefix = s".${p.getName}.tmp-"
    val oldPrefix = displacedPrefix(p.getName)
    // sweep only scratch dirs OLDER than a day: a fresh .tmp- may be a
    // concurrent builder mid-write — deleting it under them fails their
    // commit with an opaque error. The horizon must exceed any
    // plausible build duration (a dir's mtime is ~its creation time for
    // most of a long write), so it is generous; crashed builds (.tmp-)
    // and interrupted publishes (.old-) age past it eventually.
    val staleBefore = System.currentTimeMillis() - 24L * 60 * 60 * 1000
    fs.listStatus(parent)
      .filter { st =>
        val n = st.getPath.getName
        (n.startsWith(tmpPrefix) || n.startsWith(oldPrefix)) &&
          st.getModificationTime < staleBefore
      }
      .foreach(st => fs.delete(st.getPath, true))
    val tmp = new org.apache.hadoop.fs.Path(parent,
      tmpPrefix + java.util.UUID.randomUUID().toString)
    writeTo(tmp.toString)
    installBuilt(fs, p, tmp)
  }

  /** Atomically install an ALREADY-BUILT directory at `p` — the
    * rename-swap tail of [[commitVia]], exposed for callers that build
    * several sibling directories in one job and then swap each in
    * (per-partition publish, [[graft.etl.ViewRefresh]]'s isolated
    * refresh). `tmp` must be on the same filesystem as `p`; it is
    * consumed by the swap. */
  private[graft] def installBuilt(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path, tmp: org.apache.hadoop.fs.Path): Unit = {
    val parent = p.getParent
    // publish by RENAME-SWAP, not delete-then-rename: the old dir moves
    // aside in one atomic rename and the new one moves in with the
    // next, so the no-directory window is two metadata ops, not a
    // recursive delete; the displaced dir is removed last (open readers
    // of its files survive the unlink, POSIX semantics)
    val old = new org.apache.hadoop.fs.Path(parent,
      displacedPrefix(p.getName) + java.util.UUID.randomUUID().toString)
    val existed = fs.exists(p)
    val hadOld = existed && fs.rename(p, old)
    // a failed move-aside means another publisher won the race. FAIL
    // LOUDLY: proceeding would hit Hadoop's rename-into-existing-dir
    // semantics — tmp would nest INSIDE the winner's published dir,
    // "succeed", and silently discard this build
    if (existed && !hadOld && fs.exists(p))
      throw new java.io.IOException(
        s"concurrent publish detected at $p — this build is abandoned")
    if (!fs.rename(tmp, p))
      throw new java.io.IOException(s"failed to publish $tmp -> $p")
    // post-check for the narrower race (p re-created between our
    // move-aside and publish): rename-into-existing-dir "succeeds" by
    // NESTING tmp under p — detect and fail rather than serve a dir
    // that isn't this build
    val nested = new org.apache.hadoop.fs.Path(p, tmp.getName)
    if (fs.exists(nested)) {
      fs.delete(nested, true)
      throw new java.io.IOException(
        s"concurrent publish detected at $p — this build was nested and removed")
    }
    if (hadOld) fs.delete(old, true)
  }

  /** Keyed dataset cache — the reference's parquet cache probe
    * (`machineLearning.py:132-150`: skip the DB if the cache file for
    * this table-set key exists; `force_reload` bypasses). `build` runs
    * only on a miss; the result is always served from parquet so the
    * caller gets identical plans on hit and miss. */
  def cached(spark: SparkSession, path: String, forceReload: Boolean = false)
      (build: => DataFrame): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    // probe the _SUCCESS commit marker, not the bare directory: a build
    // that died mid-write leaves a partial dir that a bare exists()
    // would serve as a valid cache forever
    val committed = fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS"))
    if (forceReload || !committed)
      commitVia(fs, p) { tmp =>
        build.write.mode("overwrite")
          .option("compression", "snappy").parquet(tmp)
      }
    spark.read.parquet(path)
  }

  /** [[cached]] with a partitioned layout: the build result is written
    * `partitionBy(partitionCols)` so readers filtering on those columns
    * prune directories at planning time (PartitionFilters on the scan).
    * This is the persistence layer of the ANN indexes
    * (`Similarity.buildAnnIndex`/`buildIvfIndex`). */
  def cachedPartitioned(spark: SparkSession, path: String,
      partitionCols: Seq[String], forceReload: Boolean = false)
      (build: => DataFrame): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val committed = fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS"))
    if (forceReload || !committed)
      commitVia(fs, p) { tmp =>
        build.write.mode("overwrite")
          .partitionBy(partitionCols: _*)
          .option("compression", "snappy").parquet(tmp)
      }
    spark.read.parquet(path)
  }

  /** True if the executed plan contains a shuffle exchange (bucketed
    * co-located joins must not). */
  def hasShuffle(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }.nonEmpty
}
