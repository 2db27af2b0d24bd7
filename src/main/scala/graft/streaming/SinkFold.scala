package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lifecycle compaction for DATA-ONLY `foreachBatch` parquet sinks —
  * sinks whose idempotence contract is "each batch overwrites its own
  * `batch_id=N/` directory" (the as-of enrichment sink's shape). Every
  * commit adds one small parquet directory; after 10,000 micro-batches
  * a downstream reader pays a many-small-files listing/footer tax that
  * has nothing to do with data volume. [[fold]] rewrites committed
  * batch partitions into one size-targeted `gen=K` generation; earlier
  * generations are never re-folded (re-folding would make cumulative
  * rewrite cost quadratic in sink size), so the live directory count
  * after C folds of N-batch windows is C + in-flight, not
  * total-batches.
  *
  * This is [[DocStream.compactSink]]'s crash-safety protocol minus the
  * signature twin and minus markers (kept separate because the paired
  * data+`_sig` fold has genuinely different pairing/GC obligations):
  *  1. folded rows are written under an underscore temp dir
  *     (invisible to parquet readers);
  *  2. `gen=K` publishes by ONE rename, carrying a `_folded` manifest
  *     naming its superseded sources — "gen visible" and "sources
  *     superseded" are a single atomic event, so a crash between
  *     publish and source deletion can never double-count;
  *  3. sources are deleted; a crash before this is repaired by the
  *     next call's GC (which deletes manifested sources and temp
  *     debris).
  *
  * Committedness needs no marker here: micro-batches run serially, so
  * when batch M executes, every `batch_id<M` partition has a committed
  * checkpoint and can never replay — [[fold]] takes that bound as
  * `beforeBatchId` and leaves the in-flight partition alone, keeping
  * the overwrite-own-partition replay contract intact. */
object SinkFold {

  import Manifests.{readManifest, dirsIn}

  /** Live partitions: `gen=K` generations plus the `batch_id=N`
    * directories no generation's manifest has superseded. */
  def parts(spark: SparkSession, sinkDir: String): Seq[Path] = {
    val base = new Path(sinkDir)
    val fs = base.getFileSystem(spark.sessionState.newHadoopConf())
    val dirs = dirsIn(fs, base)
    val gens = dirs.filter(_.getName.startsWith("gen="))
    val folded = gens.flatMap(readManifest(fs, _)).toSet
    gens.sortBy(_.getName) ++ dirs
      .filter(p => p.getName.startsWith("batch_id=") &&
        !folded.contains(p.getName))
  }

  /** The sink as one batch relation (empty on an empty/absent sink).
    * Explicit path-list read: a sink holding both `gen=` and
    * `batch_id=` directories would break naive partition discovery. */
  def read(spark: SparkSession, sinkDir: String,
      schemaFrom: DataFrame): DataFrame = {
    val ps = parts(spark, sinkDir)
    if (ps.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        schemaFrom.schema)
    else spark.read.schema(schemaFrom.schema)
      .parquet(ps.map(_.toString): _*)
  }

  /** Fold committed (`batch_id < beforeBatchId`) partitions into a new
    * generation. Returns its id, or None when fewer than `minBatches`
    * qualify. Runs GC for earlier crashed folds first, so calling it
    * is always safe. */
  def fold(spark: SparkSession, sinkDir: String, schemaFrom: DataFrame,
      beforeBatchId: Long, minBatches: Int = 2,
      targetFileBytes: Long = 128L * 1024 * 1024): Option[Long] = {
    require(minBatches >= 1, "minBatches must be >= 1")
    val base = new Path(sinkDir)
    val fs = base.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(base)) return None
    // GC: finish any fold that crashed between publish and source
    // deletion, drop temp debris
    val gens = dirsIn(fs, base).filter(_.getName.startsWith("gen="))
    gens.foreach(g =>
      readManifest(fs, g).foreach(n => fs.delete(new Path(base, n), true)))
    dirsIn(fs, base).filter(_.getName.startsWith("_tmp_gen"))
      .foreach(fs.delete(_, true))
    val committed = dirsIn(fs, base)
      .filter { p =>
        val n = p.getName
        n.startsWith("batch_id=") &&
          n.stripPrefix("batch_id=").toLong < beforeBatchId
      }
    if (committed.size < minBatches) return None
    val genId = gens.map(_.getName.stripPrefix("gen=").toLong)
      .foldLeft(-1L)(math.max) + 1L
    val totalBytes = committed.map(fs.getContentSummary(_).getLength).sum
    val nFiles = math.max(1L,
      (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    val tmp = new Path(base, s"_tmp_gen_$genId")
    spark.read.schema(schemaFrom.schema)
      .parquet(committed.map(_.toString): _*)
      .repartition(nFiles).write.mode("overwrite")
      .option("compression", "snappy").parquet(tmp.toString)
    Manifests.writeManifest(fs, tmp, committed.map(_.getName))
    // checked publish: a false-returning rename followed by the source
    // deletes below would be silent data loss (Manifests.renameOrFail)
    Manifests.renameOrFail(fs, tmp, new Path(base, s"gen=$genId"))
    committed.foreach(fs.delete(_, true))
    Some(genId)
  }
}
