package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lifecycle compaction for DATA-ONLY `foreachBatch` parquet sinks —
  * sinks whose idempotence contract is "each batch overwrites its own
  * `batch_id=N/` directory" (the as-of enrichment sink's shape). Every
  * commit adds one small parquet directory; after 10,000 micro-batches
  * a downstream reader pays a many-small-files listing/footer tax that
  * has nothing to do with data volume. [[fold]] rewrites committed
  * batch partitions into one size-targeted `gen=K` generation, and
  * generations themselves fold SIZE-TIERED: once the live-generation
  * count would exceed `maxGenerations`, the fold absorbs the SMALLEST
  * ⌈maxGenerations/2⌉ live generations by content bytes, so live
  * directories stay bounded by `maxGenerations` + in-flight for the
  * sink's whole lifetime while each row is rewritten only O(log N)
  * times — generation sizes stratify geometrically, exactly like
  * LSM size-tiered compaction (the alternative extremes are unbounded
  * directory accretion and the quadratic absorb-everything shape).
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

  import Manifests.{readManifest, dirsIn, partId}

  /** Live partitions: `gen=K` generations plus the `batch_id=N`
    * directories no generation's manifest has superseded. Names are
    * matched STRICTLY (`batch_id=<digits>` / `gen=<digits>`): a stray
    * `batch_id=3.bak` copy is not a partition and must neither be
    * read nor crash a fold's id parse. */
  def parts(spark: SparkSession, sinkDir: String): Seq[Path] = {
    val base = new Path(sinkDir)
    val fs = base.getFileSystem(spark.sessionState.newHadoopConf())
    val dirs = dirsIn(fs, base)
    val gens = dirs.filter(p => partId(p.getName, "gen=").isDefined)
    val folded = gens.flatMap(readManifest(fs, _)).toSet
    // a generation superseded by a tiered fold is excluded exactly
    // like a folded batch — its rows live in the newer generation
    gens.filter(g => !folded.contains(g.getName))
      .sortBy(p => partId(p.getName, "gen=").get) ++ dirs
      .filter(p => partId(p.getName, "batch_id=").isDefined &&
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
      targetFileBytes: Long = 128L * 1024 * 1024,
      maxGenerations: Int = 8): Option[Long] = {
    require(minBatches >= 1, "minBatches must be >= 1")
    require(maxGenerations >= 1, "maxGenerations must be >= 1")
    val base = new Path(sinkDir)
    val fs = base.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(base)) return None
    // GC: finish any fold that crashed between publish and source
    // deletion, drop temp debris. A manifested source is deleted ONLY
    // if its modification time predates its generation's — a fold
    // writes the generation AFTER reading its sources, so genuine
    // crash debris always satisfies this, while a `batch_id=N`
    // directory REWRITTEN after the fold (a sink wrongly reused with
    // a fresh checkpoint, whose batch ids restart at 0) holds fresh
    // data the old manifest must not reap. That misuse is still
    // outside the contract — reads would hide the colliding names as
    // superseded — a compacted sink must never be paired with a new
    // checkpoint; the guard just downgrades the failure from silent
    // data DELETION to a visible stale read.
    val gens = dirsIn(fs, base).filter(p => partId(p.getName, "gen=").isDefined)
    // each generation's manifest is read ONCE and reused for both the
    // GC worklist and the folded-exclusion set (on object-store sinks
    // every manifest open is a round trip)
    val manifests = gens.map(g => g -> readManifest(fs, g))
    manifests.foreach { case (g, names) =>
      val genMtime = fs.getFileStatus(g).getModificationTime
      names.foreach { n =>
        val src = new Path(base, n)
        if (fs.exists(src) &&
            fs.getFileStatus(src).getModificationTime <= genMtime)
          fs.delete(src, true)
      }
    }
    dirsIn(fs, base).filter(_.getName.startsWith("_tmp_gen"))
      .foreach(fs.delete(_, true))
    val folded = manifests.iterator.flatMap(_._2).toSet
    val committed = dirsIn(fs, base)
      .filter(p => !folded.contains(p.getName) &&
        partId(p.getName, "batch_id=").exists(_ < beforeBatchId))
    if (committed.size < minBatches) return None
    // size-tiered trigger: publishing one more generation past the
    // bound absorbs the smallest ⌈maxGenerations/2⌉ live generations
    // by bytes into this fold (Manifests.tierSources — one policy
    // implementation for both sinks)
    val liveGens = gens.filterNot(g => folded.contains(g.getName))
    val tiered = Manifests.tierSources(fs, liveGens, maxGenerations)
    val sources = committed ++ tiered.map(_._1)
    val genId = gens.flatMap(p => partId(p.getName, "gen="))
      .foldLeft(-1L)(math.max) + 1L
    val totalBytes = committed.map(fs.getContentSummary(_).getLength).sum +
      tiered.map(_._2).sum
    val nFiles = math.max(1L,
      (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    val tmp = new Path(base, s"_tmp_gen_$genId")
    spark.read.schema(schemaFrom.schema)
      .parquet(sources.map(_.toString): _*)
      .repartition(nFiles).write.mode("overwrite")
      .option("compression", "snappy").parquet(tmp.toString)
    Manifests.writeManifest(fs, tmp, sources.map(_.getName))
    // checked publish: a false-returning rename followed by the source
    // deletes below would be silent data loss (Manifests.renameOrFail)
    Manifests.renameOrFail(fs, tmp, new Path(base, s"gen=$genId"))
    sources.foreach(fs.delete(_, true))
    Some(genId)
  }
}
