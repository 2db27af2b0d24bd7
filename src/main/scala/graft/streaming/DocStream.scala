package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.dedup.Dedup

/** Streaming document ingestion with online near-duplicate rejection —
  * the continuous face of the batch curation stack: documents arrive
  * as files, each micro-batch drops its own near-dups and everything
  * near-duplicate to the ALREADY-ACCEPTED corpus, and survivors land
  * as the accepted corpus itself (sink = index: no second store to
  * keep consistent).
  *
  * Dedup semantics are GREEDY FIRST-WINS — the online policy every
  * production ingest runs: per batch, documents near-duplicate to the
  * accepted corpus are rejected FIRST, then the survivors dedup among
  * themselves (keep-min-id connected components). Cross-first order
  * matters: a doomed row must not act as an in-batch cluster keeper
  * and take fresh rows down with it. This differs from offline
  * connected-component dedup exactly on CHAINS (a–b, b–c, no a–c)
  * once a and c are separated from b's verdict: offline drops c
  * transitively; online accepts c because b was never admitted — a
  * real and documented divergence. On pair/triangle-shaped dup graphs
  * the two agree (q184 exploits that: its fixture graph is pairs +
  * one triangle, so the REAL stream replays against the offline SQL
  * oracle).
  *
  * Scale shape, per micro-batch: in-batch MinHash-LSH near-dup
  * (shuffle = batch × bands sketches), then ONE cross-corpus LSH join
  * batch × accepted SIGNATURES: each committed batch persists its
  * banded MinHash buckets and shingle sets under `_sig/batch_id=N/`
  * ([[Dedup.nearDupSignatures]]); the folded generations' candidate
  * face is answered by an executor-resident [[graft.dedup.BandIndex]]
  * built once per fold epoch, fresh batch partitions (≤ compactEvery)
  * ride beside it lazily, and the exact-verify fetch is a collected
  * `IN(id)` pushed into the bloom + id-sorted signature store
  * ([[Dedup.crossNearDupPairsVsSignaturesIndexed]]) — the accepted
  * TEXT is never re-read, never re-shingled, and the stored face is
  * never SCANNED per batch, so per-batch cost is O(batch × bands +
  * matched candidates), not O(accepted). State is the accepted
  * PARQUET (plus the rebuildable in-memory index), not a state store
  * — restarts are free.
  *
  * Exactly-once: foreachBatch is at-least-once, so each batch writes
  * its own `batch_id=N/` partition (then its `_sig/batch_id=N/`
  * signatures) AND a marker under `_applied/`; a replayed batch
  * short-circuits on the marker. A replay that crashed AFTER the
  * partition write but BEFORE the marker recomputes with its own
  * `batch_id=N` partition EXCLUDED from the accepted corpus — without
  * that exclusion every row would self-match against its own earlier
  * output and the replay would land an empty partition (silent data
  * loss). With it, a replay is bit-identical to the first attempt:
  * batches run serially, so at most one uncommitted partition can
  * exist, and it is the one being replayed. */
object DocStream {

  // manifest format, reader/writer, listing, and the checked publish
  // rename are shared with SinkFold — see Manifests (one
  // implementation; the fold POLICIES differ and stay here)
  import Manifests.{readManifest, partId}

  /** Accepted data partitions: compacted `gen=K` directories plus the
    * `batch_id=N` directories no generation has folded (each gen's
    * [[Manifests.FoldedManifest]] names its superseded sources — see there for
    * the crash-window argument). `excludeBatchId` drops that batch's
    * own partition — replay idempotence (see object doc); a replayable
    * (uncommitted) batch is by construction never folded, so the
    * exclusion only ever applies to a live `batch_id=` directory. */
  private def batchParts(spark: SparkSession, base: Path,
      excludeBatchId: Option[Long]): Seq[Path] = {
    val fs = base.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(base)) Seq.empty
    else {
      val dirs = fs.listStatus(base).filter(_.isDirectory).map(_.getPath)
      val gens = dirs.filter(p =>
        partId(p.getName, "gen=").isDefined).toIndexedSeq
      val folded = gens.flatMap(readManifest(fs, _)).toSet
      val skip = excludeBatchId.map(id => s"batch_id=$id").toSet ++ folded
      // a generation can itself be superseded (tiered folding names
      // source GENERATIONS in the new generation's manifest) — the
      // same exclusion that hides folded batches hides folded gens
      gens.filter(g => !folded.contains(g.getName))
        .sortBy(p => partId(p.getName, "gen=").get) ++ dirs.toIndexedSeq
        .filter(p => partId(p.getName, "batch_id=").isDefined &&
          !skip.contains(p.getName))
    }
  }

  /** Accepted corpus so far: the union of committed batch partitions
    * (underscore paths are invisible to the parquet reader). None
    * before the first commit. `excludeBatchId` drops that batch's own
    * partition — replay idempotence (see object doc). */
  private def acceptedSoFar(spark: SparkSession, sinkDir: String,
      schemaFrom: DataFrame,
      excludeBatchId: Option[Long] = None): Option[DataFrame] = {
    val parts = batchParts(spark, new Path(sinkDir), excludeBatchId)
    if (parts.isEmpty) None
    else Some(spark.read.schema(schemaFrom.schema)
      .parquet(parts.map(_.toString): _*))
  }

  /** The accepted corpus's signature relation, split along the index
    * boundary: `all` is the whole store (the exact-verify fetch face,
    * and everything the non-indexed paths need); `genSigDirs` are the
    * live folded-generation `_sig/gen=K` directories — the IMMUTABLE
    * majority a [[graft.dedup.BandIndex]] is built over (they change
    * only at folds, so the build amortizes across a fold epoch);
    * `fresh` is the remainder the index does not cover — per-batch
    * `_sig/batch_id=N` partitions (bounded by compactEvery) plus any
    * legacy partition missing its signature twin, whose signatures are
    * recomputed from text once here (a migration cost, not steady
    * state). Invariant: `all` rows = generation rows ∪ `fresh` rows,
    * disjoint — exactly the contract
    * [[Dedup.crossNearDupPairsVsSignaturesIndexed]] requires. */
  private final case class SigFaces(all: DataFrame, genSigDirs: Seq[Path],
      genRel: Option[DataFrame], fresh: Option[DataFrame])

  private def acceptedSigFaces(spark: SparkSession, sinkDir: String,
      schemaFrom: DataFrame, idCol: String, textCol: String,
      excludeBatchId: Option[Long]): Option[SigFaces] = {
    val accParts = batchParts(spark, new Path(sinkDir), excludeBatchId)
    if (accParts.isEmpty) None
    else {
      val sigBase = new Path(s"$sinkDir/_sig")
      val sigNames = batchParts(spark, sigBase, excludeBatchId)
        .map(_.getName).toSet
      val (withSig, legacy) =
        accParts.partition(p => sigNames.contains(p.getName))
      val (genWithSig, batchWithSig) =
        withSig.partition(p => partId(p.getName, "gen=").isDefined)
      val genSigDirs = genWithSig.map(p => new Path(sigBase, p.getName))
      val genRel = Option(genSigDirs).filter(_.nonEmpty).map(ps =>
        spark.read.parquet(ps.map(_.toString): _*))
      val batchRel = Option(batchWithSig).filter(_.nonEmpty).map(ps =>
        spark.read.parquet(ps.map(p => s"$sigBase/${p.getName}"): _*))
      val legacyRel = Option(legacy).filter(_.nonEmpty).map(ps =>
        Dedup.nearDupSignatures(
          spark.read.schema(schemaFrom.schema).parquet(ps.map(_.toString): _*),
          idCol, textCol))
      val fresh = (batchRel, legacyRel) match {
        case (Some(a), Some(b)) => Some(a.unionByName(b))
        case (a, b) => a.orElse(b)
      }
      val all = (genRel, fresh) match {
        case (Some(a), Some(b)) => a.unionByName(b)
        case (a, b) => a.orElse(b).get
      }
      Some(SigFaces(all, genSigDirs, genRel, fresh))
    }
  }

  /** Default byte gate for building the generation-face band index:
    * under it the whole-face scan is already cheap (and the fetched
    * path's own small gate delegates to the direct plan anyway), so
    * executor memory isn't spent where it buys nothing. */
  val BandIndexMinBytes: Long = 64L * 1024 * 1024

  /** What fraction of the cluster's total block-manager storage
    * memory the generation-face index may claim before the sink
    * falls back to the FETCHED path (whole-face scan + bloom/id
    * pushdown verify — same output). MEMORY_AND_DISK past cluster
    * memory doesn't crash, but it spills partitions whole and every
    * per-batch lookup then re-reads spilled partitions from disk —
    * quietly reintroducing the O(accepted)/batch term the index
    * exists to remove, while ALSO evicting whatever else wanted that
    * storage memory. Half leaves the other half for the per-batch
    * working set (pinned survivors, shuffle blocks, other caches). */
  val BandIndexMaxMemFraction: Double = 0.5

  /** In-memory bytes of a built index per byte of the face relation's
    * `(id, bands)` Catalyst stats estimate. MEASURED (r13lookup probe,
    * 1M docs / 8M face rows): persisted index 160,001,064 B — exactly
    * 20 B per exploded (bucket, band, id) row (8+4+8, zero boxing) —
    * against 330,340,439 B of projected stats, ratio 0.484. The ratio
    * is structural (both sides scale linearly with the band count),
    * so 0.6 carries ~25% headroom; still conservative in the safe
    * direction (gating too early costs a scan, too late costs the
    * spill regression). */
  val BandIndexBytesPerFaceStatByte: Double = 0.6

  /** The auto ceiling for [[genIndexFor]]'s max-bytes gate: the
    * cluster's summed block-manager storage capacity ×
    * [[BandIndexMaxMemFraction]]. Computed per consult (executors
    * come and go on a dynamic-allocation cluster). */
  private[graft] def bandIndexMaxBytesAuto(spark: SparkSession): Long = {
    val statuses = spark.sparkContext.getExecutorMemoryStatus
    // getExecutorMemoryStatus includes the DRIVER's block manager, but
    // the MEMORY_AND_DISK index lives on executors only — counting the
    // driver would let an index ~2x real executor storage through the
    // gate on a small cluster, admitting exactly the spill regression
    // the gate exists to prevent. One entry = local mode (the driver
    // IS the executor); otherwise subtract the driver's ACTUAL
    // capacity (looked up by its block-manager hostPort): driver and
    // executor memory are usually asymmetric, and subtracting a mean
    // share would re-inflate the estimate whenever the driver is
    // larger than an average executor.
    val total = statuses.values.map(_._1).sum
    val execTotal =
      if (statuses.size > 1) {
        val driverKey =
          org.apache.spark.SparkEnv.get.blockManager.blockManagerId.hostPort
        total - statuses.get(driverKey).map(_._1)
          .getOrElse(total / statuses.size)
      } else total
    (execTotal * BandIndexMaxMemFraction).toLong
  }

  /** How many sinks' generation-face verdicts (index or under-gate)
    * stay cached at once. A production driver runs one or a few
    * long-lived ingest streams, so the bound never binds there; it
    * exists so short-lived sinks (test suites, exploratory notebooks)
    * cannot pin an unbounded number of persisted executor-memory
    * indexes — the evicted entry's index is unpersisted on the way
    * out. */
  val MaxCachedSinkIndexes: Int = 4

  /** Per-sink cache of the generation-face verdict, keyed by the live
    * generation-name set — folds (the only event that changes it)
    * invalidate naturally, and generation ids are never reused. The
    * value holds one sub-index PER GENERATION (`None` for an
    * under-[[BandIndexMinBytes]] face, so the under-gate decision is
    * also one-per-snapshot instead of one-per-batch — generations are
    * immutable, the verdict cannot change between folds): a fold then
    * builds only the NEW generation's sub-index and drops the absorbed
    * generations' — O(new gen) per fold instead of an O(corpus)
    * rebuild, which is the difference between a bounded fold spike
    * and minutes of re-indexing at a 100M-doc sink. The per-batch
    * probe composes the survivors ([[graft.dedup.BandIndex.union]] —
    * an RDD union of persisted partitions, nothing copied).
    * Access-ordered LRU bounded at [[MaxCachedSinkIndexes]]; eviction
    * unpersists every sub-index — DEFERRED to [[drainEvicted]] under
    * the EVICTED sink's own lock: unpersisting inside
    * removeEldestEntry would bypass the lock protocol
    * ([[invalidateIndex]]'s whole point) and could yank another
    * sink's sub-indexes out from under the hand-out window of its
    * concurrent [[genIndexFor]]. The queue hop is deadlock-free
    * because the drain runs after the evictor has released both the
    * map monitor and its own sink lock. */
  private val evicted = new java.util.concurrent.ConcurrentLinkedQueue[
    (String, Option[Map[String, graft.dedup.BandIndex]])]()

  private val indexCache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[
        String,
        (String, Option[Map[String, graft.dedup.BandIndex]])](
        16, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[
          String,
          (String, Option[Map[String, graft.dedup.BandIndex]])]): Boolean = {
        val evict = size() > MaxCachedSinkIndexes
        if (evict) evicted.add((e.getKey, e.getValue._2)): Unit
        evict
      }
    })

  /** Unpersist LRU-evicted sub-indexes under their own sink's lock —
    * called lock-free (see [[indexCache]]). An evicted sink's entry is
    * already out of the map, so a concurrent rebuild there creates
    * fresh instances and never re-hands these out; the lock only
    * defers the unpersist past that sink's current hand-out window. */
  private def drainEvicted(): Unit = {
    var e = evicted.poll()
    while (e != null) {
      lockFor(e._1).synchronized {
        e._2.foreach(_.values.foreach(_.unpersist()))
      }
      e = evicted.poll()
    }
  }

  /** Per-sink build locks: [[genIndexFor]]'s miss path is
    * check-then-act (read cache → build sub-indexes → put), and two
    * streams (or a replayed batch racing a live one) on the SAME
    * sinkDir could both miss, both build, and the losing put would
    * overwrite without unpersisting — leaked executor memory until
    * JVM exit. Serializing per sink closes the race at zero cost to
    * the steady state (one ingest stream per sink; batches within a
    * stream are serial anyway) and never blocks ACROSS sinks. Entries
    * are one bare Object per sink directory ever touched — bounded by
    * the same argument as [[MaxCachedSinkIndexes]], and ~32 B each. */
  private val sinkLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def lockFor(sinkDir: String): Object =
    sinkLocks.computeIfAbsent(sinkDir, _ => new Object)

  /** The cached index's snapshot key, present only when sub-indexes
    * are actually held (test/telemetry visibility; an under-gate
    * verdict is invisible here). */
  private[graft] def cachedIndexKey(sinkDir: String): Option[String] =
    Option(indexCache.get(sinkDir)).collect { case (k, Some(_)) => k }

  /** The cached per-generation sub-indexes (test visibility — the
    * incremental-build contract is that a fold REUSES surviving
    * generations' instances). */
  private[graft] def cachedGenIndexes(
      sinkDir: String): Map[String, graft.dedup.BandIndex] =
    Option(indexCache.get(sinkDir)).flatMap(_._2).getOrElse(Map.empty)

  /** Drop (and unpersist) a sink's cached sub-indexes — call when a
    * sink is finished if the driver outlives the stream. Takes the
    * sink's build lock so it can't unpersist sub-indexes a concurrent
    * [[genIndexFor]] is about to hand out (monitors are reentrant, so
    * genIndexFor's own internal call is fine). */
  def invalidateIndex(sinkDir: String): Unit =
    lockFor(sinkDir).synchronized {
      val old = indexCache.remove(sinkDir)
      if (old != null) old._2.foreach(_.values.foreach(_.unpersist()))
    }

  /** The generation-face index for this batch, refreshed iff the live
    * generation set changed since the cached snapshot (i.e. a fold
    * landed) — and then INCREMENTALLY: surviving generations keep
    * their sub-indexes, absorbed ones are unpersisted, only new
    * generations are built (each from its own directory — one listing
    * per NEW generation, nothing per batch). `genRel` is the face
    * relation `acceptedSigFaces` already built — reused for the byte
    * gate so the consult never pays a second listing + footer read.
    * None when there are no generations yet or the face is under
    * `minBytes`. */
  private def genIndexFor(spark: SparkSession, sinkDir: String,
      genSigDirs: Seq[Path], genRel: Option[DataFrame], minBytes: Long,
      maxBytes: Long = 0L): Option[graft.dedup.BandIndex] = {
    val result = genIndexForLocked(spark, sinkDir, genSigDirs, genRel,
      minBytes, maxBytes)
    // outside every lock: see drainEvicted's deadlock argument
    drainEvicted()
    result
  }

  private def genIndexForLocked(spark: SparkSession, sinkDir: String,
      genSigDirs: Seq[Path], genRel: Option[DataFrame], minBytes: Long,
      maxBytes: Long): Option[graft.dedup.BandIndex] =
    lockFor(sinkDir).synchronized {
      if (genSigDirs.isEmpty || genRel.isEmpty) {
        invalidateIndex(sinkDir); return None
      }
      val names = genSigDirs.map(_.getName)
      val key = names.sorted.mkString(",")
      Option(indexCache.get(sinkDir)) match {
        case Some((k, verdict)) if k == key =>
          verdict.map(m => graft.dedup.BandIndex.union(m.values.toSeq))
        case prior =>
          val priorGens = prior.flatMap(_._2).getOrElse(
            Map.empty[String, graft.dedup.BandIndex])
          val stats = genRel.get.queryExecution.optimizedPlan
            .stats.sizeInBytes
          // ceiling gate: the index must FIT in cluster storage
          // memory, or its MEMORY_AND_DISK partitions spill and every
          // per-batch lookup re-reads them from disk — worse than the
          // fetched path it would replace. Estimated from the
          // projected (id, bands) face stats (the `sh` column never
          // enters the index) × the measured bytes ratio; verdict is
          // per store snapshot like the min gate, folds re-decide.
          val ceiling =
            if (maxBytes > 0) maxBytes else bandIndexMaxBytesAuto(spark)
          val faceStats = genRel.get.select(col("id"), col("bands"))
            .queryExecution.optimizedPlan.stats.sizeInBytes
          val estIndexBytes =
            if (faceStats.isValidLong)
              (faceStats.toLong * BandIndexBytesPerFaceStatByte).toLong
            else Long.MaxValue
          val built: Option[Map[String, graft.dedup.BandIndex]] =
            if (stats.isValidLong && stats.toLong < minBytes) None
            else if (estIndexBytes > ceiling) None
            else Some(names.zip(genSigDirs).map { case (n, dir) =>
              n -> priorGens.getOrElse(n,
                graft.dedup.BandIndex.build(
                  spark.read.parquet(dir.toString)))
            }.toMap)
          val kept = built.getOrElse(Map.empty).keySet
          priorGens.foreach { case (n, idx) =>
            if (!kept.contains(n)) idx.unpersist()
          }
          indexCache.put(sinkDir, (key, built))
          built.map(m => graft.dedup.BandIndex.union(m.values.toSeq))
      }
    }

  /** [[genIndexFor]] over the sink's CURRENT signature faces — the
    * exact consult [[processBatch]] makes, exposed so specs can race
    * two concurrent consults (the cache's check-then-act window) and
    * exercise the byte gates without a full batch around them. */
  private[graft] def consultIndex(spark: SparkSession, sinkDir: String,
      schemaFrom: DataFrame, idCol: String, textCol: String,
      minBytes: Long = BandIndexMinBytes, maxBytes: Long = 0L)
      : Option[graft.dedup.BandIndex] =
    acceptedSigFaces(spark, sinkDir, schemaFrom, idCol, textCol, None)
      .flatMap(faces => genIndexFor(spark, sinkDir, faces.genSigDirs,
        faces.genRel, minBytes, maxBytes))

  /** Fold the sink's COMMITTED `batch_id=N` partitions (data and
    * `_sig` twins) into one compacted generation `gen=K` — the
    * lifecycle maintenance a long-running ingest needs: every commit
    * adds two small parquet directories, and at 10,000 batches the
    * per-batch plan pays a many-small-files listing/union/footer tax
    * that has nothing to do with data volume. One fold rewrites them
    * into size-targeted files. Generations themselves fold
    * SIZE-TIERED: once the live-generation count would exceed
    * `maxGenerations`, the fold also absorbs the SMALLEST
    * ⌈maxGenerations/2⌉ live generations by content bytes (a 10k-batch
    * sink would otherwise hold ~10k/compactEvery generation dirs).
    * Absorbing the smallest half — never everything — is what keeps
    * the rewrite amortized: generation sizes stratify geometrically
    * (fresh batch-fold gens merge into mediums, mediums into larges
    * once they are the smallest on the floor), so each doc is
    * rewritten O(log N) times over the sink's lifetime, where
    * absorbing ALL live gens each trigger would be a full-corpus
    * rewrite every maxGenerations folds — quadratic with a small
    * constant. A source generation is superseded by the new
    * generation's manifest exactly like a source batch, and the GC /
    * crash protocol below treats both identically.
    *
    * Crash-safety protocol (all windows leave a correct corpus):
    *  1. data+sigs are written under underscore temp dirs (invisible);
    *  2. `_sig/gen=K` publishes by rename (an orphan sig generation is
    *     ignored by the pairing in `acceptedSigsSoFar` and removed by
    *     the next call's GC);
    *  3. `gen=K` publishes by rename, CARRYING its [[Manifests.FoldedManifest]]
    *     — from this atomic instant the folded sources are superseded
    *     in every listing even though they still exist on disk;
    *  4. sources are deleted (a crash before this is repaired by the
    *     next call's GC, which deletes manifested sources).
    *
    * Only batches whose `_applied` marker exists are folded — an
    * uncommitted (crash-replayable) partition keeps its identity so
    * the replay's `excludeBatchId` contract still holds; its marker
    * short-circuit likewise survives folding, because markers are
    * never deleted. Returns the new generation id, or None when fewer
    * than `minBatches` committed partitions exist. */
  def compactSink(spark: SparkSession, sinkDir: String,
      schemaFrom: DataFrame, idCol: String, textCol: String,
      queryName: String, minBatches: Int = 2,
      targetFileBytes: Long = 128L * 1024 * 1024,
      maxGenerations: Int = 8): Option[Long] = {
    require(minBatches >= 1, "minBatches must be >= 1")
    require(maxGenerations >= 1, "maxGenerations must be >= 1")
    val base = new Path(sinkDir)
    val fs = base.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(base)) return None
    val sigBase = new Path(base, "_sig")
    // the one shared listing implementation (module-header contract:
    // a listing fix lands in exactly one place, for both sinks)
    def dirsIn(p: Path): Seq[Path] = Manifests.dirsIn(fs, p)
    // GC: finish any earlier fold that crashed between publish and
    // source deletion, drop orphan sig generations and temp debris.
    // Manifested sources are deleted only when their modification
    // time predates the generation's (same guard and rationale as
    // SinkFold.fold): genuine crash debris always predates its gen,
    // while a batch_id=N rewritten by a WRONGLY reused fresh
    // checkpoint postdates it and must not be reaped as debris.
    val dataGens = dirsIn(base).filter(p =>
      partId(p.getName, "gen=").isDefined)
    val dataGenNames = dataGens.map(_.getName).toSet
    // one manifest read per generation, shared with the folded set
    // below (object-store round trips)
    val manifests = dataGens.map(g => g -> readManifest(fs, g))
    manifests.foreach { case (g, names) =>
      val genMtime = fs.getFileStatus(g).getModificationTime
      names.foreach { n =>
        val src = new Path(base, n)
        if (fs.exists(src) &&
            fs.getFileStatus(src).getModificationTime <= genMtime)
          fs.delete(src, true)
        val sig = new Path(sigBase, n)
        if (fs.exists(sig) &&
            fs.getFileStatus(sig).getModificationTime <= genMtime)
          fs.delete(sig, true)
      }
    }
    dirsIn(sigBase).filter(p => partId(p.getName, "gen=").isDefined &&
      !dataGenNames.contains(p.getName)).foreach(fs.delete(_, true))
    dirsIn(base).filter(_.getName.startsWith("_tmp_gen"))
      .foreach(fs.delete(_, true))
    // committed = marker exists; an in-flight replayable partition is
    // left alone by construction. Never re-fold an (mtime-protected)
    // already-manifested source.
    val folded = manifests.iterator.flatMap(_._2).toSet
    val committed = dirsIn(base)
      .filter(p => partId(p.getName, "batch_id=").isDefined &&
        !folded.contains(p.getName))
      .filter { p =>
        val id = p.getName.stripPrefix("batch_id=")
        fs.exists(new Path(base, s"_applied/$queryName/$id"))
      }
    if (committed.size < minBatches) return None
    // size-tiered trigger: if publishing one more generation would
    // push the live count past the bound, this fold absorbs the
    // SMALLEST ⌈maxGenerations/2⌉ live generations by bytes (see the
    // scaladoc's amortization argument; Manifests.tierSources — one
    // policy implementation for both sinks)
    val liveGens = dataGens.filterNot(g => folded.contains(g.getName))
    val tiered = Manifests.tierSources(fs, liveGens, maxGenerations)
    val sources = committed ++ tiered.map(_._1)
    val genId = (dirsIn(base) ++ dirsIn(sigBase))
      .flatMap(p => partId(p.getName, "gen="))
      .foldLeft(-1L)(math.max) + 1L
    val data = spark.read.schema(schemaFrom.schema)
      .parquet(sources.map(_.toString): _*)
    val totalBytes = committed.map(fs.getContentSummary(_).getLength).sum +
      tiered.map(_._2).sum
    val nFiles = math.max(1L,
      (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    // signatures: union the stored sig partitions; a folded source
    // missing its sig twin (pre-signature layout) recomputes from its
    // text once, here, instead of on every future batch
    val sigNames = dirsIn(sigBase).map(_.getName).toSet
    val (withSig, legacy) =
      sources.partition(p => sigNames.contains(p.getName))
    val sigRel = (
      Option(withSig).filter(_.nonEmpty).map(ps =>
        spark.read.parquet(ps.map(p => s"$sigBase/${p.getName}"): _*)),
      Option(legacy).filter(_.nonEmpty).map(ps =>
        Dedup.nearDupSignatures(spark.read.schema(schemaFrom.schema)
          .parquet(ps.map(_.toString): _*), idCol, textCol))) match {
      case (Some(a), Some(b)) => a.unionByName(b)
      case (a, b) => a.orElse(b).get
    }
    val tmpData = new Path(base, s"_tmp_gen_${genId}_data")
    val tmpSig = new Path(base, s"_tmp_gen_${genId}_sig")
    data.repartition(nFiles).write.mode("overwrite")
      .option("compression", "snappy").parquet(tmpData.toString)
    // generations carry the signature-store indexes (bloom on id,
    // id-sorted row groups) so the per-batch candidate fetch keeps its
    // pushdown after folding — see Dedup.writeSignatures
    Dedup.writeSignatures(sigRel, tmpSig.toString, nFiles)
    Manifests.writeManifest(fs, tmpData, sources.map(_.getName))
    fs.mkdirs(sigBase)
    // checked publishes (Manifests.renameOrFail): a false-returning
    // rename followed by the source deletes below would lose the
    // folded batches with no generation published — and the GC can
    // only repair from a PUBLISHED manifest. If the data publish
    // throws after the sig publish landed, the orphan sig generation
    // is exactly what the next call's GC removes.
    Manifests.renameOrFail(fs, tmpSig, new Path(sigBase, s"gen=$genId"))
    Manifests.renameOrFail(fs, tmpData, new Path(base, s"gen=$genId"))
    sources.foreach { p =>
      fs.delete(p, true)
      fs.delete(new Path(sigBase, p.getName), true)
    }
    Some(genId)
  }

  /** One micro-batch of the ingest, idempotent under at-least-once
    * replay (exposed for direct replay testing — the stream calls
    * exactly this). Cross-corpus rejection against the accepted
    * SIGNATURES first, in-batch dedup on the survivors, then: write
    * `batch_id=N/`, write `_sig/batch_id=N/` (computed from the
    * just-written partition — one batch-sized re-read, not a
    * recompute of the dedup plan), create the marker. With
    * `compactEvery > 0`, every time that many committed `batch_id=`
    * partitions have accumulated the sink folds them into a compacted
    * generation ([[compactSink]]) — the steady state is ≤
    * `compactEvery` small partitions plus at most `maxGenerations`
    * generations (tiered folding bounds the generation count for the
    * sink's whole lifetime). */
  def processBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
      idCol: String, textCol: String, threshold: Double,
      sinkDir: String, queryName: String, compactEvery: Int = 0,
      bench: Option[DataFrame] = None, benchGramN: Int = 13,
      maxGenerations: Int = 8,
      bandIndexBytes: Long = BandIndexMinBytes,
      bandIndexMaxBytes: Long = 0L): Unit = {
    val fs = new Path(sinkDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val marker = new Path(s"$sinkDir/_applied/$queryName/$batchId")
    if (!fs.exists(marker)) try {
      // decontamination FIRST of all: a benchmark-contaminated doc is
      // dropped unconditionally — it must never act as a dup-cluster
      // keeper, so a CLEAN near-duplicate of a contaminated doc is
      // independently judged (and kept, if nothing else matches it).
      // Per-doc test against the BROADCAST bench gram set, so batching
      // cannot change any verdict and per-batch cost stays
      // O(batch grams), independent of the accepted corpus.
      // the batch relation is consumed by SEVERAL plan branches below
      // (the cross-rejection hit list, its anti join, the in-batch
      // pair plan's band and verify sides) and Spark re-derives an
      // unpersisted lineage once per branch. For a raw file batch the
      // recompute is a cheap re-scan; once decontamination prefixes
      // the lineage it is a full gram pass PER BRANCH (the r9 streams
      // probe measured the decontaminated ingest at ~4× the plain
      // one's per-batch wall for exactly this reason) — so pin the
      // decontaminated batch for the micro-batch's lifetime.
      // pin the CONTAMINATED ID LIST, not the decontaminated text
      // relation: the ids are tiny (they broadcast into the anti
      // join), while caching 50k text rows per batch costs more than
      // it saves. Materialize BEFORE the consumers — a lazily
      // populated cache read by two branches of one job races, each
      // branch computing its own copy before either publishes blocks.
      // persist() is a lazy marking and cannot fail; everything that
      // RUNS work on the pinned relations (counts, the index build,
      // the eager pair collect) happens inside the try whose finally
      // unpersists — an exception anywhere in between must not leave
      // a MEMORY_AND_DISK copy pinned per failed at-least-once retry
      val contaminated = bench.map { b =>
        graft.text.Decontaminate
          .contaminatedIds(batch, b, idCol, textCol, benchGramN)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      }
      try {
      contaminated.foreach(_.count())
      val clean = contaminated match {
        case Some(ids) => batch.join(ids, Seq(idCol), "left_anti")
        case None => batch
      }
      // cross-corpus rejection NEXT, in-batch dedup on the
      // survivors: a batch row that is doomed against the
      // accepted corpus must not act as an in-batch cluster
      // keeper and take fresh rows down with it (that would make
      // acceptance depend on batch boundaries even for non-chain
      // graphs) — cross-first matches per-document sequential
      // greedy whenever the batch's own dup graph is CC-clean
      // the INDEXED variant: the folded generations' banded candidate
      // face is answered by an executor-resident BandIndex (built once
      // per fold epoch — per-batch stored-side work O(batch keys +
      // matches), the last O(accepted) per-batch term removed), fresh
      // batch partitions (≤ compactEvery) are semi-joined lazily, and
      // the exact-verify fetch stays the collected-IN pushdown into
      // the bloom + id-sorted store (writeSignatures layout). Falls
      // back to the FETCHED whole-face-scan variant when there are no
      // generations yet, the face is under bandIndexBytes, or the id
      // column isn't long. The result is a driver-local pair relation,
      // so the anti join broadcasts it for free.
      val survivorsRaw = acceptedSigFaces(spark, sinkDir, clean, idCol,
        textCol, Some(batchId)) match {
        case Some(faces) =>
          val idx =
            if (clean.schema(idCol).dataType ==
                org.apache.spark.sql.types.LongType)
              genIndexFor(spark, sinkDir, faces.genSigDirs, faces.genRel,
                bandIndexBytes, bandIndexMaxBytes)
            else None
          val pairs = idx match {
            case Some(i) => Dedup.crossNearDupPairsVsSignaturesIndexed(
              clean, idCol, textCol, faces.all, i, faces.fresh, threshold)
            case None => Dedup.crossNearDupPairsVsSignaturesFetched(
              clean, idCol, textCol, faces.all, threshold)
          }
          val hit = pairs.select(col("id_a").as(idCol)).distinct()
          clean.join(hit, Seq(idCol), "left_anti")
        case None => clean
      }
      // same argument one stage later: survivors feed the pair plan
      // AND the drop anti join — unpinned, the cross-corpus signature
      // join above would run once per consumer
      val survivors = survivorsRaw
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        survivors.count() // materialize before the pair plan's branches
        val out = Dedup.dropNearDups(survivors, idCol,
          Dedup.nearDupPairs(survivors, idCol, textCol, threshold))
        out.write.mode("overwrite").parquet(s"$sinkDir/batch_id=$batchId")
      } finally survivors.unpersist()
      } finally contaminated.foreach(_.unpersist())
      val written = spark.read.schema(batch.schema)
        .parquet(s"$sinkDir/batch_id=$batchId")
      Dedup.writeSignatures(
        Dedup.nearDupSignatures(written, idCol, textCol),
        s"$sinkDir/_sig/batch_id=$batchId")
      fs.mkdirs(marker.getParent)
      fs.create(marker, true).close()
      if (compactEvery > 0) {
        // the fs constructed at the top of this batch — rebuilding a
        // Hadoop conf + FileSystem here would tax every micro-batch
        val live = fs.listStatus(new Path(sinkDir))
          .count(s => s.isDirectory &&
            partId(s.getPath.getName, "batch_id=").isDefined)
        if (live >= compactEvery)
          compactSink(spark, sinkDir, batch, idCol, textCol, queryName,
            minBatches = compactEvery, maxGenerations = maxGenerations)
      }
    } catch {
      case e: Throwable =>
        // a failed batch drops the sink's cached index before the
        // at-least-once replay: the index's RDD lineage reads the
        // generation dirs it was built from, and if an EXECUTOR LOSS
        // forces block recompute after a fold already deleted those
        // sources, the cached index is permanently broken — replaying
        // against it would fail every retry, while a rebuild from the
        // CURRENT generation set (same rows, folded layout) is always
        // valid. Worst case is one redundant rebuild on an unrelated
        // failure.
        invalidateIndex(sinkDir)
        throw e
    }
  }

  /** Start the ingest: file source under `srcDir` (schema from
    * `schemaFrom`), accepted documents under `sinkDir/batch_id=N/`.
    * `Trigger.AvailableNow` drains what has landed and stops — re-run
    * on a schedule, or swap the trigger for continuous tailing. Reuse
    * `queryName` exactly when resuming the same checkpoint (batch ids
    * restart at 0 per checkpoint — the marker lineage must follow).
    * A sink that has COMPACTED must never be pointed at by a NEW
    * checkpoint: restarted batch ids collide with names in published
    * fold manifests, so the rewritten partitions read as superseded.
    * The folds' mtime GC guard keeps such fresh data from being
    * deleted as crash debris, but the pairing is still wrong — use a
    * fresh sink directory with a fresh checkpoint.
    * `bench` switches on ONLINE DECONTAMINATION: each batch drops
    * documents sharing any `benchGramN`-gram with the benchmark set
    * before any dedup runs ([[processBatch]] for the policy order). */
  def nearDupIngestStream(spark: SparkSession, srcDir: String,
      schemaFrom: DataFrame, idCol: String, textCol: String,
      threshold: Double, sinkDir: String, queryName: String,
      checkpoint: Option[String] = None,
      maxFilesPerTrigger: Option[Int] = None,
      compactEvery: Int = 0,
      bench: Option[DataFrame] = None,
      benchGramN: Int = 13,
      maxGenerations: Int = 8,
      bandIndexBytes: Long = BandIndexMinBytes,
      bandIndexMaxBytes: Long = 0L): StreamingQuery = {
    val reader = spark.readStream.schema(schemaFrom.schema)
    maxFilesPerTrigger.foreach(n =>
      reader.option("maxFilesPerTrigger", n.toString))
    val writer = reader
      .parquet(srcDir)
      .writeStream
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
    checkpoint.foreach(writer.option("checkpointLocation", _))
    writer
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(spark, batch, batchId, idCol, textCol, threshold,
          sinkDir, queryName, compactEvery, bench, benchGramN,
          maxGenerations, bandIndexBytes, bandIndexMaxBytes)
      }
      .start()
  }

  /** The accepted corpus as a batch relation (for downstream reads and
    * the q184 replay). */
  def accepted(spark: SparkSession, sinkDir: String,
      schemaFrom: DataFrame): DataFrame =
    acceptedSoFar(spark, sinkDir, schemaFrom)
      .getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        schemaFrom.schema))
}
