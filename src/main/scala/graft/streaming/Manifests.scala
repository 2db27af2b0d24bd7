package graft.streaming

import java.io.IOException

import org.apache.hadoop.fs.{FileSystem, Path}

/** The shared manifest primitives behind both compacting sinks
  * ([[SinkFold]] — data-only generations; [[DocStream.compactSink]] —
  * paired data + `_sig` generations). The FOLD POLICIES stay separate
  * on purpose (the pairing/GC obligations differ), but the manifest
  * format, its reader/writer, the directory listing, and the
  * checked-rename publish step are one implementation: a format or
  * publish-safety fix lands in exactly one place, for both sinks. */
private[streaming] object Manifests {

  /** Manifest file inside a compacted generation directory listing the
    * partitions it folded. It rides the generation's publish rename,
    * so "gen visible" and "its sources are superseded" are ONE atomic
    * event. Underscore prefix keeps it invisible to parquet readers. */
  val FoldedManifest = "_folded"

  def readManifest(fs: FileSystem, gen: Path): Set[String] = {
    val f = new Path(gen, FoldedManifest)
    if (!fs.exists(f)) Set.empty
    else {
      val in = fs.open(f)
      try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().map(_.trim).filter(_.nonEmpty).toSet
      finally in.close()
    }
  }

  def writeManifest(fs: FileSystem, dir: Path,
      sources: Seq[String]): Unit = {
    val out = fs.create(new Path(dir, FoldedManifest), true)
    try out.write(sources.sorted.mkString("\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** Strict `prefix<digits>` partition-name parse: the id, or None
    * for any non-conforming name. Both sinks list directories by
    * prefix and parse the rest as a Long — an unguarded
    * `stripPrefix(...).toLong` turns ONE stray directory (a manual
    * `batch_id=3.bak` copy) into a NumberFormatException that
    * permanently fails every subsequent fold. ASCII digits only,
    * length-capped so the parse itself can never throw; anything
    * non-conforming is simply not a partition. */
  def partId(name: String, prefix: String): Option[Long] =
    if (!name.startsWith(prefix)) None
    else {
      val rest = name.substring(prefix.length)
      if (rest.nonEmpty && rest.length <= 18 &&
          rest.forall(c => c >= '0' && c <= '9')) Some(rest.toLong)
      else None
    }

  /** Size-tiered absorb set shared by both folds: when publishing one
    * more generation would push the live count past `maxGenerations`,
    * the ⌈maxGenerations/2⌉ SMALLEST live generations by content bytes
    * (generation id breaks ties — deterministic); empty otherwise.
    * A sink that STARTS far over the bound (a legacy unbounded sink
    * adopting tiering, or `maxGenerations` lowered between runs)
    * absorbs however many extra smallest generations it takes for ONE
    * fold to restore the invariant — `live − k + 1 ≤ maxGenerations`
    * needs `k ≥ live + 1 − maxGenerations` — instead of converging by
    * ~⌈max/2⌉−1 per fold. Returns (path, bytes) so callers reuse the
    * recursive listing they already paid for in their size-targeted
    * file count. */
  def tierSources(fs: FileSystem, liveGens: Seq[Path],
      maxGenerations: Int): Seq[(Path, Long)] =
    if (liveGens.size + 1 <= maxGenerations) Seq.empty
    else {
      val k = math.min(liveGens.size,
        math.max((maxGenerations + 1) / 2,
          liveGens.size + 1 - maxGenerations))
      liveGens.map(g => (g, fs.getContentSummary(g).getLength))
        .sortBy { case (g, b) => (b, partId(g.getName, "gen=").get) }
        .take(k)
    }

  def dirsIn(fs: FileSystem, p: Path): Seq[Path] =
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).filter(_.isDirectory).map(_.getPath).toIndexedSeq

  /** Rename-or-THROW. Hadoop's `FileSystem.rename` reports most
    * failures (destination exists, source vanished, cross-FS) by
    * returning FALSE rather than throwing — and a publish rename whose
    * failure went unnoticed would let the caller proceed to DELETE the
    * fold's source partitions with no generation published: silent,
    * unrepairable data loss (the GC only repairs from published
    * manifests). Every publish rename in both sinks goes through
    * here. */
  def renameOrFail(fs: FileSystem, src: Path, dst: Path): Unit =
    if (!fs.rename(src, dst))
      throw new IOException(
        s"publish rename failed (returned false): $src -> $dst" +
          (if (fs.exists(dst)) " (destination already exists)" else ""))
}
