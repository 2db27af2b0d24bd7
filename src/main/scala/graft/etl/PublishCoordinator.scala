package graft.etl

import org.apache.hadoop.fs.{FileSystem, Path}

/** Mutual exclusion for manifest publishers ([[ViewRefresh
  * .materializeSnapshot]]/[[ViewRefresh.refreshSnapshot]]): the
  * generation choice and the manifest commit must be one critical
  * section per table, or two writers pick the same generation number
  * and race the commit.
  *
  * Why pluggable: the publish protocol's OWN race layers (exists
  * pre-check, rename, read-back verify in `publishGeneration`) make a
  * same-generation loser LOUD on a no-overwrite-rename filesystem
  * (HDFS), but on a filesystem whose rename REPLACES an existing file
  * (raw POSIX) the read-back is itself check-after-act — cross-process
  * publishers there need an EXTERNAL coordinator, the standard caveat
  * of every manifest-committed table format on such stores (Delta's
  * S3 LogStore). This interface is that hook: the default
  * [[PublishCoordinator.SameJvm]] serializes writers within one JVM
  * (exactly the pre-r16 behavior); [[FileLeaseCoordinator]] extends
  * the exclusion across processes via an atomically-created lease
  * file. A deployer with a real lock service (ZooKeeper, a database
  * row, DynamoDB as Delta uses on S3) implements `withLock` over it.
  */
trait PublishCoordinator {

  /** Run `f` while holding the publish lock for the table at `base`.
    * Implementations must guarantee at most one holder per table
    * ACROSS the domain they claim (JVM-wide for [[PublishCoordinator
    * .SameJvm]], machine/cluster-wide for a lease or lock service)
    * and must release on all exits. */
  def withLock[T](fs: FileSystem, base: Path)(f: => T): T
}

object PublishCoordinator {

  /** One JVM-wide monitor per qualified table path — generation
    * choice and manifest commit are atomic within this process.
    * Correct for the single-writer deployment and for concurrent
    * writers sharing a JVM (a streaming job's foreachBatch threads);
    * cross-PROCESS writers on a replace-semantics filesystem need
    * [[FileLeaseCoordinator]] or an external lock service. */
  object SameJvm extends PublishCoordinator {
    private val locks =
      new java.util.concurrent.ConcurrentHashMap[String, Object]()

    def withLock[T](fs: FileSystem, base: Path)(f: => T): T = {
      val key = fs.makeQualified(base).toString
      val lock = locks.computeIfAbsent(key, _ => new Object)
      lock.synchronized(f)
    }
  }
}

/** Cross-process mutual exclusion via an atomically-created lease
  * file beside the table: acquisition is create-if-absent — atomic on
  * HDFS (`create(p, overwrite = false)` is an exclusive namenode op)
  * and on local filesystems (O_CREAT|O_EXCL via
  * `java.io.File.createNewFile`, used whenever the path is
  * file-scheme, because `RawLocalFileSystem.create`'s no-overwrite
  * check is itself check-then-act). A holder that dies leaves the
  * lease on disk; contenders BREAK it once its mtime is older than
  * `leaseMs` — so `leaseMs` must exceed any plausible publish
  * duration, same contract as every mtime-horizon sweep in this repo.
  * Release deletes the lease only while it still carries this
  * holder's token: a lease broken mid-hold (a publish that outran
  * `leaseMs`) is a successor's property and must not be deleted out
  * from under them — that publish's commit is then NOT exclusion-
  * protected, which is the documented price of picking a short lease,
  * not a silent one: the manifest read-back layer still makes the
  * loser loud in the common case.
  *
  * NOT suitable for object stores without atomic create (S3): there
  * the deployer supplies a real lock service implementation. */
final class FileLeaseCoordinator(
    leaseMs: Long = 10L * 60 * 1000,
    acquireTimeoutMs: Long = 60L * 1000,
    pollMs: Long = 25L) extends PublishCoordinator {
  require(leaseMs > 0 && acquireTimeoutMs > 0 && pollMs > 0,
    "lease, timeout and poll intervals must be positive")

  private val LeaseName = ".graft-publish-lease"

  def withLock[T](fs: FileSystem, base: Path)(f: => T): T = {
    fs.mkdirs(base)
    val lease = new Path(base, LeaseName)
    val token = java.util.UUID.randomUUID().toString
    acquire(fs, lease, token)
    try f
    finally release(fs, lease, token)
  }

  private def acquire(fs: FileSystem, lease: Path, token: String): Unit = {
    val deadline = System.currentTimeMillis() + acquireTimeoutMs
    while (true) {
      if (tryCreate(fs, lease, token)) return
      // contended: break a stale lease (dead holder), else wait
      try {
        val st = fs.getFileStatus(lease)
        if (st.getModificationTime < System.currentTimeMillis() - leaseMs)
          fs.delete(lease, false): Unit // best effort; racers re-loop
      } catch { case _: java.io.FileNotFoundException => () }
      if (System.currentTimeMillis() > deadline)
        throw new java.io.IOException(
          s"failed to acquire publish lease $lease within " +
            s"${acquireTimeoutMs}ms — another publisher holds it " +
            "(or a dead holder's lease is younger than the " +
            s"${leaseMs}ms break horizon)")
      Thread.sleep(pollMs)
    }
  }

  /** Atomic create-if-absent carrying our token; false if held. */
  private def tryCreate(fs: FileSystem, lease: Path,
      token: String): Boolean = {
    val created =
      if (fs.getScheme == "file") {
        val local = new java.io.File(lease.toUri.getPath)
        Option(local.getParentFile).foreach(_.mkdirs())
        local.createNewFile() // O_CREAT|O_EXCL — atomic claim
      } else
        try {
          // HDFS-like: exclusive create is atomic at the namenode
          fs.create(lease, false).close(); true
        } catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
          case _: java.io.IOException if fs.exists(lease) => false
        }
    if (!created) return false
    // only the creator writes the token (claim already won above);
    // the token's job is scoping RELEASE, not the claim itself
    val out = fs.create(lease, true)
    out.write(token.getBytes("UTF-8")); out.close()
    true
  }

  private def release(fs: FileSystem, lease: Path, token: String): Unit =
    try {
      val in = fs.open(lease)
      val held =
        try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
        finally in.close()
      if (held == token) fs.delete(lease, false): Unit
      // else: our lease was broken mid-hold — the file is a
      // successor's claim now; deleting it would unlock THEIR hold
    } catch { case _: java.io.IOException => () }
}
