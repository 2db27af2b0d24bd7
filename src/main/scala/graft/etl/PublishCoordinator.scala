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
    // a failed RELEASE is loud (it strands a fresh-looking lease that
    // blocks every publisher until the break horizon) but must not
    // MASK the protected section's own failure — suppress, not
    // replace, when both throw
    var primary: Throwable = null
    try f
    catch { case t: Throwable => primary = t; throw t }
    finally {
      try release(fs, lease, token)
      catch {
        case rel: Throwable =>
          if (primary != null) primary.addSuppressed(rel) else throw rel
      }
    }
  }

  private def acquire(fs: FileSystem, lease: Path, token: String): Unit = {
    val deadline = System.currentTimeMillis() + acquireTimeoutMs
    while (true) {
      if (tryCreate(fs, lease, token)) return
      breakIfStale(fs, lease)
      if (System.currentTimeMillis() > deadline)
        throw new java.io.IOException(
          s"failed to acquire publish lease $lease within " +
            s"${acquireTimeoutMs}ms — another publisher holds it " +
            "(or a dead holder's lease is younger than the " +
            s"${leaseMs}ms break horizon)")
      Thread.sleep(pollMs)
    }
  }

  /** Break a dead holder's lease — WITHOUT the bare check-then-act
    * delete, which could unlock a LIVE rival: between this
    * contender's staleness stat and its delete, another contender may
    * have broken the same stale lease and created a fresh one of its
    * own; deleting by path would then remove the rival's live hold
    * and let two publishers in. Instead the observed-stale file is
    * CLAIMED by an atomic rename to a unique sideline name (exactly
    * one claimant can win the rename), and the sidelined file's mtime
    * is compared against the one the staleness decision was made on:
    *  - equal → it IS the dead holder's file; discard it.
    *  - different → a fresh rival lease was claimed by mistake;
    *    restore it ATOMICALLY-NO-REPLACE: a hard link back to the
    *    lease path on local filesystems (link(2) fails if the target
    *    exists — a bare exists+rename would be check-then-act again,
    *    and POSIX rename REPLACES, so it could overwrite a THIRD
    *    contender's live lease), a no-overwrite rename on HDFS. If
    *    the restore loses (a third process already re-created the
    *    lease), the claimed file is dropped and that victim's hold is
    *    no longer exclusion-protected — a residual needing THREE
    *    processes inside one stat-to-rename window, with the manifest
    *    read-back layer still behind the victim's publish; no LIVE
    *    lease is ever overwritten.
    * The mtime comparison cannot alias: a breakable lease is over
    * `leaseMs` old, a mistakenly-claimed one was written moments ago. */
  private def breakIfStale(fs: FileSystem, lease: Path): Unit = {
    val staleMtime =
      try {
        val st = fs.getFileStatus(lease)
        if (st.getModificationTime >=
          System.currentTimeMillis() - leaseMs) return
        st.getModificationTime
      } catch { case _: java.io.FileNotFoundException => return }
    val sideline = new Path(lease.getParent,
      LeaseName + ".broken-" + java.util.UUID.randomUUID().toString)
    val claimed =
      try fs.rename(lease, sideline)
      catch { case _: java.io.IOException => false }
    if (!claimed) return // another contender claimed it first
    val st =
      try Some(fs.getFileStatus(sideline))
      catch { case _: java.io.FileNotFoundException => None }
    st match {
      case Some(s) if s.getModificationTime == staleMtime =>
        fs.delete(sideline, false): Unit // the dead holder's file
      case Some(_) =>
        if (fs.getScheme == "file")
          try
            // link(2): atomic create-at-target, fails if it exists
            java.nio.file.Files.createLink(
              java.nio.file.Paths.get(lease.toUri.getPath),
              java.nio.file.Paths.get(sideline.toUri.getPath)): Unit
          catch { case _: java.io.IOException => () }
        else
          try fs.rename(sideline, lease): Unit // HDFS: no-overwrite
          catch { case _: java.io.IOException => () }
        // drop the sideline name: after a link restore it is a second
        // name for the restored inode; after a lost restore it is the
        // three-process residual documented above; after an HDFS
        // rename it is already gone (no-op delete)
        fs.delete(sideline, false): Unit
      case None => ()
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

  /** Delete the lease only while it still carries this holder's
    * token (a lease broken mid-hold — a publish that outran `leaseMs`
    * — is a successor's claim now; deleting it would unlock THEIR
    * hold). A missing lease is that same broken-lease case and is
    * fine; any OTHER I/O failure is retried and then THROWN — a
    * silently-stranded fresh-looking lease would block every
    * publisher for up to `leaseMs` with a misleading "another
    * publisher holds it" error and no record of why. */
  private def release(fs: FileSystem, lease: Path, token: String): Unit = {
    var attempt = 0
    while (true) {
      try {
        val in = fs.open(lease)
        val held =
          try new String(
            org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
          finally in.close()
        if (held == token) fs.delete(lease, false): Unit
        return
      } catch {
        case _: java.io.FileNotFoundException => return
        case e: java.io.IOException =>
          attempt += 1
          if (attempt >= 3) throw new java.io.IOException(
            s"failed to release publish lease $lease after $attempt " +
              s"attempts — publishers are blocked until the ${leaseMs}ms " +
              "break horizon passes", e)
          Thread.sleep(pollMs)
      }
    }
  }
}
