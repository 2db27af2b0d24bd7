package graft.operators

/** Driver-side concurrency for INDEPENDENT Spark actions (guide §2.6:
  * Spark's scheduler happily runs several jobs at once inside one
  * application; actions are only sequential because driver code calls
  * them sequentially). Submitting independent jobs from a small pool
  * lets the next job's tasks back-fill executors freed by the current
  * job's straggler tail — and at benchmark scale it removes the
  * serialized per-action scheduling/collect latency that dominates
  * lifecycle-heavy operators (registry builds, per-subspace fits).
  *
  * Results return in INDEX order, never completion order, so callers'
  * outputs are bit-identical to the sequential loop. Exceptions from
  * the body propagate unwrapped. Only for bodies that are independent
  * (no shared mutable state, disjoint output paths).
  *
  * BOUNDS (r17): two guarantees the r16 version lacked —
  *  - on a body failure the remaining futures are CANCELLED
  *    (`shutdownNow` + await) before the cause rethrows, so sibling
  *    jobs can't keep writing their output paths in the background
  *    while the caller unwinds into a retry or cleanup;
  *  - NESTED calls (a Par body that itself calls Par — q220 wraps two
  *    register() calls, each of which Par-maps its grains) run the
  *    inner map SEQUENTIALLY on the caller's thread instead of
  *    spawning a pool per level, so total concurrent driver actions
  *    stay ≤ 8 instead of multiplying per nesting level. The outer
  *    level keeps the overlap that matters (the independent jobs are
  *    still in flight concurrently).
  */
object Par {

  /** True while the current thread is inside a Par body — nested maps
    * fall back to the sequential loop (bit-identical results). */
  private val inBody = new ThreadLocal[Boolean] {
    override def initialValue(): Boolean = false
  }

  /** `indexes.map(body)` with the bodies running concurrently on a
    * bounded pool (≤ 8 driver threads — enough to fill scheduling
    * gaps, few enough not to fight for executors; FIFO scheduling
    * keeps earlier jobs first). */
  def mapIndexed[T: scala.reflect.ClassTag](indexes: Range)
      (body: Int => T): Array[T] = {
    if (indexes.size <= 1 || inBody.get()) indexes.toArray.map(body)
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(indexes.size, 8))
      try {
        val futs = indexes.map { i =>
          pool.submit(new java.util.concurrent.Callable[T] {
            override def call(): T = {
              inBody.set(true)
              try body(i) finally inBody.set(false)
            }
          })
        }
        try futs.map { f =>
          try f.get()
          catch { // surface the body's own exception, not the wrapper
            case e: java.util.concurrent.ExecutionException =>
              throw e.getCause
          }
        }.toArray
        catch {
          case t: Throwable =>
            // cancel the outstanding siblings and WAIT for in-flight
            // bodies to finish before rethrowing — a retry or cleanup
            // must never race a background write that survived the
            // failure (ADVICE r16)
            futs.foreach(_.cancel(true))
            pool.shutdownNow()
            pool.awaitTermination(10, java.util.concurrent.TimeUnit.MINUTES)
            throw t
        }
      } finally pool.shutdown()
    }
  }

  /** [[mapIndexed]] over a Seq, preserving element order. */
  def mapSeq[A, T: scala.reflect.ClassTag](xs: Seq[A])(body: A => T): Seq[T] =
    mapIndexed(xs.indices)(i => body(xs(i))).toSeq
}
