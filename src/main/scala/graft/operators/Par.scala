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
  */
object Par {

  /** `indexes.map(body)` with the bodies running concurrently on a
    * bounded pool (≤ 8 driver threads — enough to fill scheduling
    * gaps, few enough not to fight for executors; FIFO scheduling
    * keeps earlier jobs first). */
  def mapIndexed[T: scala.reflect.ClassTag](indexes: Range)
      (body: Int => T): Array[T] = {
    if (indexes.size <= 1) indexes.toArray.map(body)
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(indexes.size, 8))
      try {
        val futs = indexes.map { i =>
          pool.submit(new java.util.concurrent.Callable[T] {
            override def call(): T = body(i)
          })
        }
        futs.map { f =>
          try f.get()
          catch { // surface the body's own exception, not the wrapper
            case e: java.util.concurrent.ExecutionException =>
              throw e.getCause
          }
        }.toArray
      } finally pool.shutdown()
    }
  }

  /** [[mapIndexed]] over a Seq, preserving element order. */
  def mapSeq[A, T: scala.reflect.ClassTag](xs: Seq[A])(body: A => T): Seq[T] =
    mapIndexed(xs.indices)(i => body(xs(i))).toSeq
}
