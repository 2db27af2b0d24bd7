package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class ParSpec extends AnyFunSuite {

  test("results return in index order") {
    val out = Par.mapIndexed(0 until 16) { i =>
      Thread.sleep((16 - i) * 5L); i * 2
    }
    assert(out.toSeq == (0 until 16).map(_ * 2))
  }

  test("a body failure cancels the outstanding siblings before rethrowing") {
    val started = new java.util.concurrent.atomic.AtomicInteger(0)
    val finished = new java.util.concurrent.atomic.AtomicInteger(0)
    val boom = intercept[IllegalStateException] {
      Par.mapIndexed(0 until 32) { i =>
        started.incrementAndGet()
        if (i == 0) { Thread.sleep(50); throw new IllegalStateException("x") }
        Thread.sleep(200)
        finished.incrementAndGet()
      }: Unit
    }
    assert(boom.getMessage == "x")
    // when mapIndexed returns, no body may still be running: everything
    // that started has finished (or was interrupted), nothing new
    // starts — the ADVICE r16 contract (a retry/cleanup must never
    // race a surviving background write)
    val f0 = finished.get()
    val s0 = started.get()
    Thread.sleep(300)
    assert(finished.get() == f0,
      "bodies kept running in the background after the failure rethrew")
    assert(started.get() == s0,
      "bodies started in the background after the failure rethrew")
  }

  test("nested Par stays bounded by the global permits, not pool × pool") {
    val concurrent = new java.util.concurrent.atomic.AtomicInteger(0)
    val peak = new java.util.concurrent.atomic.AtomicInteger(0)
    val out = Par.mapIndexed(0 until 8) { o =>
      Par.mapSeq(0 until 8) { i =>
        val c = concurrent.incrementAndGet()
        peak.updateAndGet(p => math.max(p, c))
        Thread.sleep(30)
        concurrent.decrementAndGet()
        o * 10 + i
      }.sum
    }
    assert(out.toSeq == (0 until 8).map(o => (0 until 8).map(o * 10 + _).sum))
    // bound = 8 global permits + inline bodies on the (≤ 8) caller
    // threads that found no free permit — far under the 64 threads
    // multiplied per-level pools would spawn
    assert(peak.get() <= 16, s"nested bodies exceeded the bound: ${peak.get()}")
  }

  test("permits are not leaked by the failure/cancellation path") {
    (1 to 3).foreach { _ =>
      intercept[IllegalStateException] {
        Par.mapIndexed(0 until 32) { i =>
          if (i == 0) throw new IllegalStateException("x")
          Thread.sleep(100); i
        }: Unit
      }: Unit
    }
    // if cancelled-before-start tasks leaked permits, repeated failing
    // calls would exhaust the global budget and this map would run
    // fully inline-sequential (~16 × 50 ms); with the budget intact it
    // runs wide. Assert on concurrency, not wall time.
    val concurrent = new java.util.concurrent.atomic.AtomicInteger(0)
    val peak = new java.util.concurrent.atomic.AtomicInteger(0)
    Par.mapIndexed(0 until 16) { i =>
      val c = concurrent.incrementAndGet()
      peak.updateAndGet(p => math.max(p, c))
      Thread.sleep(50)
      concurrent.decrementAndGet()
      i
    }: Unit
    assert(peak.get() >= 4,
      s"global permits appear leaked: post-failure peak concurrency ${peak.get()}")
  }
}
