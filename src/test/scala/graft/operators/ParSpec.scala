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
    // that started has finished (or was interrupted), nothing new starts
    val f0 = finished.get()
    Thread.sleep(300)
    assert(finished.get() == f0,
      "bodies kept running in the background after the failure rethrew")
    assert(started.get() < 32,
      "cancellation should prevent not-yet-started bodies from running")
  }

  test("nested Par runs the inner map sequentially (bounded threads)") {
    val concurrent = new java.util.concurrent.atomic.AtomicInteger(0)
    val peak = new java.util.concurrent.atomic.AtomicInteger(0)
    val out = Par.mapIndexed(0 until 4) { o =>
      Par.mapSeq(0 until 4) { i =>
        val c = concurrent.incrementAndGet()
        peak.updateAndGet(p => math.max(p, c))
        Thread.sleep(30)
        concurrent.decrementAndGet()
        o * 10 + i
      }.sum
    }
    assert(out.toSeq == (0 until 4).map(o => (0 until 4).map(o * 10 + _).sum))
    assert(peak.get() <= 8, s"nested pools exceeded the bound: ${peak.get()}")
  }
}
