package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class FunnelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // (user, type, ts): u1 completes A→B→C in order; u2 has B before A
  // (B must not count until after its A); u3 stalls at A; u4 has B and
  // C at the SAME instant as A — strict ordering rejects both; u5
  // never does A at all (C alone reaches nothing).
  private lazy val ev = Seq(
    (1L, "A", 10L), (1L, "B", 20L), (1L, "C", 30L),
    (2L, "B", 5L), (2L, "A", 10L), (2L, "B", 15L),
    (3L, "A", 10L),
    (4L, "A", 10L), (4L, "B", 10L), (4L, "C", 10L),
    (5L, "C", 10L))
    .toDF("u", "t", "ts")

  test("reachTimes: strict ordering, first-touch, chain breaks to null") {
    val r = Funnel.reachTimes(ev, "u", "t", "ts", Seq("A", "B", "C"))
      .collect()
      .map(x => x.getLong(0) ->
        ((x.get(1), Option(x.get(2)), Option(x.get(3))))).toMap
    assert(r(1L) === ((10L, Some(20L), Some(30L))))
    // u2: B at 5 precedes A — only the B at 15 counts; no C
    assert(r(2L) === ((10L, Some(15L), None)))
    assert(r(3L) === ((10L, None, None)))
    // u4: simultaneous events never advance a strict funnel
    assert(r(4L) === ((10L, None, None)))
    assert(!r.contains(5L)) // never reached stage 1
  }

  test("counts: per-stage users and conversion rates") {
    val c = Funnel.counts(ev, "u", "t", "ts", Seq("A", "B", "C"))
      .collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2), x.getDouble(3)))
    assert(c.toSeq === Seq(
      (1L, "A", 4L, 1.0),
      (2L, "B", 2L, 0.5),
      (3L, "C", 1L, 0.5)))
  }

  test("funnel over the events fixture is sane") {
    // events carries TIMESTAMP(NANOS) parquet — go through the query
    // surface, whose loader handles the nanos conversion
    val c = graft.SparkEntry.queries("q137_funnel")(spark, TestSpark.sf)
      .collect().map(r => r.getLong(2))
    // monotone nonincreasing reach
    assert(c.sliding(2).forall(p => p(0) >= p(1)), c.toSeq.toString)
    assert(c(0) > 0)
  }
}
