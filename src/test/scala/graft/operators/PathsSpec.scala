package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class PathsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("transitionMatrix: hand-checked counts and row-normalized probs") {
    // u1: A→B→A→C; u2: A→B; sequences never cross users
    val ev = Seq(
      (1L, "A", 1L, 10L), (1L, "B", 2L, 20L), (1L, "A", 3L, 30L), (1L, "C", 4L, 40L),
      (2L, "A", 1L, 50L), (2L, "B", 2L, 60L))
      .toDF("u", "t", "ts", "id")
    val m = Paths.transitionMatrix(ev, "u", "t", "ts", "id")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    // transitions: A→B ×2, B→A ×1, A→C ×1; A's row normalizes over 3
    assert(m(("A", "B")) === ((2L, 0.666667)))
    assert(m(("A", "C")) === ((1L, 0.333333)))
    assert(m(("B", "A")) === ((1L, 1.0)))
    assert(m.size === 3) // exactly the three observed pairs
  }

  test("ties broken by the tiebreak column, not partition luck") {
    // two same-ts events: id order decides the sequence deterministically
    val ev = Seq((1L, "A", 1L, 1L), (1L, "B", 5L, 2L), (1L, "C", 5L, 3L))
      .toDF("u", "t", "ts", "id")
    val m = Paths.transitionMatrix(ev, "u", "t", "ts", "id")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(m === Set(("A", "B"), ("B", "C")))
  }

  test("rows of the probability matrix sum to 1") {
    val probs = graft.SparkEntry.queries("q139_transitions")(spark, TestSpark.sf)
      .collect().groupBy(_.getString(0))
      .map { case (_, rs) => rs.map(_.getDouble(3)).sum }
    probs.foreach(s => assert(math.abs(s - 1.0) < 1e-4, s"row sum $s"))
    assert(probs.nonEmpty)
  }
}
