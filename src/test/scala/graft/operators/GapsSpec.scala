package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class GapsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def gaps(ids: Seq[Long], width: Long): Set[(Long, Long, Long)] =
    Gaps.missingRanges(ids.toDF("id"), "id", width)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("intra- and cross-bucket gaps found; duplicates harmless") {
    // width 10: 1..5 in bucket 0, 23 in bucket 2, 41,47 in bucket 4
    val ids = Seq(1L, 2L, 3L, 5L, 5L, 23L, 41L, 47L)
    assert(gaps(ids, 10L) === Set(
      (4L, 4L, 1L),    // intra bucket 0
      (6L, 22L, 17L),  // crosses buckets 0→2 (bucket 1 empty)
      (24L, 40L, 17L), // crosses buckets 2→4
      (42L, 46L, 5L))) // intra bucket 4
  }

  test("decomposition is width-invariant and matches a global lag") {
    val ids = Seq(100L, 101L, 105L, 220L, 221L, 222L, 500L)
    val expect = ids.sorted.sliding(2).collect {
      case Seq(a, b) if b - a > 1 => (a + 1, b - 1, b - a - 1)
    }.toSet
    for (w <- Seq(1L, 3L, 10L, 64L, 1000L))
      assert(gaps(ids, w) === expect, s"width=$w")
  }

  test("gapless and empty inputs produce no rows") {
    assert(gaps((10L to 20L), 5L) === Set.empty)
    assert(gaps(Seq.empty, 5L) === Set.empty)
    assert(gaps(Seq(7L), 5L) === Set.empty)
  }
}
