package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def naive(l: org.apache.spark.sql.DataFrame,
      r: org.apache.spark.sql.DataFrame) =
    l.join(r, l("k") === r("k") && l("t") >= r("s") && l("t") <= r("e"))
      .select(l("lid"), r("rid")).collect().map(x => (x.getLong(0), x.getLong(1))).toSet

  test("matches the naive BETWEEN join, including bucket-boundary cases") {
    val left = Seq((1L, 0L, 10L), (1L, 10L, 11L), (1L, 99L, 12L), (1L, 100L, 13L),
      (2L, 55L, 14L), (3L, 7L, 15L))
      .toDF("k", "t", "lid")
    val right = Seq((1L, 0L, 10L, 20L), (1L, 10L, 99L, 21L), (1L, 100L, 100L, 22L),
      (2L, 0L, 300L, 23L), (3L, 8L, 9L, 24L))
      .toDF("k", "s", "e", "rid")
    for (width <- Seq(1L, 7L, 10L, 64L, 1000L)) {
      val got = RangeJoin.pointInInterval(left, "t", right, "s", "e",
        Seq("k"), width)
        .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(got === naive(left, right), s"bucketWidth=$width")
    }
  }

  test("no duplicate pairs when an interval spans many buckets") {
    val left = Seq((1L, 500L, 1L)).toDF("k", "t", "lid")
    val right = Seq((1L, 0L, 1000L, 9L)).toDF("k", "s", "e", "rid")
    val rows = RangeJoin.pointInInterval(left, "t", right, "s", "e", Seq("k"), 10L)
    assert(rows.count() === 1L)
  }

  test("left outer keeps unmatched left rows null-extended; semi/anti project left only") {
    val left = Seq((1L, 5L, 1L), (1L, 50L, 2L), (9L, 5L, 3L)).toDF("k", "t", "lid")
    val right = Seq((1L, 0L, 9L, 7L)).toDF("k", "s", "e", "rid")
    val outer = RangeJoin.pointInInterval(left, "t", right, "s", "e", Seq("k"), 10L, "left")
      .select("lid", "rid").collect().map(r => (r.getLong(0), Option(r.get(1)))).toSet
    assert(outer === Set((1L, Some(7L)), (2L, None), (3L, None)))
    val semi = RangeJoin.pointInInterval(left, "t", right, "s", "e", Seq("k"), 10L, "leftsemi")
    assert(semi.columns.toSeq === Seq("k", "t", "lid"))
    assert(semi.select("lid").collect().map(_.getLong(0)).toSet === Set(1L))
    val anti = RangeJoin.pointInInterval(left, "t", right, "s", "e", Seq("k"), 10L, "leftanti")
    assert(anti.select("lid").collect().map(_.getLong(0)).toSet === Set(2L, 3L))
  }

  private def naiveOverlap(l: org.apache.spark.sql.DataFrame,
      r: org.apache.spark.sql.DataFrame) =
    l.join(r, l("k") === r("k") && l("ls") <= r("re") && r("rs") <= l("le"))
      .select(l("lid"), r("rid")).collect().map(x => (x.getLong(0), x.getLong(1))).toSet

  test("interval overlap matches the naive inequality join at several widths") {
    val left = Seq((1L, 0L, 10L, 1L), (1L, 10L, 10L, 2L), (1L, 11L, 250L, 3L),
      (1L, 300L, 310L, 4L), (2L, 5L, 6L, 5L), (3L, 0L, 1L, 6L))
      .toDF("k", "ls", "le", "lid")
    val right = Seq((1L, 10L, 12L, 20L), (1L, 0L, 0L, 21L), (1L, 249L, 301L, 22L),
      (2L, 7L, 8L, 23L), (3L, 1L, 1L, 24L))
      .toDF("k", "rs", "re", "rid")
    for (width <- Seq(1L, 7L, 10L, 64L, 1000L)) {
      val got = RangeJoin.intervalOverlap(left, "ls", "le", right, "rs", "re",
          Seq("k"), width)
        .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(got === naiveOverlap(left, right), s"bucketWidth=$width")
    }
  }

  test("inverted (empty) intervals match nothing instead of exploding") {
    // end < start is mathematically empty; unguarded sequence() would
    // emit a descending bucket list for it
    val left = Seq((1L, 10L, 0L, 1L), (1L, 0L, 10L, 2L)).toDF("k", "ls", "le", "lid")
    val right = Seq((1L, 20L, 2L, 20L), (1L, 5L, 6L, 21L)).toDF("k", "rs", "re", "rid")
    val got = RangeJoin.intervalOverlap(left, "ls", "le", right, "rs", "re",
        Seq("k"), 4L)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got === Set((2L, 21L)))
    // point-in-interval: an inverted right interval contains no point
    val pts = Seq((1L, 5L, 1L)).toDF("k", "t", "lid")
    val ivs = Seq((1L, 9L, 1L, 30L), (1L, 4L, 6L, 31L)).toDF("k", "s", "e", "rid")
    val pig = RangeJoin.pointInInterval(pts, "t", ivs, "s", "e", Seq("k"), 4L)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(pig === Set((1L, 31L)))
  }

  test("overlapping pair spanning many shared buckets is emitted exactly once") {
    val left = Seq((1L, 0L, 1000L, 1L)).toDF("k", "ls", "le", "lid")
    val right = Seq((1L, 500L, 900L, 9L)).toDF("k", "rs", "re", "rid")
    assert(RangeJoin.intervalOverlap(left, "ls", "le", right, "rs", "re",
      Seq("k"), 10L).count() === 1L)
  }

  test("plans as a shuffled equi-join, not a nested loop") {
    val left = Seq((1L, 5L, 1L)).toDF("k", "t", "lid")
    val right = Seq((1L, 0L, 9L, 2L)).toDF("k", "s", "e", "rid")
    val plan = RangeJoin.pointInInterval(left, "t", right, "s", "e", Seq("k"), 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"unexpected join strategy:\n$plan")
  }
}
