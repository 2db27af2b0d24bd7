package graft.olap

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class RetentionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // weekly cohorts: u1/u2 start week 0 (u2 returns in week 1, u1 in
  // weeks 1 and 2); u3 starts week 1 and never returns; duplicate
  // same-week events must not double-count an entity
  private lazy val ev = Seq(
    (1L, "2024-01-01"), (1L, "2024-01-02"), (1L, "2024-01-08"), (1L, "2024-01-18"),
    (2L, "2024-01-03"), (2L, "2024-01-10"),
    (3L, "2024-01-09"))
    .toDF("u", "d")
    .selectExpr("u", "CAST(d AS TIMESTAMP) AS ts")

  test("cohortMatrix: planted cohorts, offsets, and retention fractions") {
    val m = Retention.cohortMatrix(ev, "u", "ts", periodDays = 7)
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // 2024-01-01 is a Monday; epoch-anchored weeks put it in the bucket
    // starting 2023-12-28 — the bucket GRID is epoch-derived, contents matter
    val c0 = m.keys.map(_._1).min
    val c1 = m.keys.map(_._1).max
    assert(c0 != c1)
    assert(m((c0, 0L)) === ((2L, 2L, 1.0))) // u1+u2, offset 0 complete
    assert(m((c0, 1L)) === ((2L, 2L, 1.0))) // both return next week
    // 2024-01-18 is 3 epoch-weeks past u1's cohort bucket, only u1
    assert(m((c0, 3L)) === ((1L, 2L, 0.5)))
    assert(m((c1, 0L)) === ((1L, 1L, 1.0))) // u3 alone, never returns
    assert(m.size === 4)
  }

  test("null entities and timestamps drop instead of forming phantom cells") {
    val withNulls = Seq[(java.lang.Long, String)](
      (1L, "2024-01-01"), (1L, null), (null, "2024-01-01"))
      .toDF("u", "d")
      .selectExpr("u", "CAST(d AS TIMESTAMP) AS ts")
    val m = Retention.cohortMatrix(withNulls, "u", "ts", 7).collect()
    assert(m.length === 1 && m.head.getLong(1) === 0L &&
      m.head.getLong(3) === 1L)
  }

  test("offset-0 retention is always 1.0 and counts are monotone per cohort") {
    val rows = graft.SparkEntry.queries("q138_retention")(spark, TestSpark.sf)
      .collect()
    val byCohort = rows.groupBy(_.getDate(0).toString)
    byCohort.values.foreach { rs =>
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.head.getLong(1) === 0L)
      assert(sorted.head.getDouble(4) === 1.0)
      // active never exceeds the cohort size
      assert(rs.forall(r => r.getLong(2) <= r.getLong(3)))
    }
    assert(rows.nonEmpty)
  }
}
