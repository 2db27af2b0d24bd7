package graft.operators

import scala.util.Random

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class SkylineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sky(rows: Seq[(Long, Double, Double)]): Set[Long] =
    Skyline.skyline(rows.toDF("id", "x", "y"), Seq("x", "y"))
      .select("id").as[Long].collect().toSet

  /** O(n²) reference dominance filter. */
  private def brute(rows: Seq[(Long, Double, Double)]): Set[Long] =
    rows.filter { case (_, x, y) =>
      !rows.exists { case (_, bx, by) =>
        bx <= x && by <= y && (bx < x || by < y)
      }
    }.map(_._1).toSet

  test("planted frontier: dominated points drop, frontier and ties stay") {
    val rows = Seq(
      (1L, 1.0, 9.0), (2L, 5.0, 5.0), (3L, 9.0, 1.0), // frontier
      (4L, 6.0, 6.0),                                 // dominated by 2
      (5L, 5.0, 5.0),                                 // tie with 2: kept
      (6L, 1.0, 10.0))                                // dominated by 1
    assert(sky(rows) === Set(1L, 2L, 3L, 5L))
  }

  test("matches brute force on random data across many partitions") {
    val rnd = new Random(7)
    val rows = Seq.fill(500)(
      (rnd.nextLong(), rnd.nextInt(30).toDouble, rnd.nextInt(30).toDouble))
    val df = rows.toDF("id", "x", "y").repartition(13)
    val got = Skyline.skyline(df, Seq("x", "y"))
      .select("id").as[Long].collect().toSet
    assert(got === brute(rows))
  }

  test("null dimensions are excluded") {
    val df = Seq[(Long, java.lang.Double, java.lang.Double)](
      (1L, 2.0, 2.0), (2L, null, 0.0), (3L, 0.0, null))
      .toDF("id", "x", "y")
    assert(Skyline.skyline(df, Seq("x", "y"))
      .select("id").as[Long].collect().toSet === Set(1L))
  }

  test("single dimension degenerates to global min including ties") {
    val rows = Seq((1L, 3.0, 0.0), (2L, 1.0, 0.0), (3L, 1.0, 0.0))
    val got = Skyline.skyline(rows.toDF("id", "x", "y"), Seq("x"))
      .select("id").as[Long].collect().toSet
    assert(got === Set(2L, 3L))
  }
}
